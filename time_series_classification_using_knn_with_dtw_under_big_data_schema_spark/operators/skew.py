"""Skew mitigation helpers (100 TB design; SURVEY.md §4).

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`, on by
default in session.py). These helpers are the explicit, plan-visible
alternative for joins whose skew AQE can't fix (e.g. one key = 40% of the
fact table): salt the skewed side, replicate the other side across the salt
domain, join on (key, salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the input has fewer partitions than the
    cluster has slots.

    Expression-heavy per-row phases (shingling, hashing, per-char folds) are
    CPU-bound map work: their parallelism is exactly the input partition
    count. A small/compacted table often arrives as ONE file -> one
    partition -> one core does everything (observed: 5x wall-clock on the
    LSH dedup at sf0.1). At 100 TB inputs arrive pre-split, so this is a
    no-op there (the guard keeps existing parallelism untouched); locally it
    buys the full slot count for one narrow shuffle of the input rows.
    Row-order independent consumers only (all dedup/text ops are key-based).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    *,
    salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: each skewed row gets a random
    salt in [0, salts); ``other`` is replicated `salts` times (explode), so a
    hot key's rows spread over `salts` reducers instead of one.

    Result == plain ``skewed.join(other, on, how)`` for inner/left joins (the
    salt is internal). Cost: `salts`x replication of ``other`` — use when
    ``other`` is the small-but-not-broadcastable side.
    """
    if isinstance(on, str):
        on = [on]
    s = skewed.withColumn("_salt", F.floor(F.rand(seed) * salts).cast("int"))
    o = other.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)])))
    out = s.join(o, [*on, "_salt"], how)
    return out.drop("_salt")
