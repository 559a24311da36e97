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
