"""Table profiling — the ANALYZE/data-quality pass of the engine (extension
beyond the reference surface; `Team11-Project.py` sanity-checks row counts by
hand at :145-146, :244 — this operator is that idea as a first-class,
one-scan, every-column statistic).

Output: one row per profiled column —
(col_name, n_rows, n_nulls, null_frac, n_distinct, min_num, max_num)
with min/max populated for numeric columns only (casting strings or
timestamps to double is engine-specific; numeric casts are IEEE-exact on
every engine, which keeps the operator oracle-checkable).

Scale design (100 TB):
- ONE scan: all per-column aggregates go into a single ``agg`` row, then the
  1-row result is unpivoted driver-side-free via explode(array(struct...)) —
  the unpivot costs nothing (1 row).
- The only scale hazard is exact ``count(DISTINCT c)`` for many columns at
  once: Catalyst plans multi-distinct via Expand (input rows x #distinct
  aggs). ``distinct_mode="approx"`` swaps in approx_count_distinct (HLL++,
  one pass, no Expand) — the right default at 100 TB; "exact" is the
  default here because it is cross-engine reproducible (the oracle gate).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    distinct_mode: str = "exact",
) -> DataFrame:
    """Per-column profile of ``df`` in one scan (see module docstring)."""
    if distinct_mode not in ("exact", "approx"):
        raise ValueError(f"distinct_mode must be exact|approx, got {distinct_mode!r}")
    cols = list(columns) if columns is not None else df.columns
    by_name = {f.name: f.dataType for f in df.schema.fields}
    missing = [c for c in cols if c not in by_name]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")

    nd = F.countDistinct if distinct_mode == "exact" else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(
            F.sum(F.isnull(c).cast("long")).alias(f"_{c}__nulls")
        )
        aggs.append(nd(F.col(c)).alias(f"_{c}__nd"))
        if isinstance(by_name[c], _NUMERIC):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"_{c}__min"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"_{c}__max"))

    one = df.agg(*aggs)
    structs = []
    for c in cols:
        is_num = isinstance(by_name[c], _NUMERIC)
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                F.col(f"_{c}__nulls").alias("n_nulls"),
                (
                    F.col(f"_{c}__nulls").cast("double")
                    / F.col("_n").cast("double")
                ).alias("null_frac"),
                F.col(f"_{c}__nd").alias("n_distinct"),
                (F.col(f"_{c}__min") if is_num else F.lit(None).cast("double")).alias(
                    "min_num"
                ),
                (F.col(f"_{c}__max") if is_num else F.lit(None).cast("double")).alias(
                    "max_num"
                ),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
