"""Raw-text series ingest (reference pipeline: Team11-Project.py:38-114).

The reference parses a 1-string-column table of space-separated floats with a
Python UDF + 561 ``withColumn`` calls + a constant-key global window for ids —
three anti-patterns (SURVEY.md §4 hazards 1 & 4). This module does the whole
ingest in ONE codegen'd select:

    split on ' +' -> drop blank tokens -> cast elementwise to double

No Python UDF (the reference's ``clean_array`` UDF, Team11-Project.py:50-54,
becomes ``filter(split(...), x -> trim(x) != '')``), no per-feature column loop
(series stay a single ``array<double>`` column), no single-partition window
(ids come from ``monotonically_increasing_id`` or zipWithIndex-free
``row_number`` only when the caller really needs dense ids).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def parse_series_expr(col: Column) -> Column:
    """string of space-separated numbers -> array<double> (F1-F4, P8, U1)."""
    toks = F.split(F.trim(col), r"\s+")
    toks = F.filter(toks, lambda x: F.trim(x) != F.lit(""))
    return F.transform(toks, lambda x: x.cast("double"))


def parse_series_text(
    df: DataFrame, value_col: str = "value", out_col: str = "features"
) -> DataFrame:
    """Parse every row's space-separated-number string into array<double>."""
    return df.withColumn(out_col, parse_series_expr(F.col(value_col))).drop(
        value_col if value_col != out_col else ""
    )


def cast_all(df: DataFrame, dtype: str = "double") -> DataFrame:
    """Cast every column (reference P2: Team11-Project.py:84-87) — one select,
    not N withColumns."""
    return df.select([F.col(c).cast(dtype).alias(c) for c in df.columns])


def with_row_id(df: DataFrame, id_col: str = "row_id", *, dense: bool = False) -> DataFrame:
    """Mint a unique id column.

    ``dense=False`` (default): ``monotonically_increasing_id`` — fully
    distributed, ids unique but sparse; the scalable choice.
    ``dense=True``: row_number over a global window — dense 1..N ids matching
    the reference's semantics (Team11-Project.py:93-97) BUT funnels the table
    through one partition; only for small dims / parity tests.
    """
    if dense:
        w = Window.orderBy(F.lit(1))
        return df.withColumn(id_col, F.row_number().over(w).cast("long"))
    return df.withColumn(id_col, F.monotonically_increasing_id())
