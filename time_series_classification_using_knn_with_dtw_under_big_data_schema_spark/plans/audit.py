"""Physical-plan audit helpers.

The engine's performance contract is checkable, not aspirational: these
helpers parse ``explain`` output so tests (tests/test_plans.py) assert the
plans we designed for are the plans Catalyst actually produces —
filter/column pushdown into the parquet scan, broadcast joins where hinted,
map-side partial top-k (WindowGroupLimit), whole-stage codegen coverage, and
bounded exchange counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (empty = nothing pushed)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (column pruning check)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip())
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    p = executed_plan(df)
    return "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p


def has_window_group_limit(df: DataFrame, mode: str = "Partial") -> bool:
    """True when the rank<=k filter compiled to a map-side partial top-k."""
    return f"WindowGroupLimit" in executed_plan(df) and mode in executed_plan(df)


def count_exchanges(df: DataFrame) -> int:
    return executed_plan(df).count("Exchange ")


def python_eval_nodes(df: DataFrame) -> int:
    """Number of Python-evaluation operators in the plan (0 for pure-JVM
    plans; exactly 1 for a single pandas_udf distance)."""
    p = executed_plan(df)
    return (
        p.count("ArrowEvalPython")
        + p.count("BatchEvalPython")
        + p.count("MapInPandas")
        + p.count("FlatMapGroupsInPandas")
    )


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"\*\((\d+)\)", executed_plan(df))))
