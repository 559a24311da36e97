from .audit import (  # noqa: F401
    codegen_stage_count,
    count_exchanges,
    executed_plan,
    explain_str,
    has_broadcast_join,
    has_window_group_limit,
    pushed_filters,
    python_eval_nodes,
    read_schema_columns,
)
