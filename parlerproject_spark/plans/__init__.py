"""Physical-plan inspection (SURVEY §4).

The engine's scale claims are properties of the OPTIMIZED PLAN, not
of the code: filters must reach the parquet scan, projections must
narrow ReadSchema, small dims must broadcast, hot paths must stay in
whole-stage codegen. These helpers turn those claims into assertions
(tests/test_plans.py) instead of hopes.
"""

from parlerproject_spark.plans.inspect import (
    executed_plan,
    formatted_plan,
    join_strategies,
    pushed_filters,
    read_schema_columns,
    codegen_stage_count,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "join_strategies",
    "pushed_filters",
    "read_schema_columns",
    "codegen_stage_count",
]
