"""Physical-plan introspection helpers.

The engine's scale claims are plan properties, not vibes: filters reach
the parquet scan (PushedFilters), projections prune columns (ReadSchema),
small dims broadcast, single-query top-k plans as TakeOrderedAndProject,
hot paths stay inside WholeStageCodegen. These helpers let tests assert
those properties so regressions in plan shape fail CI, the same way value
regressions do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed (physical) plan as text, including scan details
    (PushedFilters / ReadSchema) and codegen stage markers."""
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan(df: DataFrame) -> str:
    """All phases: parsed / analyzed / optimized / physical."""
    return df._jdf.queryExecution().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters mention ``fragment``."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def scan_read_schema(df: DataFrame, table_fragment: str) -> str:
    """The ReadSchema of the scan whose path matches ``table_fragment``
    ('' if not found) — proves column pruning."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_fragment in line:
            start = line.index("ReadSchema")
            return line[start:]
    return ""


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def is_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def formatted_plan(df: DataFrame) -> str:
    """explain('formatted') as a string (node list + codegen ids)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen span count in the FINAL plan. Under AQE the final
    plan only exists after execution, so this runs the query (cheap at
    test scale) and reads the adaptively-finalized plan."""
    df.collect()
    plan = formatted_plan(df)
    ids = {
        line.split("codegen id :")[1].strip().rstrip("]")
        for line in plan.splitlines()
        if "codegen id :" in line
    }
    return len(ids)
