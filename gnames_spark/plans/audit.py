"""Physical-plan audits — assertions about HOW queries execute.

The reference trusts PostgreSQL's planner and hand-shapes its SQL
(SURVEY §4); we trust Catalyst but VERIFY the physical properties that
matter at 100 TB: predicate pushdown reaching the parquet scan, column
pruning (no html/text columns read when not needed), broadcast joins on
dims, whole-stage codegen around the JVM-side kernels, and no
row-Python in hot paths. Used by tests/test_plans.py and
tools/explain_audit.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _explain(df: DataFrame, mode: str) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def physical_plan(df: DataFrame) -> str:
    return _explain(df, "simple")


def formatted_plan(df: DataFrame) -> str:
    return _explain(df, "formatted")


def optimized_plan(df: DataFrame) -> str:
    return _explain(df, "extended")


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if a parquet scan advertises a pushed filter containing
    ``fragment`` (PushedFilters: [...])."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and fragment in line:
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Columns actually read by each parquet scan (ReadSchema lines)."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            schema = line.split("struct<", 1)[-1].rstrip(">")
            cols = [c.split(":")[0].strip() for c in schema.split(",") if ":" in c]
            out.append(cols)
    return out


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def count_shuffles(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange hashpartitioning") + physical_plan(
        df
    ).count("Exchange rangepartitioning")


def has_python_row_udf(df: DataFrame) -> bool:
    """True if a row-at-a-time Python UDF (BatchEvalPython) is in the
    plan — forbidden everywhere; Arrow (ArrowEvalPython) is the allowed
    Python boundary."""
    return "BatchEvalPython" in physical_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of operators inside WholeStageCodegen regions. Note:
    higher-order functions (transform/filter lambdas) evaluate
    interpreted-but-JVM-side and appear outside codegen regions — which
    is exactly why the pipeline's hot path moved shingling into the
    fused Arrow kernel (functions/sigkernel.py) and keeps the JVM
    expressions only for tiny-scale oracle queries."""
    plan = formatted_plan(df)
    ids = set()
    for line in plan.splitlines():
        if "codegen id :" in line:
            ids.add(line.rsplit(":", 1)[-1].strip().rstrip("]"))
    return len(ids)
