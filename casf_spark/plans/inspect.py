"""Physical-plan introspection helpers.

The engine has no custom planner (Catalyst does the planning — SURVEY.md §3);
what we own is *verifying* that the plans Catalyst produces are the ones a
100 TB run needs: filters pushed into scans, columns pruned, no accidental
cartesian products, broadcast joins where expected. Tests and bench use
these helpers to pin those properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema lines from the formatted plan — shows which columns each
    parquet scan actually reads (column pruning check)."""
    return [ln.strip() for ln in explain_str(df).splitlines()
            if "ReadSchema" in ln]


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lines — predicate pushdown check."""
    return [ln.strip() for ln in explain_str(df).splitlines()
            if "PushedFilters" in ln]


def assert_no_cartesian(df: DataFrame, allow: int = 0) -> None:
    """Fail if the physical plan contains more CartesianProduct /
    BroadcastNestedLoopJoin nodes than explicitly allowed (dense-mode
    all-pairs legitimately has one)."""
    plan = explain_str(df, "simple")
    n = plan.count("CartesianProduct") + plan.count("BroadcastNestedLoopJoin")
    if n > allow:
        raise AssertionError(
            f"plan has {n} cartesian/NL joins (allowed {allow}):\n{plan}")


def broadcast_join_count(df: DataFrame) -> int:
    return explain_str(df, "simple").count("BroadcastHashJoin")
