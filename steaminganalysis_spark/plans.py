"""Physical-plan introspection: the utilities that keep the engine
honest about scale claims (SURVEY.md §4 — everything the reference
hand-rolled must appear in OUR plans as Catalyst output).

Used by tests/test_plan_audit.py to pin plan shapes: a regression that
turns a broadcast join into a shuffle join or un-pushes a filter fails
CI here even though results stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "physical_plan",
    "assert_filter_pushed",
    "assert_read_schema_pruned",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "count_exchanges",
]


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    """The named column/value must appear in a parquet PushedFilters
    entry — i.e., the predicate reaches the reader, not a post-scan
    Filter only."""
    plan = physical_plan(df)
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(fragment in ln for ln in pushed), (
        f"filter on {fragment!r} not pushed to scan:\n" + "\n".join(pushed)
    )


def assert_read_schema_pruned(df: DataFrame, max_cols: int) -> None:
    """Every parquet ReadSchema in the plan reads at most max_cols
    columns (column pruning reached the reader)."""
    plan = physical_plan(df)
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            struct = ln.split("struct<", 1)[-1]
            n = struct.count(":")
            assert n <= max_cols, f"scan reads {n} cols (> {max_cols}): {ln.strip()}"


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= at_least, f"expected ≥{at_least} BroadcastHashJoin, found {n}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, "plan contains a CartesianProduct"


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchanges (excluding broadcast exchanges and
    AQE reuse) — the scale-critical number for any operator."""
    plan = physical_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("Exchange") or ") Exchange" in ln
    )
