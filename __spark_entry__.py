"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``steaminganalysis_spark`` package; this
module only adapts its registry to the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference
    pipeline's per-day order rollup (SURVEY.md §3.1) on the events
    table."""
    from steaminganalysis_spark.operators.aggregates import daily_rollup

    return daily_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from steaminganalysis_spark.registry import collect_queries

    q, _ = collect_queries()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every SQL-expressible query; keys absent here
    (probabilistic / engine-hash-dependent ops) get rows-only checks."""
    from steaminganalysis_spark.registry import collect_queries

    _, o = collect_queries()
    return dict(o)
