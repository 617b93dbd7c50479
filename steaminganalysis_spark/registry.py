"""Query registry: the single source of truth for the driver contract.

Every operator in SURVEY.md §2 registers here as a named query — a
callable ``(spark, sf_dir) -> DataFrame`` — optionally paired with an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
``__spark_entry__.py`` simply re-exports these dicts.

Determinism conventions (FIXTURES.md §3), applied by every registered
query AND its oracle:
- alias every computed column identically on both sides;
- money/double sums go through exact decimal accumulation then a final
  cast to double (``dsum`` helper) so summation order cannot perturb
  the value hash;
- calendar buckets are emitted as strings (``yyyy-MM-dd`` etc.), never
  raw timestamps, so session-timezone settings cannot perturb them;
- top-k / ranking queries always break ties on a unique key;
- array-valued aggregates are sorted and joined to a string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["QUERIES", "ORACLE", "query", "dsum", "SQL_DSUM", "collect_queries"]

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB SQL twin
    (omit for genuinely non-SQL-expressible ops → rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-insensitive exact sum of a fixed-scale double column:
    accumulate as decimal (exact integer arithmetic), cast back to
    double. The DuckDB twin is ``SQL_DSUM``. Using plain double SUM
    would make the value hash depend on partitioning/summation order."""
    return F.sum(col.cast(f"decimal(30,{scale})")).cast("double")


def SQL_DSUM(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def collect_queries() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import every operator module (side effect: registration) and
    return the populated registries."""
    from steaminganalysis_spark.operators import (  # noqa: F401
        aggregates,
        ann,
        functions_pack,
        joins,
        llm,
        multimodal,
        pipeline,
        relational,
        reshape,
        sql_surface,
        storage,
        tpch,
        udfs,
        windows,
    )
    from steaminganalysis_spark.streaming import queries as streaming_queries  # noqa: F401

    return QUERIES, ORACLE
