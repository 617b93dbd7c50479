"""Reshape + quantile operators: pivot / unpivot (melt) / percentile.

Pivot at scale: with an explicit value list the plan is a single
groupBy — one shuffle, no value-discovery pre-pass (omitting the list
costs an extra distinct scan; always pass it in production).
Unpivot is an Expand node — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import query
from steaminganalysis_spark.sources import load

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q_pivot",
    oracle="""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    GROUP BY 1
    """,
)
def pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot events to one column per event type (explicit value list →
    single-pass plan). Missing cells filled 0 to match FILTER-count
    semantics."""
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside pivot
    )
    return out.na.fill(0, EVENT_TYPES)


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 200
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) three measure columns into rows — an Expand node,
    zero shuffles."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "val",
    ).withColumn("measure", F.expr("substring(measure, 3)"))


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ==
    quantile_cont interpolation). The approximate sketch variant is
    q_agg_approx_percentile."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90_price"),
    )


@query("q_agg_approx_percentile")  # rows-only: t-digest/GK sketch estimate by design
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the sketch that replaces exact percentile at
    100 TB (exact requires a per-group sort/collect; the sketch is a
    fixed-size mergeable summary). Tolerance vs exact asserted in
    tests."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", F.lit(0.5), F.lit(10000)).alias("median_qty"),
        F.approx_percentile("l_extendedprice", F.lit(0.9), F.lit(10000)).alias("p90_price"),
    )
