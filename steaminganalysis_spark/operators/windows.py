"""Window-function operators (SURVEY.md §2 B.5).

All windows partition on a real key (nation / customer / user) so state
per partition stays bounded; every ORDER BY includes a unique tiebreak
column so ranking output is deterministic under the driver's value-hash
comparison (FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import query
from steaminganalysis_spark.sources import load


@query(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS INT) AS rn,
           CAST(RANK() OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk,
           CAST(NTILE(4) OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking pack: row_number / rank / dense_rank / ntile per nation,
    unique-key tiebreak for determinism."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS od,
           lag(o_orderkey) OVER w AS prev_order,
           lead(o_orderkey) OVER w AS next_order,
           first_value(o_orderkey) OVER w AS first_order,
           CAST(datediff('day', lag(o_orderdate) OVER w, o_orderdate) AS INT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic lag/lead over each customer's order timeline (prev/next
    order dates as strings per the determinism conventions)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias("days_since_prev"),
    )


@query(
    "q_window_running",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / (COUNT(*) OVER
                (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS sliding_avg3
    FROM orders
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row sliding average. Accumulation in decimal so
    the prefix sums are exact and engine-independent; the sliding AVG is
    a ≤3-element decimal mean, also exact at scale 6."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    dec = F.col("o_totalprice").cast("decimal(30,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("double").alias(
            "running_spend"
        ),
        (
            F.sum(dec).over(w.rowsBetween(-2, 0)).cast("double")
            / F.count("*").over(w.rowsBetween(-2, 0))
        ).alias("sliding_avg3"),
    )


@query(
    "q_window_range",
    oracle="""
    SELECT c_nationkey, c_custkey,
           CAST(COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_custkey
                               RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near
    FROM customer
    """,
)
def window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering key (value-based frame, not
    row-based): counts customers whose key lies within 10 below."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_custkey").rangeBetween(-10, 0)
    return c.select(
        "c_nationkey", "c_custkey", F.count("*").over(w).alias("n_near")
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. row_number + filter: Spark pushes the
    rn<=3 limit into the window sort (WindowGroupLimit) so each group
    keeps a 3-row heap instead of sorting all rows — the per-group
    top-k shape that scales."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_window_percent_rank",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           FLOOR(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pr,
           FLOOR(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank analytics: percent_rank and cume_dist per priority
    class (order-by includes the unique key so ranks are total).
    Floor-based rounding: rank ratios k/n are the integer-ratio class
    that lands on 6th-decimal boundaries where Spark's round and
    DuckDB's round split (registry.round_half_up)."""
    from steaminganalysis_spark.registry import round_half_up

    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        round_half_up(F.percent_rank().over(w), 6).alias("pr"),
        round_half_up(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q_topk_with_ties",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             RANK() OVER (PARTITION BY c_nationkey
                          ORDER BY round(c_acctbal, 2) DESC) AS rk
      FROM customer
    ) WHERE rk <= 3
    """,
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group WITH TIES (rank(), not row_number): equal
    balances at the cut all survive — the 'top-k' most analysts
    actually mean. Rank on the rounded value so float noise can't
    split a tie differently across engines."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.round("c_acctbal", 2).desc())
    return (
        c.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@query(
    "q_window_distribution",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(FLOOR(PERCENT_RANK() OVER w * 1000000.0) AS BIGINT) AS pr_ppm,
           CAST(FLOOR(CUME_DIST() OVER w * 1000000.0) AS BIGINT) AS cd_ppm,
           NTILE(10) OVER w AS decile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_mktsegment, c_custkey
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank, cume_dist,
    ntile(10) — ranking every customer's balance within their market
    segment. The ordering includes the unique custkey, so rank
    positions (and therefore all three outputs) are fully
    deterministic; the two ratio outputs are floored to ppm integers
    on both engines — (rank−1)/(n−1) is the same IEEE division of
    small integers on both sides, so the floor is identical. One
    shuffle on the partition key, all three functions share a single
    sorted window pass."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.floor(F.percent_rank().over(w) * F.lit(1000000.0)).alias("pr_ppm"),
        F.floor(F.cume_dist().over(w) * F.lit(1000000.0)).alias("cd_ppm"),
        F.ntile(10).over(w).alias("decile"),
    ).orderBy("c_mktsegment", "c_custkey")


@query(
    "q_window_locf",
    oracle="""
    SELECT user_id, event_id,
           LAST_VALUE(CASE WHEN event_type = 'purchase'
                           THEN CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
                      END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_cents
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward (LOCF) gap fill — the IGNORE
    NULLS window surface: purchases are the only events carrying an
    observed value; every other event inherits the user's most recent
    purchase amount (NULL until the first one). The canonical
    sensor-reading/sparse-fact densification operator; ordering
    includes the unique event_id so the carried value is
    deterministic. One shuffle on user_id, running frame, no
    self-joins — the same single window pass at any scale; values move
    as integer cents."""
    ev = load(spark, sf_dir, "events")
    from steaminganalysis_spark.registry import to_cents

    obs = F.when(F.col("event_type") == "purchase", to_cents(F.col("value")))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.last(obs, ignorenulls=True).over(w).alias("last_purchase_cents"),
    ).orderBy("user_id", "event_id")
