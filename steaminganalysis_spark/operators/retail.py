"""Retail / market-basket analytics — round-5 additions.

Frequent co-occurrence mining and RFM customer segmentation: the two
classic order-history analyses a warehouse engine is asked for first.
Both are declarative DataFrame plans (Catalyst handles pushdown /
partial aggregation); the co-purchase self-join is the one operator
here with a genuine scale hazard (pair blowup on giant baskets) and
carries an explicit basket cap, mirroring the DF-cap convention of the
dedup family (functions.text.cap_document_frequency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import query, to_cents
from steaminganalysis_spark.sources import load

# A basket (order) with more than this many distinct parts contributes
# no pairs: k distinct parts emit k·(k-1)/2 pair rows, so one
# pathological mega-order (a B2B bulk feed, a crawler artifact) would
# quadratically dominate the shuffle. TPC-H-shaped data tops out ~13;
# the cap is a no-op here and a guardrail at 100 TB. Applied
# identically in the oracle so parity is unconditional.
MAX_BASKET = 64


@query(
    "q_copurchase_pairs",
    oracle=f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING COUNT(*) <= {MAX_BASKET}),
    lik AS (SELECT li.* FROM li JOIN ok USING (l_orderkey)),
    part_n AS (SELECT l_partkey, COUNT(*) AS n FROM lik GROUP BY 1),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM lik),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS support
      FROM lik a JOIN lik b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, support,
           CAST((support * no.n * 1000000) // (na.n * nb.n) AS BIGINT)
             AS lift_ppm
    FROM pairs
    JOIN part_n na ON part_a = na.l_partkey
    JOIN part_n nb ON part_b = nb.l_partkey
    CROSS JOIN n_orders no
    QUALIFY ROW_NUMBER() OVER (ORDER BY support DESC, part_a, part_b) <= 100
    ORDER BY support DESC, part_a, part_b
    """,
)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-100 part pairs by order
    co-purchase support (≥2 shared orders), with lift as an exact ppm
    integer (support·N_orders·10⁶ div freq_a·freq_b — identical BIGINT
    arithmetic on both engines; lift > 1e6 means the pair co-occurs
    more than independence predicts).

    Scale shape: the only fact-sized shuffle is the distinct + self-
    join on l_orderkey (co-partitioned equi-join — one exchange feeds
    both sides). Pair rows are bounded by MAX_BASKET²/2 per order, the
    pair aggregate is partial+final, and the part-frequency /
    order-count sides are tiny aggregates that broadcast back onto the
    ~thousands of surviving pairs. Top-100 runs through one
    WindowGroupLimit, never a global sort of all pairs."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    ok = li.groupBy("l_orderkey").agg(F.count("*").alias("_k")).filter(
        F.col("_k") <= MAX_BASKET
    )
    lik = li.join(F.broadcast(ok.select("l_orderkey")), "l_orderkey")
    part_n = lik.groupBy("l_partkey").agg(F.count("*").alias("n"))
    n_orders = lik.select(F.countDistinct("l_orderkey").alias("n"))
    a, b = lik.alias("a"), lik.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
    )
    enriched = (
        pairs.join(
            F.broadcast(part_n.selectExpr("l_partkey AS part_a", "n AS na")), "part_a"
        )
        .join(F.broadcast(part_n.selectExpr("l_partkey AS part_b", "n AS nb")), "part_b")
        .crossJoin(F.broadcast(n_orders.selectExpr("n AS no")))
        .select(
            "part_a",
            "part_b",
            "support",
            F.expr("(support * no * 1000000) div (na * nb)").alias("lift_ppm"),
        )
    )
    w = W.orderBy(F.col("support").desc(), "part_a", "part_b")
    return (
        enriched.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 100)
        .drop("_rn")
        .orderBy(F.col("support").desc(), "part_a", "part_b")
    )


@query(
    "q_rfm_segments",
    oracle="""
    WITH snap AS (SELECT MAX(o_orderdate) AS d FROM orders),
    cust AS (
      SELECT o_custkey,
             datediff('day', MAX(o_orderdate), (SELECT d FROM snap))
               AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                           AS BIGINT)) AS BIGINT) AS monetary_cents
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT o_custkey, monetary_cents,
             NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_score,
             NTILE(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             NTILE(4) OVER (ORDER BY monetary_cents DESC, o_custkey) AS m_score
      FROM cust
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) AS monetary_cents
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: quartile-score every customer on Recency
    (days since last order, vs the corpus max date), Frequency (order
    count), Monetary (exact cents), then roll up customer counts and
    revenue per (r, f, m) cell. Score 1 = best quartile on each axis.
    NTILE ties are broken by custkey so the buckets — and therefore
    the value hash — are deterministic; money stays integer cents end
    to end (the decimal-sum convention, registry.dsum rationale).

    Scale shape: orders aggregate to customer grain first (partial+
    final, one shuffle on custkey), so the three NTILE windows sort the
    CUSTOMER table, not the fact table. They are global-order windows —
    fine at customer grain (10⁸ rows sort in one stage); at truly
    unbounded grain the same scores come from joining against
    approx-quantile boundaries instead, which is the documented
    evolution path, not this plan's bottleneck."""
    orders = load(spark, sf_dir, "orders")
    snap = orders.select(F.max("o_orderdate").alias("d"))
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(to_cents(F.col("o_totalprice"))).cast("long").alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(snap))
        .select(
            "o_custkey",
            F.datediff(F.col("d"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    scored = cust.select(
        "o_custkey",
        "monetary_cents",
        F.ntile(4).over(W.orderBy("recency_days", "o_custkey")).alias("r_score"),
        F.ntile(4)
        .over(W.orderBy(F.col("frequency").desc(), "o_custkey"))
        .alias("f_score"),
        F.ntile(4)
        .over(W.orderBy(F.col("monetary_cents").desc(), "o_custkey"))
        .alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("monetary_cents").cast("long").alias("monetary_cents"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )
