"""Join operators (SURVEY.md §2 B.3).

Scale posture: dimension tables (region/nation/supplier/part/customer at
TPC-H ratios) are broadcast — no shuffle of the fact side; fact-fact
joins (lineitem ⋈ orders) shuffle on the join key and AQE handles skew.
The as-of join is expressed as union + window (single shuffle on the
partition key) instead of a range cross-join, which is the only shape
that survives a 100 TB event table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import SQL_DSUM, dsum, query
from steaminganalysis_spark.sources import load


@query(
    "q_join_inner",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           {SQL_DSUM("l_extendedprice * (1 - l_discount)", 4)} AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact inner equi-join (lineitem ⋈ orders) + aggregate.
    Catalyst picks the physical strategy (sort-merge at scale, broadcast
    if one side fits under AQE); both sides prune to join+agg columns."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT r_name,
           COUNT(*) AS n_lines,
           {SQL_DSUM("l_extendedprice * (1 - l_discount)", 4)} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact ⋈ three broadcast dims (supplier→nation→region).
    Explicit broadcast() hints — the dim chain is joined without ever
    shuffling lineitem; the only exchange is the final tiny group-by.
    This is the plan shape that must hold at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_lines"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
        )
    )


@query(
    "q_join_outer",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           COALESCE({SQL_DSUM("o_totalprice")}, 0.0) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders;
    COUNT(col) vs COUNT(*) null semantics exercised deliberately."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spend"),
        )
    )


@query(
    "q_join_full_outer",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer/supplier counts — both
    unmatched sides survive with NULL-coalesced counts."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS): probe side streams, no row multiplication,
    build side reduced to distinct keys."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI (NOT EXISTS): customers with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_theta",
    oracle="""
    SELECT a.p_brand AS brand,
           COUNT(*) AS n_dominated_pairs
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size < b.p_size
    GROUP BY a.p_brand
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi component (brand) + non-equi range predicate
    (size <). Spark plans the equi part as the join key and applies the
    range as a post-join filter — so this is NOT a cross join even
    though the predicate is non-equi; only within-brand pairs
    materialize."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") < F.col("b.p_size")),
        )
        .groupBy(F.col("a.p_brand").alias("brand"))
        .agg(F.count("*").alias("n_dominated_pairs"))
    )


@query(
    "q_join_asof",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'click' THEN ts END AS click_ts
      FROM events
      WHERE event_type IN ('purchase', 'click')
    ), filled AS (
      SELECT user_id, ts, event_id, value, event_type,
             last_value(CASE WHEN event_type = 'click' THEN strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click_ts
      FROM (SELECT user_id, ts, event_id, value, event_type FROM events
            WHERE event_type IN ('purchase', 'click'))
    )
    SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, last_click_ts
    FROM filled
    WHERE event_type = 'purchase'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent STRICTLY PRIOR
    click by the same user. Expressed as a single-shuffle union+window
    (partition by user, order by time, last_value IGNORE NULLS over a
    trailing frame) rather than a range join — at 100 TB a range join
    explodes; this shape shuffles each event exactly once.
    Timestamps emitted as strings per the determinism conventions."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id", "ts", "event_id", "value", "event_type")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    filled = ev.withColumn(
        "last_click_ts",
        F.last(
            F.when(F.col("event_type") == "click", F.date_format("ts", fmt)),
            ignorenulls=True,
        ).over(w),
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        "last_click_ts",
    )


@query(
    "q_join_range",
    oracle=f"""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 100000.0),
             ('mid', 100000.0, 250000.0),
             ('high', 250000.0, 1000000.0)
    )
    SELECT band,
           COUNT(*) AS n_orders,
           {SQL_DSUM("o_totalprice")} AS band_total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: facts against a tiny interval table on a
    non-equi predicate. The band table is broadcast, so the physical
    plan is a BroadcastNestedLoopJoin that streams the fact side once
    with zero shuffle — the only shape a non-equi join can take at
    100 TB (a shuffle theta-join would be quadratic). With many bands
    one would bucket on floor(price/width) first to make it an
    equi-join; three bands don't need it."""
    o = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 250000.0), ("high", 250000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("band_total"),
        )
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (all ordered region pairs). Legitimate only
    when at least one side is tiny — here both are; any big-side cross
    join is a design error the engine's other operators exist to avoid
    (broadcast theta, LSH candidates, banding)."""
    r = load(spark, sf_dir, "region")
    a = r.select(F.col("r_regionkey").alias("ka"), F.col("r_name").alias("from_region"))
    b = r.select(F.col("r_regionkey").alias("kb"), F.col("r_name").alias("to_region"))
    return a.crossJoin(b).filter(F.col("ka") != F.col("kb")).select(
        "from_region", "to_region"
    )


@query(
    "q_join_asof_tolerance",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id, event_type,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
      FROM events WHERE event_type IN ('purchase', 'click')
    ), filled AS (
      SELECT user_id, ts, event_id, event_type, ts_s,
             max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_click
      FROM u
    )
    SELECT event_id, user_id, ts_s AS purchase_ts,
           CASE WHEN last_click IS NOT NULL AND ts - last_click <= INTERVAL 6 HOUR
                THEN strftime(last_click, '%Y-%m-%d %H:%M:%S.%f') END AS click_ts
    FROM filled WHERE event_type = 'purchase'
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join WITH TOLERANCE: most recent prior click per user, but
    only if it happened within 6 hours of the purchase (stale matches
    are nulled — the asof-tolerance semantics of time-series systems).
    Same single-shuffle union+window shape as q_join_asof; the tolerance
    is a post-window predicate, costing nothing extra."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    filled = ev.withColumn(
        "last_click",
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))).over(w),
    )
    within = F.col("last_click").isNotNull() & (
        F.col("ts") <= F.col("last_click") + F.expr("INTERVAL 6 HOURS")
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.when(within, F.date_format("last_click", fmt)).alias("click_ts"),
    )


@query(
    "q_join_nullsafe",
    oracle="""
    WITH c AS (SELECT c_custkey, nullif(c_mktsegment, 'MACHINERY') AS seg FROM customer),
         s AS (SELECT DISTINCT nullif(c_mktsegment, 'MACHINERY') AS seg FROM customer)
    SELECT s.seg AS seg, COUNT(c.c_custkey) AS n_custs
    FROM s JOIN c ON s.seg IS NOT DISTINCT FROM c.seg
    GROUP BY s.seg
    """,
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    keys MATCH each other instead of vanishing — the semantic corner
    every dedup-on-nullable-key pipeline eventually hits. Nulls are
    synthesized with nullif on one segment."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif("c_mktsegment", F.lit("MACHINERY")).alias("seg")
    )
    segs = c.select("seg").distinct().select(F.col("seg").alias("s_seg"))
    return (
        segs.join(c, segs.s_seg.eqNullSafe(c.seg))
        .groupBy(F.col("s_seg").alias("seg"))
        .agg(F.count("c_custkey").alias("n_custs"))
    )


@query(
    "q_join_asof_forward",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('purchase', 'click')
    ), filled AS (
      SELECT user_id, ts, event_id, event_type,
             first_value(CASE WHEN event_type = 'click'
                              THEN strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_click_ts
      FROM ev
    )
    SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, next_click_ts
    FROM filled
    WHERE event_type = 'purchase'
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the mirror of ``q_join_asof``: for each
    purchase, the earliest STRICTLY LATER click by the same user (the
    "next action after conversion" lookup attribution pipelines pair
    with the backward variant). Same single-shuffle union+window shape
    — partition by user, order by time, first_value IGNORE NULLS over
    a LEADING frame — never a range join, which explodes at 100 TB;
    each event shuffles exactly once and both as-of directions reuse
    the same user partitioning if computed together. Timestamps
    emitted as strings per the determinism conventions."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    filled = ev.withColumn(
        "next_click_ts",
        F.first(
            F.when(F.col("event_type") == "click", F.date_format("ts", fmt)),
            ignorenulls=True,
        ).over(w),
    )
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        "next_click_ts",
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('purchase', 'click')
    ), filled AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                        IGNORE NULLS) OVER wb AS prev_us,
             last_value(CASE WHEN event_type = 'click'
                             THEN strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END
                        IGNORE NULLS) OVER wb AS prev_ts,
             first_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                         IGNORE NULLS) OVER wf AS next_us,
             first_value(CASE WHEN event_type = 'click'
                              THEN strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END
                         IGNORE NULLS) OVER wf AS next_ts
      FROM ev
      WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           CASE
             WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
             WHEN next_us IS NULL THEN 'backward'
             WHEN prev_us IS NULL THEN 'forward'
             WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts)
               THEN 'backward' ELSE 'forward'
           END AS direction,
           CASE
             WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
             WHEN next_us IS NULL THEN prev_ts
             WHEN prev_us IS NULL THEN next_ts
             WHEN epoch_us(ts) - prev_us <= next_us - epoch_us(ts)
               THEN prev_ts ELSE next_ts
           END AS matched_click_ts,
           CAST(CASE
             WHEN prev_us IS NULL AND next_us IS NULL THEN NULL
             WHEN next_us IS NULL THEN epoch_us(ts) - prev_us
             WHEN prev_us IS NULL THEN next_us - epoch_us(ts)
             ELSE LEAST(epoch_us(ts) - prev_us, next_us - epoch_us(ts))
           END AS BIGINT) AS diff_us
    FROM filled
    WHERE event_type = 'purchase'
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — the third matching mode next to backward
    (``q_join_asof``) and forward (``q_join_asof_forward``): each
    purchase pairs with the temporally CLOSEST click either side, ties
    to the backward match (pandas/polars ``direction='nearest'``
    semantics). Still one shuffle on user_id: both directional
    candidates come from the same window pass (IGNORE NULLS scans over
    trailing and leading frames), and the winner is a map-side CASE on
    exact microsecond deltas — never the naive range join whose
    candidate explosion is unbounded at 100 TB. Timestamps emitted as
    strings, deltas as exact BIGINT micros."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("user_id", "ts", "event_id", "event_type")
    )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    wb = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    click_us = F.when(F.col("event_type") == "click", F.unix_micros("ts"))
    click_ts = F.when(
        F.col("event_type") == "click", F.date_format("ts", fmt)
    )
    filled = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(click_us, ignorenulls=True).over(wb).alias("prev_us"),
        F.last(click_ts, ignorenulls=True).over(wb).alias("prev_ts"),
        F.first(click_us, ignorenulls=True).over(wf).alias("next_us"),
        F.first(click_ts, ignorenulls=True).over(wf).alias("next_ts"),
    )
    us = F.unix_micros("ts")
    back_nearer = (us - F.col("prev_us")) <= (F.col("next_us") - us)
    return filled.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("purchase_ts"),
        F.when(F.col("prev_us").isNull() & F.col("next_us").isNull(), F.lit(None))
        .when(F.col("next_us").isNull(), F.lit("backward"))
        .when(F.col("prev_us").isNull(), F.lit("forward"))
        .when(back_nearer, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
        F.when(F.col("prev_us").isNull() & F.col("next_us").isNull(), F.lit(None))
        .when(F.col("next_us").isNull(), F.col("prev_ts"))
        .when(F.col("prev_us").isNull(), F.col("next_ts"))
        .when(back_nearer, F.col("prev_ts"))
        .otherwise(F.col("next_ts"))
        .alias("matched_click_ts"),
        F.when(F.col("prev_us").isNull() & F.col("next_us").isNull(), F.lit(None))
        .when(F.col("next_us").isNull(), us - F.col("prev_us"))
        .when(F.col("prev_us").isNull(), F.col("next_us") - us)
        .otherwise(F.least(us - F.col("prev_us"), F.col("next_us") - us))
        .cast("long")
        .alias("diff_us"),
    )
