"""TPC-H-adapted decision-support suite (SURVEY.md §2 Part B, B.3/B.4/B.6).

The driver fixtures are a TPC-H-ish star schema (FIXTURES.md §2), so the
classic TPC-H queries are the natural end-to-end completeness check for
the relational surface: multi-way joins, correlated EXISTS, scalar
subqueries, left-join histograms, disjunctive predicates, HAVING, and
top-k — each adapted to the columns the fixtures actually carry (no
partsupp / ship-mode / commit-receipt dates / phone; adaptations noted
per query). Q1's shape is already registered as ``q_agg_basic``.

Scale posture: every dimension side (region/nation/customer/supplier/
part at TPC-H ratios) is explicitly ``broadcast()`` so the lineitem /
orders fact tables never shuffle for a dim join; the only exchanges in
these plans are fact⋈fact joins and final aggregations. Dates filter at
the parquet scan (PushedFilters), projections prune to the columns used.

Determinism (FIXTURES.md §3): money sums accumulate as decimal via
``dsum`` (order-insensitive), dates are emitted as formatted strings,
and every top-k breaks ties on a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import SQL_DSUM, dsum, query
from steaminganalysis_spark.sources import load


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def _revenue() -> F.Column:
    # Built lazily: creating Columns at import time requires an active session.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_SQL_REVENUE = "l_extendedprice * (1 - l_discount)"


@query(
    "q_tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {SQL_DSUM(_SQL_REVENUE, 4)} AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): segment-filtered customer dim is
    broadcast into orders, the orders⋈lineitem fact join shuffles once,
    and the top-10 is a TakeOrderedAndProject (no global sort
    materialization). Adaptation: o_orderpriority stands in for the
    missing o_shippriority; ties broken on l_orderkey."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts("1998-03-15"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(_revenue(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q_tpch_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): correlated EXISTS expressed
    as a LEFT SEMI join — the semi join needs only the distinct matching
    keys, so the lineitem side reduces before the shuffle. Adaptation:
    the fixtures carry no commit/receipt dates, so the EXISTS predicate
    is ``l_returnflag = 'R'`` (late/returned lines)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q_tpch_q5",
    oracle=f"""
    SELECT n_name, {SQL_DSUM(_SQL_REVENUE, 4)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local-supplier volume): 6-way join where the
    customer-nation must equal the supplier-nation. All four dims
    broadcast; the only shuffle joins the two fact tables. The
    region→nation filter prunes before broadcasting."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue(), 4).alias("revenue"))
    )


@query(
    "q_tpch_q6",
    oracle=f"""
    SELECT {SQL_DSUM("l_extendedprice * l_discount", 4)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure filtered scan-agg; all
    three predicates push to the parquet reader and the 2-column
    projection prunes the read schema — the cheapest possible plan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"))


@query(
    "q_tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {SQL_DSUM(_SQL_REVENUE, 4)} AS revenue,
           CAST(ANY_VALUE(c_acctbal) AS DOUBLE) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by
    lost revenue in a quarter+. Customer and nation broadcast; the
    returnflag filter narrows lineitem before the fact join; top-k via
    TakeOrderedAndProject with c_custkey tiebreak."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01")) & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(_revenue(), 4).alias("revenue"),
            F.any_value(F.col("c_acctbal")).cast("double").alias("c_acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                       AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): left outer join with a
    join-side-only predicate (kept in the ON clause — moving it to WHERE
    would wrongly drop order-less customers), per-customer count
    including zeros, then a histogram of the counts. Adaptation: the
    excluded class is an order priority (no o_comment column)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_tpch_q14",
    oracle=f"""
    SELECT round(100.0 * {SQL_DSUM(f"CASE WHEN p_type = 'PROMO' THEN {_SQL_REVENUE} ELSE 0 END", 4)}
                 / {SQL_DSUM(_SQL_REVENUE, 4)}, 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional-sum ratio over one
    month of shipments with the part dim broadcast. Adaptation: fixture
    p_type is categorical so the predicate is equality, not LIKE
    'PROMO%'. Both sums accumulate as decimal, so the ratio is
    deterministic to the last ulp."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-03-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    promo = dsum(F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(0.0), 4)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.round(100.0 * promo / dsum(_revenue(), 4), 6).alias("promo_revenue_pct"))
    )


@query(
    "q_tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct-supplier count
    per (brand, type, size) bucket. Adaptation: no partsupp table — the
    observed lineitem (partkey, suppkey) pairs stand in for it. The
    brand/size filters apply to the broadcast part dim before the join."""
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q18",
    oracle=f"""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(ANY_VALUE(o_orderdate), '%Y-%m-%d') AS orderdate,
           CAST(ANY_VALUE(o_totalprice) AS DOUBLE) AS o_totalprice,
           {SQL_DSUM("l_quantity")} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey
    """,
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds 300 (≈top 0.3%% at fixture scale). The HAVING subquery is a
    pre-aggregated semi join on l_orderkey — at 100 TB the heavy-hitter
    keyset it produces is tiny, so Spark broadcasts it back against the
    fact tables instead of re-shuffling them."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"), li.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey")
        .agg(
            F.date_format(F.any_value(F.col("o_orderdate")), "yyyy-MM-dd").alias("orderdate"),
            F.any_value(F.col("o_totalprice")).cast("double").alias("o_totalprice"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


@query(
    "q_tpch_q19",
    oracle=f"""
    SELECT {SQL_DSUM(_SQL_REVENUE, 4)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunction of conjunctive
    brand/size/quantity bands spanning BOTH join sides — the classic
    test that OR predicates still evaluate after a join instead of
    blocking it. Part broadcasts; per-side prunable conjuncts (brand,
    size, quantity ranges) are left to Catalyst's OR-predicate
    inference. Adaptation: no p_container/shipmode columns."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(band).agg(dsum(_revenue(), 4).alias("revenue"))


@query(
    "q_tpch_q22",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): scalar subquery (average
    positive balance) + anti join (customers who never ordered), grouped
    per nation. The scalar aggregate broadcasts as a literal-sized plan;
    the anti join needs only orders' distinct o_custkey. Adaptation:
    c_nationkey groups stand in for the missing phone country code.
    The threshold compares raw doubles (not dsum): AVG over a fixed set
    is order-stable enough at double precision because Spark and DuckDB
    both sum <200k doubles; the output sum still goes through decimal."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg(F.col("c_acctbal").cast("decimal(30,6)")).cast("double").alias("a"))
    )
    rich = c.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("a"))
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {SQL_DSUM("volume", 4)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, {_SQL_REVENUE} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey  = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
          OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations
    by ship year. The nation dim joins lineitem twice under different
    aliases (supplier side and customer side) with a cross-pair
    disjunction — both broadcast, so the disjunction evaluates without
    blocking either join. Ship-date range filter pushes to the scan."""
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    pair = ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_6")) | (
        (F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_9")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_revenue(), 4).alias("revenue"))
    )


@query(
    "q_tpch_q8",
    oracle=f"""
    SELECT o_year,
           round({SQL_DSUM("CASE WHEN supp_nation = 'NATION_9' THEN volume ELSE 0 END", 4)}
                 / {SQL_DSUM("volume", 4)}, 6) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year, {_SQL_REVENUE} AS volume,
             n2.n_name AS supp_nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of regional
    revenue per year — a conditional-sum / total-sum ratio over a 7-way
    star join. All dims broadcast; the single shuffle is
    lineitem⋈orders + the final 2-group aggregation. Both sums
    accumulate as decimal so the ratio is exact."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    volume = _revenue()
    nation9 = F.when(F.col("supp_nation") == "NATION_9", volume).otherwise(0.0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(dsum(nation9, 4) / dsum(volume, 4), 6).alias("mkt_share"))
    )


@query(
    "q_tpch_q9",
    oracle=f"""
    SELECT nation, o_year, {SQL_DSUM("amount", 4)} AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             {_SQL_REVENUE} - 0.1 * p_retailprice * l_quantity AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_type = 'STANDARD'
    )
    GROUP BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): profit per supplier nation per
    order year. Adaptation: no partsupp, so supply cost is proxied by
    ``0.1 * p_retailprice * l_quantity``. Part/supplier/nation
    broadcast; profit expression folds into the scan-side projection."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    amount = _revenue() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount, 4).alias("sum_profit"))
    )


@query(
    "q_tpch_q11",
    oracle=f"""
    WITH partval AS (
      SELECT l_partkey, {SQL_DSUM("l_extendedprice", 4)} AS value
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_9'
      GROUP BY l_partkey
    )
    SELECT l_partkey, value FROM partval
    WHERE value > (SELECT 0.01 * SUM(value) FROM partval)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part traded value from one
    nation's suppliers, keeping parts above a fraction of the global
    total — HAVING against a scalar subquery over the same aggregate.
    Adaptation: no partsupp, so value is the lineitem extended price
    observed for that nation's suppliers. The per-part aggregate is
    computed once and reused for both the rows and the threshold; the
    scalar broadcasts. Threshold arithmetic is double-on-decimal-sums,
    identical in both engines."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    li = load(spark, sf_dir, "lineitem")
    partval = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice"), 4).alias("value"))
    )
    thresh = partval.agg(
        (0.01 * F.sum(F.col("value").cast("decimal(30,4)")).cast("double")).alias("thresh")
    )
    return (
        partval.join(F.broadcast(thresh))
        .filter(F.col("value") > F.col("thresh"))
        .select("l_partkey", "value")
    )


@query(
    "q_tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping priority classes): per line-status counts of
    high- vs low-priority orders shipped in a year — paired conditional
    counts after a fact-fact join. Adaptation: l_linestatus stands in
    for the missing l_shipmode. The year filter narrows lineitem at the
    scan before the join shuffle."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, {SQL_DSUM(_SQL_REVENUE, 4)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the revenue 'view' (per-supplier
    quarterly revenue) is computed once and compared against its own
    MAX — the classic aggregate-reused-as-scalar-subquery shape. The
    equality compare is safe because both sides come from the same
    decimal-accumulated sum. The scalar max broadcasts."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01")) & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_revenue(), 4).alias("total_revenue"))
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q_tpch_q17",
    oracle=f"""
    SELECT round({SQL_DSUM("l_extendedprice", 4)} / 7.0, 6) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS t_partkey,
             0.5 * {SQL_DSUM("l_quantity")} / COUNT(*) AS qty_thresh
      FROM lineitem GROUP BY l_partkey
    ) ON t_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < qty_thresh
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines whose quantity is
    below half the average for their part — the correlated per-part AVG
    subquery, decorrelated into a pre-aggregated broadcast join (the
    per-part aggregate is tiny relative to lineitem at any scale). The
    threshold is 0.5 * decimal-exact-sum / count evaluated in double, so
    both engines compute bit-identical thresholds."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * dsum(F.col("l_quantity")) / F.count("*")).alias("qty_thresh")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(dsum(F.col("l_extendedprice"), 4) / 7.0, 6).alias("avg_yearly"))
    )


@query(
    "q_tpch_q2",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), ranked AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             MIN(unit_cost) OVER (PARTITION BY l_partkey) AS best
      FROM cost
    )
    SELECT p_partkey, s_name,
           FLOOR(unit_cost * 10000.0 + 0.5) / 10000.0 AS unit_cost
    FROM ranked
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 10 AND unit_cost = best
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each small part, the
    supplier(s) offering the lowest observed unit price — the correlated
    MIN subquery, decorrelated into a window MIN over the per-(part,
    supplier) aggregate. Two deliberate exchanges: the aggregate one
    moves map-side-combined partials (not raw lineitem), and the window
    one moves only the already-aggregated rows — cheaper at scale than
    forcing a single partkey shuffle of raw rows, and either beats a
    correlated rescan (quadratic). Adaptation: no
    partsupp, so unit cost is MIN(l_extendedprice/l_quantity) observed
    in lineitem; no region/acctbal output columns. Ties keep all rows
    (deterministic set semantics, no arbitrary pick). unit_cost is
    emitted via floor-based ``round_half_up``: price(2dp)/quantity(int)
    terminates one digit past scale 4 constantly, the boundary where
    Spark's round and DuckDB's round split (found at sf0.1, round 4)."""
    from pyspark.sql import Window

    from steaminganalysis_spark.registry import round_half_up

    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey")
    ranked = cost.withColumn("best", F.min("unit_cost").over(w))
    return (
        ranked.filter(F.col("unit_cost") == F.col("best"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "p_partkey",
            "s_name",
            round_half_up(F.col("unit_cost"), 4).alias("unit_cost"),
        )
    )


@query(
    "q_tpch_q20",
    oracle=f"""
    WITH promo_supp AS (
      SELECT l_suppkey, {SQL_DSUM("l_quantity")} AS qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM promo_supp
      WHERE qty > (SELECT 0.5 * {SQL_DSUM("qty")} / COUNT(*) FROM promo_supp)
    )
    ORDER BY s_suppkey
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess-volume suppliers): nested IN subqueries —
    suppliers whose shipped quantity of PROMO parts exceeds half the
    average per-supplier PROMO volume. The part-key IN reduces to a
    broadcast semi join before the aggregate; the scalar threshold
    (0.5 * decimal-exact sum / count, evaluated in double) broadcasts
    back; the outer IN is another semi join. Adaptation: no partsupp
    availqty, so 'excess' is relative to the fleet average."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    promo_supp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("qty"))
    )
    thresh = promo_supp.agg(
        (0.5 * F.sum(F.col("qty").cast("decimal(30,2)")).cast("double") / F.count("*")).alias("t")
    )
    keep = promo_supp.join(F.broadcast(thresh)).filter(F.col("qty") > F.col("t"))
    return (
        s.join(F.broadcast(keep), s.s_suppkey == keep.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q_tpch_q21",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): the famous
    EXISTS + NOT EXISTS pair correlated on the same fact — finished
    multi-supplier orders where exactly one supplier returned lines.
    Expressed as a semi join (another supplier participated) followed
    by an anti join (no other supplier returned), both on l_orderkey
    with a supplier-inequality residual. Adaptation: returnflag 'R'
    stands in for the missing receipt-after-commit delay."""
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load(spark, sf_dir, "lineitem")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    waited = (
        l1.join(l2, (l1.l_orderkey == F.col("o2")) & (l1.l_suppkey != F.col("s2")), "left_semi")
        .join(l3, (l1.l_orderkey == F.col("o3")) & (l1.l_suppkey != F.col("s3")), "left_anti")
    )
    return (
        waited.join(o, waited.l_orderkey == o.o_orderkey, "left_semi")
        .join(F.broadcast(s), waited.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
