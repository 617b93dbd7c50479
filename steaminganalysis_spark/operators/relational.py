"""Scans, projection/cast, filters, conditionals, sort/limit, set ops
(SURVEY.md §2 B.1/B.2/B.6).

These are deliberately thin declarative plans: the value at scale is
what Catalyst does with them — predicate pushdown and column pruning
into the parquet reader, TakeOrderedAndProject for top-k (no global
sort materialization), partial aggregation under distinct set ops.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import query
from steaminganalysis_spark.schemas import EVENTS_SCHEMA
from steaminganalysis_spark.sources import load


@query(
    "q_scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity >= 30
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar parquet scan with projection + predicate. Catalyst pushes
    both into the reader: ReadSchema lists 4 of 11 columns and
    PushedFilters carries the quantity predicate (cf. the reference,
    which re-parses whole JSON blobs per record, StreamingAnalysisAppWithKafkaManageOffset.scala:52)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag").filter(
        F.col("l_quantity") >= 30
    )


def _events_jsonl_path(sf_dir: str) -> str:
    """Materialize the events table as JSON-lines once per sf_dir (via
    pyarrow, driver-side, test scale only) so the JSON reader path is
    exercised against an oracle-checkable table."""
    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out = os.path.join(tempfile.gettempdir(), f"sa_spark_events_{tag}.jsonl")
    if not os.path.exists(out):
        tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            for row in tbl.to_pylist():
                row["ts"] = row["ts"].strftime("%Y-%m-%d %H:%M:%S.%f")
                f.write(json.dumps(row) + "\n")
        os.replace(tmp, out)
    return out


@query(
    "q_scan_json",
    oracle="""
    SELECT event_type, COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS id_sum
    FROM events
    GROUP BY event_type
    """,
)
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines scan with an explicit schema (no inference pass —
    at 100 TB schema inference is a full extra read). The JSON file is a
    faithful dump of `events`, so the parquet-based oracle applies."""
    path = _events_jsonl_path(sf_dir)
    ev = spark.read.schema(EVENTS_SCHEMA).json(path)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.sum("event_id").alias("id_sum")
    )


@query(
    "q_project_cast",
    oracle="""
    SELECT event_id,
           CAST(FLOOR(value) AS BIGINT) AS fee_long,
           CAST(user_id AS VARCHAR) AS user_str,
           upper(event_type) AS event_uc
    FROM events
    """,
)
def project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + type coercion — the reference's stringly-typed field
    extraction (`getLong("fee")` on a string value, StreamingAnalysisAppWithKafkaManageOffset.scala:55)
    expressed as explicit casts. FLOOR before the integer cast because
    Spark truncates double→long while DuckDB rounds; FLOOR makes both
    deterministic and identical."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.floor("value").cast("long").alias("fee_long"),
        F.col("user_id").cast("string").alias("user_str"),
        F.upper("event_type").alias("event_uc"),
    )


@query(
    "q_filter_basic",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0 AND NOT o_orderpriority = '5-LOW'
    """,
)
def filter_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/comparison predicate; pushes to the parquet scan
    (generalizes the reference's flag filter, StreamingAnalysisAppWithKafkaManageOffset.scala:62)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_totalprice") > 100000.0)
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "q_filter_in_between_like",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#3')
      AND p_size BETWEEN 10 AND 40
      AND p_name LIKE '%a%'
      AND p_type IS NOT NULL
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / IS NOT NULL predicate pack on part."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#1", "Brand#3")
        & F.col("p_size").between(10, 40)
        & F.col("p_name").like("%a%")
        & F.col("p_type").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@query(
    "q_case_when",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_paid,
           CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS paid_fee,
           CASE WHEN value >= 250 THEN 'high'
                WHEN value >= 100 THEN 'mid'
                ELSE 'low' END AS fee_band
    FROM events
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's paid/placed classification (StreamingAnalysisAppWithKafkaManageOffset.scala:62:
    `if (flag=="1") (1, fee) else (0, 0)`) as CASE WHEN, plus a
    multi-branch band."""
    ev = load(spark, sf_dir, "events")
    paid = F.col("event_type") == "purchase"
    return ev.select(
        "event_id",
        F.when(paid, 1).otherwise(0).alias("is_paid"),
        F.when(paid, F.col("value")).otherwise(0.0).alias("paid_fee"),
        F.when(F.col("value") >= 250, "high")
        .when(F.col("value") >= 100, "mid")
        .otherwise("low")
        .alias("fee_band"),
    )


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, NULLIF(o_orderpriority, '5-LOW') AS pri, o_totalprice
    FROM orders
    ORDER BY pri NULLS FIRST, o_totalprice DESC, o_orderkey
    LIMIT 200
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering + limit → Catalyst
    plans TakeOrderedAndProject: per-partition top-200 then a merge of
    32 candidate sets on the driver — no global sort shuffle. That is
    the only top-k plan that survives 100 TB."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("pri"),
            "o_totalprice",
        )
        .orderBy(
            F.col("pri").asc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(200)
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (ties broken on the unique key so the hash cannot
    flap)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@query(
    "q_set_union",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with a provenance column (no dedup — bag semantics)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side")
    )
    return c.unionByName(s)


@query(
    "q_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — planned as an aggregate + left-semi join;
    both sides shrink to distinct keys before the shuffle."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q_set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT — planned as left-anti over distinct keys."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT DISTINCT (left-anti over distinct keys)


@query(
    "q_set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: min of the two multiplicities) —
    customers keyed by how many finished vs open orders they have."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersectAll(op)


@query(
    "q_set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics: multiplicity difference, floored at
    zero)."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.exceptAll(op)


@query(
    "q_sort_nulls",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') AS status_or_null,
           o_totalprice
    FROM orders
    ORDER BY nullif(o_orderstatus, 'P') DESC NULLS FIRST,
             o_totalprice DESC,
             o_orderkey
    LIMIT 50
    """,
)
def sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULL-ordering sort (NULLS FIRST under DESC — the
    non-default both engines must agree on), nulls synthesized with
    nullif; unique-key tiebreak; TakeOrderedAndProject limit."""
    o = load(spark, sf_dir, "orders")
    status = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        o.select("o_orderkey", status.alias("status_or_null"), "o_totalprice")
        .orderBy(
            F.col("status_or_null").desc_nulls_first(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey"),
        )
        .limit(50)
    )


@query(
    "q_set_union_by_name",
    oracle="""
    WITH unioned AS (
      SELECT c_custkey AS key, c_acctbal AS balance, c_mktsegment AS segment,
             NULL::BIGINT AS nationkey
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL BY NAME
      SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT) AS nationkey,
             c_custkey AS key, c_acctbal AS balance
      FROM customer WHERE c_custkey % 3 = 1
    )
    SELECT key, balance, segment, nationkey FROM unioned ORDER BY key
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unionByName(allowMissingColumns=True)`` — the schema-aware
    union: branches with different column ORDER and a column missing
    on one side align by NAME (missing → null), where positional
    UNION would silently mis-assign columns. The everyday hazard it
    kills: appending a new-schema batch to an old extract. DuckDB's
    twin is UNION ALL BY NAME. Zero-shuffle plan — two pushed scans
    and a concat."""
    c = load(spark, sf_dir, "customer")
    left = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("balance"),
        F.col("c_mktsegment").alias("segment"),
    )
    right = c.filter(F.col("c_custkey") % 3 == 1).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("balance"),
    )
    return (
        left.unionByName(right, allowMissingColumns=True)
        .select("key", "balance", "segment", "nationkey")
        .orderBy("key")
    )
