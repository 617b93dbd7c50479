"""Explicit StructType schemas for every input the engine consumes.

The reference parses untyped JSON per record (fastjson ``JSONObject``,
StreamingAnalysisAppWithKafkaManageOffset.scala:52) with silent per-field coercion; this engine declares
schemas up front so Catalyst can prune/pushdown and ``from_json`` is
total (see SURVEY.md §1.2).

Two families:
1. ``ORDER_EVENT_SCHEMA`` — the reference's Kafka order-event JSON
   (all-string fields per KafkaProducerApp.scala:38-52).
2. Fixture-table schemas for ``/root/testdata/sf*/`` (FIXTURES.md §2),
   used for streaming-source declarations (batch parquet reads take the
   footer schema automatically).
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = ["ORDER_EVENT_SCHEMA", "EVENTS_SCHEMA", "TABLE_SCHEMAS", "TABLE_NAMES"]

# Reference order event: every field produced as a JSON string
# (KafkaProducerApp.scala:38-52); typed extraction happens via cast.
ORDER_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("time", T.StringType()),  # "yyyy-MM-dd HH:mm:ss"
        T.StructField("userId", T.StringType()),
        T.StructField("courseId", T.StringType()),
        T.StructField("fee", T.StringType()),  # stringly-typed long
        T.StructField("flag", T.StringType()),  # "0" | "1"
        T.StructField("orderId", T.StringType()),  # UUID
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON blob, e.g. {"k": 87}
    ]
)

# props payload schema for from_json
PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": EVENTS_SCHEMA,
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES = tuple(TABLE_SCHEMAS)
