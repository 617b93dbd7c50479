"""Synthetic order-event generation — the Spark-native re-expression of
the reference's producer (KafkaProducerApp.scala:37-57 and
MockData.scala:22-43): userId ∈ [0,1000), courseId ∈ [0,500),
fee ∈ [0,500), flag ∈ {"0","1"}, orderId = UUID, time = wall clock,
every field serialized as a JSON string.

Three feeds:
- ``order_events_batch`` — distributed ``spark.range`` + column exprs
  (no driver-side loop, unlike the reference's single-JVM generator);
- ``order_events_stream`` — ``rate`` source mapped to the same schema
  for continuous tests;
- ``to_kafka_json`` — ``to_json(struct(*))`` payloads ready for a Kafka
  sink (``write.format("kafka")`` when a broker is configured).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["order_events_batch", "order_events_stream", "to_kafka_json"]


def _with_order_columns(df: DataFrame, id_col: str) -> DataFrame:
    """Map a monotonically-id'd frame to the reference's order schema.
    rand() is seeded per column so output is reproducible."""
    i = F.col(id_col)
    return df.select(
        F.date_format(
            F.col("event_time"), "yyyy-MM-dd HH:mm:ss"
        ).alias("time"),  # reference time format, Producer:34
        (F.floor(F.rand(seed=1) * 1000)).cast("string").alias("userId"),
        (F.floor(F.rand(seed=2) * 500)).cast("string").alias("courseId"),
        (F.floor(F.rand(seed=3) * 500)).cast("string").alias("fee"),
        (F.floor(F.rand(seed=4) * 2)).cast("string").alias("flag"),
        F.uuid().alias("orderId"),
    )


def order_events_batch(
    spark: SparkSession, n: int = 10, start: str = "2024-03-01 00:00:00"
) -> DataFrame:
    """n synthetic order events with event times spaced 1 s apart from
    ``start`` (deterministic timeline → testable day buckets)."""
    base = spark.range(n).select(
        F.col("id"),
        (F.lit(start).cast("timestamp") + F.make_interval(secs=F.col("id"))).alias(
            "event_time"
        ),
    )
    return _with_order_columns(base, "id")


def order_events_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Continuous order-event stream from the rate source (one row per
    tick mapped to an order event)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumnRenamed("timestamp", "event_time")
        .withColumnRenamed("value", "id")
    )
    return _with_order_columns(rate, "id")


def to_kafka_json(df: DataFrame) -> DataFrame:
    """Serialize order events to Kafka-ready (key, value) JSON — the
    reference's fastjson+ProducerRecord step (Producer:46-56) as a
    single expression."""
    return df.select(
        F.col("orderId").alias("key"), F.to_json(F.struct(*df.columns)).alias("value")
    )
