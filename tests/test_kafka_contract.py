"""Broker-less Kafka option/payload contract tests (VERDICT r3 order
#3): the sandbox has no Kafka broker or connector JAR, so the A1/A15
surface is pinned at the construction level — the exact option
spelling the source/sink builders emit, and the executable payload
round-trip (producer serialization → source-side parse) on a batch
frame. A typo in an option key or a drifted JSON field name fails
here instead of shipping silently.

Reference contract being pinned:
- source: StreamingAnalysisAppWithKafkaManageOffset.scala:28-45
  (subscribe, earliest start, fail-on-data-loss semantics);
- producer: KafkaProducerApp.scala:17-56 (six string JSON fields
  time/userId/courseId/fee/flag/orderId, string key/value).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from steaminganalysis_spark.streaming.datagen import (
    order_events_batch,
    to_kafka_json,
)
from steaminganalysis_spark.streaming.pipeline import (
    build_kafka_reader,
    classify_orders,
    kafka_sink_options,
    kafka_source_options,
    parse_order_json,
    starting_offsets_json,
)


def test_kafka_source_options_exact_spelling():
    """The full option dict, byte-exact. ``kafka.bootstrap.servers``
    MUST carry the ``kafka.`` passthrough prefix — a bare
    ``bootstrap.servers`` is silently dropped by the source."""
    assert kafka_source_options("b1:9092,b2:9092", "orders") == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "orders",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
    }
    assert (
        kafka_source_options("b:9092", "t", fail_on_data_loss=False)[
            "failOnDataLoss"
        ]
        == "false"
    )


def test_kafka_sink_options_exact_spelling():
    assert kafka_sink_options("b:9092", "orders") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "orders",
    }


def test_starting_offsets_json_format():
    """Assign-at-offsets (A2): partitions serialize as STRING keys,
    offsets as numbers, -2/-1 sentinels pass through."""
    s = starting_offsets_json("orders", {0: 123, 1: -2, 2: -1})
    assert json.loads(s) == {"orders": {"0": 123, "1": -2, "2": -1}}
    # the JSON is a valid startingOffsets value (single topic object)
    assert isinstance(json.loads(s)["orders"], dict)


class _RecorderReader:
    """Stands in for DataStreamReader: records the format/option calls
    build_kafka_reader makes, in order."""

    def __init__(self):
        self.calls: list[tuple[str, ...]] = []

    def format(self, fmt):
        self.calls.append(("format", fmt))
        return self

    def option(self, k, v):
        self.calls.append(("option", k, v))
        return self


def test_build_kafka_reader_wiring():
    """The reader receives format('kafka') then every option from the
    contract dict, values stringly typed — the exact call sequence the
    real DataStreamReader would see."""
    rec = _RecorderReader()
    opts = kafka_source_options("b:9092", "orders", "earliest")
    build_kafka_reader(rec, opts)
    assert rec.calls[0] == ("format", "kafka")
    assert {(k, v) for _, k, v in rec.calls[1:]} == set(opts.items())
    assert all(isinstance(v, str) for _, _, v in rec.calls[1:])


def test_kafka_payload_roundtrip(spark):
    """Producer serialization → source-side parse is the identity:
    to_kafka_json (A15) emits exactly (key, value); the JSON carries
    exactly the reference producer's six string fields; and
    parse_order_json (A4) reconstructs the original rows."""
    orders = order_events_batch(spark, n=20)
    wire = to_kafka_json(orders)
    assert wire.columns == ["key", "value"]

    first = json.loads(wire.select("value").first()["value"])
    assert set(first) == {"time", "userId", "courseId", "fee", "flag", "orderId"}
    assert all(isinstance(v, str) for v in first.values())

    # key column IS the orderId (reference keys records by order)
    kv = wire.withColumn("o", F.get_json_object("value", "$.orderId"))
    assert kv.filter(F.col("key") != F.col("o")).count() == 0

    back = parse_order_json(wire)
    a = sorted(tuple(r) for r in orders.collect())
    b = sorted(tuple(r) for r in back.select(*orders.columns).collect())
    assert a == b


def test_classified_kafka_stream_schema(spark):
    """The batch twin of kafka_order_stream's post-source chain:
    parse → classify yields the day/success/fee_cents/orderId frame the
    rollup consumes, fee masked to paid orders."""
    classified = classify_orders(parse_order_json(to_kafka_json(order_events_batch(spark, 50))))
    assert classified.columns == ["day", "success", "fee_cents", "orderId"]
    rows = classified.collect()
    assert all(r.success in (0, 1) for r in rows)
    assert all(r.fee_cents == 0 for r in rows if r.success == 0)
    assert all(r.day == "2024-03-01" for r in rows)
