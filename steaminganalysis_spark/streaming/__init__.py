"""Structured Streaming core — the reference's actual identity
(SURVEY.md §3.1), rebuilt on Structured Streaming:

- :mod:`datagen` — the order-event generator (reference
  KafkaProducerApp/MockData analog) as batch, rate-stream, and Kafka
  feeds.
- :mod:`sinks` — key-value (Redis-style) sink with per-batch-id
  idempotence guard; fixes the reference's at-least-once double-count
  hazard (SURVEY.md §4.3).
- :mod:`pipeline` — the flagship order pipeline: source → from_json →
  classify → per-day aggregate → KV sink, with checkpointing replacing
  both of the reference's hand-rolled offset managers.
- :mod:`queries` — driver-registered streaming queries (stream-batch
  equivalence is the correctness argument).
"""
