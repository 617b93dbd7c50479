"""Real-backend adapters behind the KV/Kafka contracts.

The container has neither a Redis server nor a Kafka broker, so the
integration tests skip cleanly here and run wherever the backends exist
(``SPARK_GRAFT_REDIS_URL`` / ``SPARK_GRAFT_KAFKA_BOOTSTRAP``). The
contract tests on the in-process store always run — they pin the
atomic apply-batch semantics both implementations share.
"""

from __future__ import annotations

import os
import uuid

import pytest

from steaminganalysis_spark.streaming.sinks import (
    KEY_PREFIX,
    KVStore,
    apply_day_rollup_batch,
)


def _exercise_contract(store) -> None:
    """Shared conformance suite for any KVStore-contract implementation."""
    run = uuid.uuid4().hex[:8]
    marker = f"t-{run}-last-applied"
    k1, k2 = f"t-{run}-day1", f"t-{run}-day2"

    # fresh marker
    assert store.last_applied(marker) == -1
    # first apply commits increments and marker together
    assert store.apply_batch(0, [(k1, "total", 2), (k2, "total", 3)], marker)
    assert store.hgetall(k1) == {"total": 2}
    assert store.hgetall(k2) == {"total": 3}
    assert store.last_applied(marker) == 0
    # replay of a committed id is skipped whole
    assert not store.apply_batch(0, [(k1, "total", 100)], marker)
    assert store.hgetall(k1) == {"total": 2}
    # ids never go backwards within a checkpoint: a stale lower id skips
    assert not store.apply_batch(-1, [(k1, "total", 100)], marker)
    # the next id accumulates
    assert store.apply_batch(1, [(k1, "total", 5), (k1, "success", 1)], marker)
    assert store.hgetall(k1) == {"total": 7, "success": 1}
    assert store.last_applied(marker) == 1
    # plain hincrby / setnx still behave
    assert store.hincrby(k2, "total", -1) == 2
    assert store.setnx(f"t-{run}-nx", "a")
    assert not store.setnx(f"t-{run}-nx", "b")


def test_inprocess_store_apply_batch_contract():
    _exercise_contract(KVStore.instance(f"contract-{uuid.uuid4().hex[:6]}"))


def test_guard_state_is_single_watermark_key():
    """Applying many batches must not grow guard state: one marker key,
    not one applied-batch-N key per batch forever."""
    store = KVStore.instance(f"wm-{uuid.uuid4().hex[:6]}")
    for bid in range(50):
        store.apply_batch(bid, [("h", "total", 1)], "last-applied")
    assert store.hgetall("h") == {"total": 50}
    assert set(store.kv) == {"last-applied"}


def test_failed_attempt_leaves_store_untouched_then_replay_applies(spark):
    """The guard-first crash window is closed: an attempt that dies
    BEFORE the atomic commit leaves no trace (marker unmoved, counts
    unmoved), so Spark's replay of the same batch_id applies the batch
    exactly once rather than silently dropping it."""
    from steaminganalysis_spark.streaming.datagen import order_events_batch, to_kafka_json
    from steaminganalysis_spark.streaming.pipeline import (
        classify_orders,
        day_rollup_delta,
        parse_order_json,
    )

    store_name = f"crash-{uuid.uuid4().hex[:6]}"
    store = KVStore.instance(store_name)
    df = classify_orders(parse_order_json(to_kafka_json(order_events_batch(spark, 40))))

    calls = {"n": 0}

    def flaky_agg(batch_df):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated executor loss mid-batch")
        return day_rollup_delta(batch_df)

    with pytest.raises(RuntimeError):
        apply_day_rollup_batch(df, batch_id=3, agg_fn=flaky_agg, store_name=store_name)
    assert store.keys() == [] and store.last_applied(f"{KEY_PREFIX}last-applied-batch") == -1

    # Spark replays batch 3 after the failure — it must apply, once.
    apply_day_rollup_batch(df, batch_id=3, agg_fn=flaky_agg, store_name=store_name)
    totals = {k: store.hgetall(k)["total"] for k in store.keys()}
    assert sum(totals.values()) == 40
    apply_day_rollup_batch(df, batch_id=3, agg_fn=flaky_agg, store_name=store_name)
    assert sum(store.hgetall(k)["total"] for k in store.keys()) == 40


def _redis_store():
    url = os.environ.get("SPARK_GRAFT_REDIS_URL", "redis://localhost:6379/0")
    try:
        from steaminganalysis_spark.streaming.sinks import HAVE_REDIS, RedisKVStore

        if not HAVE_REDIS:
            return None
        store = RedisKVStore(url)
        store._r.ping()
        return store
    except Exception:
        return None


def test_redis_kvstore_contract():
    """Same conformance suite against a real Redis (Lua-atomic
    apply_batch). Skips when no redis package/server is reachable."""
    store = _redis_store()
    if store is None:
        pytest.skip("redis package or server not available")
    _exercise_contract(store)


def test_kafka_order_stream_end_to_end(spark, tmp_path):
    """kafka_order_stream against a real broker: produce the synthetic
    order events through the Kafka sink, consume them through the
    reference pipeline, and check the per-day rollup equals the batch
    computation. Skips when no broker is configured."""
    bootstrap = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("no Kafka broker configured (set SPARK_GRAFT_KAFKA_BOOTSTRAP)")

    from steaminganalysis_spark.streaming.datagen import order_events_batch, to_kafka_json
    from steaminganalysis_spark.streaming.pipeline import (
        day_rollup_delta,
        kafka_order_stream,
    )
    from steaminganalysis_spark.streaming.sinks import day_rollup_sink

    topic = f"sa-orders-{uuid.uuid4().hex[:8]}"
    (
        to_kafka_json(order_events_batch(spark, 200))
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    store_name = f"kafka-{uuid.uuid4().hex[:6]}"
    stream = kafka_order_stream(spark, bootstrap, topic)
    q = day_rollup_sink(
        stream, str(tmp_path / "ckpt"), day_rollup_delta, store_name=store_name
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    store = KVStore.instance(store_name)
    expect = day_rollup_delta(
        to_kafka_json(order_events_batch(spark, 200)).selectExpr("value")
    ).collect()
    for r in expect:
        assert store.hgetall(KEY_PREFIX + r["day"])["total"] == r["total"]


def test_kvstore_instance_resolves_redis_urls_or_raises_cleanly():
    """`KVStore.instance("redis://...")` must route to the Redis
    adapter — constructing it when redis-py is present, raising
    ImportError (not silently falling back to in-process) when not."""
    import pytest

    from steaminganalysis_spark.streaming.sinks import HAVE_REDIS, KVStore

    url = "redis://localhost:1/9"  # nothing listens; construction is lazy
    if HAVE_REDIS:
        store = KVStore.instance(url)
        from steaminganalysis_spark.streaming.sinks import RedisKVStore

        assert isinstance(store, RedisKVStore)
        KVStore.reset(url)
    else:
        with pytest.raises(ImportError):
            KVStore.instance(url)
        KVStore.reset(url)
