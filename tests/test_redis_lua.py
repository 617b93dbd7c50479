"""Execute the production Redis Lua apply-batch script (VERDICT r3
order #4): ``_APPLY_BATCH_LUA`` — previously reviewed-only because no
redis/fakeredis/lupa exists here — runs through the
``tests.lua_redis_sim`` interpreter against an emulated keyspace, with
the same assertions the in-process Python twin passes
(test_streaming.py::test_idempotent_sink_skips_replayed_batch) plus a
twin-equivalence sweep. If the script drifts (a typo in HINCRBY
marshalling, an off-by-one in the ARGV stride, a broken marker
compare) these fail."""

from __future__ import annotations

import uuid

from steaminganalysis_spark.streaming.pipeline import (
    classify_orders,
    day_rollup_delta,
    parse_order_json,
)
from steaminganalysis_spark.streaming.datagen import (
    order_events_batch,
    to_kafka_json,
)
from steaminganalysis_spark.streaming.sinks import (
    KEY_PREFIX,
    KVStore,
    apply_day_rollup_batch,
)
from tests.lua_redis_sim import LuaKVStore

MARKER = "sa-spark-last-applied-batch:test"


def test_lua_apply_batch_applies_and_advances_marker():
    s = LuaKVStore()
    inc = [("d1", "total", 3), ("d1", "fee_cents", 250), ("d2", "total", 1)]
    assert s.apply_batch(0, inc, MARKER) is True  # fresh store: marker GET → false → -1
    assert s.hgetall("d1") == {"total": 3, "fee_cents": 250}
    assert s.hgetall("d2") == {"total": 1}
    assert s.last_applied(MARKER) == 0


def test_lua_apply_batch_skips_replay_and_lower_ids():
    s = LuaKVStore()
    inc = [("d1", "total", 5)]
    assert s.apply_batch(4, inc, MARKER) is True
    # crash-replay of the SAME batch id: whole batch skipped, no
    # double-count (the exactly-once property the script exists for)
    assert s.apply_batch(4, inc, MARKER) is False
    assert s.apply_batch(3, inc, MARKER) is False  # stale id too
    assert s.hgetall("d1") == {"total": 5}
    assert s.last_applied(MARKER) == 4
    # the next id accumulates on top
    assert s.apply_batch(5, inc, MARKER) is True
    assert s.hgetall("d1") == {"total": 10}


def test_lua_apply_batch_empty_increments_still_advances():
    """An empty micro-batch must still advance the watermark, else its
    id replays forever."""
    s = LuaKVStore()
    assert s.apply_batch(2, [], MARKER) is True
    assert s.last_applied(MARKER) == 2
    assert s.keys() == []


def test_lua_negative_deltas_and_multi_field():
    s = LuaKVStore()
    s.apply_batch(0, [("d", "x", -7), ("d", "x", 3), ("d", "y", 2)], MARKER)
    assert s.hgetall("d") == {"x": -4, "y": 2}


def test_lua_script_equals_python_twin_on_random_sequence():
    """Twin equivalence: an arbitrary interleaving of applies, replays
    and stale ids leaves the Lua-backed store and the in-process Python
    store in identical final states (hashes AND marker)."""
    import random

    rng = random.Random(42)
    lua, py = LuaKVStore(), KVStore()
    for _ in range(60):
        bid = rng.randint(0, 12)
        inc = [
            (f"day-{rng.randint(0, 3)}", f, rng.randint(-5, 20))
            for f in ("total", "success", "fee_cents")
        ]
        assert lua.apply_batch(bid, inc, MARKER) == py.apply_batch(bid, inc, MARKER)
    assert {k: lua.hgetall(k) for k in sorted(lua.keys())} == {
        k: py.hgetall(k) for k in sorted(py.keys())
    }
    assert lua.last_applied(MARKER) == py.last_applied(MARKER)


def test_lua_store_through_foreachbatch_body(spark):
    """End-to-end through the real sink body: register a LuaKVStore
    under a store name and drive ``apply_day_rollup_batch`` (the
    foreachBatch body) — replay skipped, new batch accumulates, exactly
    as the Python-twin test asserts."""
    store_name = f"lua-replay-{uuid.uuid4().hex[:6]}"
    with KVStore._lock:
        KVStore._instances[store_name] = LuaKVStore()  # type: ignore[assignment]
    try:
        df = classify_orders(
            parse_order_json(to_kafka_json(order_events_batch(spark, 50)))
        )
        apply_day_rollup_batch(df, batch_id=7, agg_fn=day_rollup_delta, store_name=store_name)
        store = KVStore.instance(store_name)
        before = {k: store.hgetall(k) for k in store.keys()}
        assert before, "first apply wrote nothing"
        assert all(k.startswith(KEY_PREFIX) for k in before)
        apply_day_rollup_batch(df, batch_id=7, agg_fn=day_rollup_delta, store_name=store_name)
        assert {k: store.hgetall(k) for k in store.keys()} == before
        apply_day_rollup_batch(df, batch_id=8, agg_fn=day_rollup_delta, store_name=store_name)
        doubled = {k: store.hgetall(k) for k in store.keys()}
        for k, h in before.items():
            assert doubled[k]["total"] == 2 * h["total"]
    finally:
        KVStore.reset(store_name)


def test_lua_runner_rejects_unsupported_constructs():
    """The interpreter is deliberately partial: growth of the script
    past the supported subset must fail loudly, not silently no-op."""
    import pytest

    from tests.lua_redis_sim import LuaScriptRunner

    with pytest.raises(NotImplementedError):
        LuaScriptRunner().eval("redis.call('DEL', KEYS[1])", ["k"], [])


def test_lua_eval_truncates_fractional_number_replies():
    """Redis truncates ANY Lua number to an integer in the EVAL reply.
    Both execution paths — the in-process runner and the miniredis
    RESP wire — must agree, or a script returning a fractional value
    would diverge between LuaKVStore and RedisKVStore deployments."""
    from tests.lua_redis_sim import LuaScriptRunner

    assert LuaScriptRunner().eval("return tonumber(ARGV[1])", [], ["7.9"]) == 7
    from steaminganalysis_spark.backends.miniredis import MiniRedisServer
    from steaminganalysis_spark.streaming.sinks import KVStore

    with MiniRedisServer() as srv:
        store = KVStore.instance(srv.url)
        try:
            assert store._r.execute_command(
                "EVAL", "return tonumber(ARGV[1])", "0", "7.9"
            ) == 7
        finally:
            KVStore.reset(srv.url)
