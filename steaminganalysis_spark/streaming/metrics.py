"""Streaming observability: a StreamingQueryListener that collects
per-batch progress (rows, duration, per-source offsets) — the ops
surface the reference entirely lacked (its only telemetry was a
``println("saved at <ts>")`` per partition flush,
StreamingAnalysisAppWithKafkaManageOffset.scala:76).

At fleet scale these metrics feed lag/SLA alerting: input rows per
trigger vs processing time is the backpressure signal; watermark
progress is the late-data signal. Here they're collected in-process
and asserted in tests; a deployment would forward `onQueryProgress`
payloads to the metrics bus."""

from __future__ import annotations

import threading

from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["BatchMetricsListener"]


class BatchMetricsListener(StreamingQueryListener):
    """Collects one record per completed micro-batch:
    (query_id, batch_id, num_input_rows, duration_ms, watermark)."""

    def __init__(self) -> None:
        self._mu = threading.Lock()
        self.batches: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    # -- listener callbacks (called from the JVM listener bus thread)
    def onQueryStarted(self, event) -> None:
        with self._mu:
            self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._mu:
            self.batches.append(
                {
                    "query_id": str(p.id),
                    "batch_id": p.batchId,
                    "num_input_rows": p.numInputRows,
                    "duration_ms": (p.durationMs or {}).get("triggerExecution"),
                    "watermark": p.eventTime.get("watermark")
                    if p.eventTime
                    else None,
                }
            )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        with self._mu:
            self.terminated.append(str(event.id))

    # -- accessors
    def total_rows(self, query_id: str | None = None) -> int:
        with self._mu:
            return sum(
                b["num_input_rows"]
                for b in self.batches
                if query_id is None or b["query_id"] == query_id
            )
