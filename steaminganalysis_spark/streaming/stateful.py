"""Arbitrary stateful streaming (SURVEY.md §2 B.8 stretch):
``applyInPandasWithState`` — the PySpark equivalent of
flatMapGroupsWithState, for operators the built-in window/dedup state
machines can't express.

Example operator: per-user running profile — cumulative event count,
cumulative purchase spend (exact cents), and last-seen event time —
emitted as an update on every micro-batch in which the user appears.
State per key is three scalars (bounded; no growth with event volume),
partitioned by user_id: the state store shards across executors and
survives restarts via the checkpoint — this is the general pattern for
custom accumulate-forever operators at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["running_user_totals", "session_tracker"]

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("spend_cents", T.LongType()),
        T.StructField("last_seen", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("spend_cents", T.LongType()),
        T.StructField("last_seen", T.StringType()),
    ]
)


def _purchase_cents(pdf: pd.DataFrame) -> int:
    """Per-ROW floor(v*100+0.5) — the engine's to_cents convention.
    Never round a batch-level float sum: its error compounds once per
    micro-batch and banker's rounding diverges from the SQL twin on
    exact .5 boundaries."""
    v = pdf.loc[pdf["event_type"] == "purchase", "value"].to_numpy()
    return int(np.floor(v * 100.0 + 0.5).sum()) if len(v) else 0


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, spend, last = state.get if state.exists else (0, 0, "")
    for pdf in pdfs:
        n += len(pdf)
        spend += _purchase_cents(pdf)
        if len(pdf):
            # explicit 6-digit fraction: str(Timestamp) drops ".000000"
            # when micros are exactly zero, which would diverge from the
            # SQL twin's fixed-width strftime on that (rare) row
            last = max(last, pdf["ts"].max().strftime("%Y-%m-%d %H:%M:%S.%f"))
    state.update((n, spend, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "spend_cents": [spend],
            "last_seen": [last],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Attach the stateful per-user profile operator to a (streaming)
    events frame. One shuffle on user_id per micro-batch; state lives in
    the executor state stores, checkpoint-backed."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ----------------------- session tracker with state TIMEOUT (eviction)

_SESS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("first_ts", T.StringType()),
        T.StructField("last_ts", T.StringType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_SESS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("first_ts", T.StringType()),
        T.StructField("last_ts", T.StringType()),
    ]
)

_SESSION_TIMEOUT_MS = 2_000


def _session_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # gap elapsed with no new events: EMIT the closed session and
        # evict state — this is how custom operators keep state bounded
        n, first, last = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "first_ts": [first],
                "last_ts": [last],
                "closed": [True],
            }
        )
        return
    n, first, last = state.get if state.exists else (0, "", "")
    for pdf in pdfs:
        if len(pdf):
            n += len(pdf)
            lo, hi = str(pdf["ts"].min()), str(pdf["ts"].max())
            first = lo if not first else min(first, lo)
            last = max(last, hi)
    state.update((n, first, last))
    state.setTimeoutDuration(_SESSION_TIMEOUT_MS)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "first_ts": [first],
            "last_ts": [last],
            "closed": [False],
        }
    )


def session_tracker(events: DataFrame) -> DataFrame:
    """Custom stateful SESSION operator with processing-time timeout:
    while a user keeps arriving, their open session updates; after
    ``_SESSION_TIMEOUT_MS`` of silence the state times out, the closed
    session is emitted once, and the state-store entry is REMOVED.
    Bounded state (one open session per active user) is the property
    that keeps arbitrary stateful ops viable at 100 TB — contrast with
    the accumulate-forever profile above, whose state is bounded only
    because its per-key payload is three scalars."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_update,
        outputStructType=_SESS_OUTPUT,
        stateStructType=_SESS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ------------- transformWithStateInPandas (Spark 4 successor API)

from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class RunningTotalsProcessor(StatefulProcessor):
    """`StatefulProcessor` twin of `running_user_totals` on the
    transformWithStateInPandas API (Spark 4's successor to
    applyInPandasWithState): typed ValueState instead of a packed
    tuple, explicit init/close lifecycle, and the same bounded
    three-scalar per-user state. A module-level subclass — the
    processor is pickled to the stateful worker by reference."""

    def init(self, handle) -> None:
        self._state = handle.getValueState(
            "totals",
            "n_events long, spend_cents long, last_seen string",
        )

    def handleInputRows(self, key, rows, timerValues):
        n, spend, last = (
            self._state.get() if self._state.exists() else (0, 0, "")
        )
        for pdf in rows:
            n += len(pdf)
            spend += _purchase_cents(pdf)
            if len(pdf):
                last = max(last, str(pdf["ts"].max()))
        self._state.update((n, spend, last))
        import pandas as _pd

        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "spend_cents": [spend],
                "last_seen": [last],
            }
        )

    def close(self) -> None:
        pass


def have_tws_protocol() -> tuple[bool, str]:
    """Probe the exact runtime dependency of transformWithStateInPandas:
    the TWS worker protocol serializes state over protobuf, so the
    operator needs ``google.protobuf`` importable on the driver AND
    workers. Returns (available, reason) — the batch-equivalence test
    skips with this reason, and flips to a real run automatically in
    any environment where the probe passes (VERDICT r3 order #7)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True, ""
    except ImportError:
        return False, "google.protobuf not installed (TWS worker protocol)"


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """`running_user_totals` on the new API. Requires the RocksDB state
    store provider (transformWithState's backing store) and the
    ``protobuf`` package (the TWS worker protocol) — absent in this
    container, so the batch-equivalence test skip-guards on
    ``have_tws_protocol``; the applyInPandasWithState twin above is the
    fully-executed path here. Fail-fast: raising at plan-build time
    with the missing dep beats the opaque worker crash the bare
    operator produces."""
    ok, reason = have_tws_protocol()
    if not ok:
        raise ImportError(f"running_user_totals_tws: {reason}")
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType=_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
