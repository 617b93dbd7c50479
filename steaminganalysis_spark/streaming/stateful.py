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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["running_user_totals"]

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


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, spend, last = state.get if state.exists else (0, 0, "")
    for pdf in pdfs:
        n += len(pdf)
        is_purchase = pdf["event_type"] == "purchase"
        spend += int(round(pdf.loc[is_purchase, "value"].sum() * 100))
        if len(pdf):
            last = max(last, str(pdf["ts"].max()))
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
