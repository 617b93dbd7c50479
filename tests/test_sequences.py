"""Semantic and plan pins for operators/sequences.py — the oracle-parity
sweep proves value parity; these pin the properties parity can't see:
journey ordering against an independent Python recompute, internal
consistency of the changepoint frames, and the shuffle budget."""

from __future__ import annotations

import re

import pandas as pd

from steaminganalysis_spark.operators.sequences import _FUNNEL, _N_BEFORE
from steaminganalysis_spark.plans import count_exchanges
from steaminganalysis_spark.registry import collect_queries

QUERIES, _ = collect_queries()
SF = "/root/testdata/sf0.001"

_CODE_MAP = {"view": "v", "click": "c", "signup": "s", "purchase": "p"}


def test_seq_pattern_matches_python_recompute(spark):
    """Journey construction (ts, event_id ordering) and the regex count
    must agree with a row-at-a-time Python recompute from the parquet."""
    out = {
        (r.user_id, r.day): r
        for r in QUERIES["q_seq_pattern"](spark, SF).collect()
    }
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    ev["code"] = ev["event_type"].map(lambda t: _CODE_MAP.get(t, "e"))
    pat = re.compile(_FUNNEL)
    for (uid, day), g in ev.sort_values(["ts", "event_id"]).groupby(
        ["user_id", "day"]
    ):
        journey = "".join(g["code"])
        row = out.pop((uid, day))
        assert row.journey_len == len(journey)
        assert row.n_conversions == len(pat.findall(journey)), (uid, day, journey)
        assert row.converted == (row.n_conversions > 0)
    assert not out  # Spark emitted no extra groups


def test_seq_pattern_single_shuffle(spark):
    """One groupBy on (user, day) is the whole distributed cost — the
    regex scan is a map-side expression over the aggregated string."""
    assert count_exchanges(QUERIES["q_seq_pattern"](spark, SF)) == 1


def test_ts_changepoint_internal_consistency(spark):
    """delta/is_shift are pure functions of the emitted frame sums, and
    partial-frame edge buckets never leak into the output."""
    rows = QUERIES["q_ts_changepoint"](spark, SF).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert r.delta_cents == r.after_cents - r.before_cents
        assert r.is_shift == (abs(r.delta_cents) * 2 >= abs(r.before_cents))
        by_type.setdefault(r.event_type, []).append(r.hour)
    # the first _N_BEFORE hours of every series lack a full trailing
    # frame: recompute each type's hourly spine and check exclusion
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["hour"] = ev["ts"].dt.strftime("%Y-%m-%d %H:00")
    for etype, hours in by_type.items():
        spine = sorted(ev.loc[ev["event_type"] == etype, "hour"].unique())
        assert set(hours).isdisjoint(spine[:_N_BEFORE])
        assert min(hours) == spine[_N_BEFORE]
