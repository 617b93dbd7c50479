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


def test_ts_decayed_sum_matches_python_recompute(spark):
    """The window-fold decayed sum must equal a row-at-a-time Python
    recompute of Σ cents[t-d]·2^(15-d) over each user's (ts, event_id)
    ordered stream — and stay within one shuffle (user_id)."""
    from steaminganalysis_spark.operators.sequences import _DECAY_FRAME

    df = QUERIES["q_ts_decayed_sum"](spark, SF)
    assert count_exchanges(df) == 1
    got = {r.event_id: r.decayed_scaled for r in df.collect()}

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["cents"] = (ev["value"].astype(float) * 100.0 + 0.5).apply(
        lambda x: int(x // 1)
    )
    expect = {}
    for _, g in ev.sort_values(["ts", "event_id"]).groupby("user_id"):
        hist = []
        for _, row in g.iterrows():
            hist.append(int(row["cents"]))
            frame = hist[-_DECAY_FRAME:]
            expect[row["event_id"]] = sum(
                c * (1 << (_DECAY_FRAME - 1 - d))
                for d, c in enumerate(reversed(frame))
            )
    assert got == expect


def test_ts_decayed_sum_null_values_keep_frame_slots(spark, tmp_path):
    """NULL `value` rows must contribute 0 but still OCCUPY a frame
    position (ADVICE r6): collect_list silently drops NULLs, which
    would shift every later element's weight by one halving, while the
    oracle's banded rn self-join keeps the slot (SUM ignores the NULL
    product). Pin full engine parity on a synthesized NULL-bearing
    events fixture — the shipped fixtures have no NULL values, so this
    is the only place the coalesce-before-collect_list fix is load-
    bearing."""
    import os

    import duckdb

    fixture = tmp_path / "sfnull"
    fixture.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        os.symlink(f"{SF}/{t}.parquet", fixture / f"{t}.parquet")
    # 2 users × 8 events, NULLs interleaved mid-stream so dropped slots
    # would visibly reshuffle the weights of later events
    rows = []
    for uid in (1, 2):
        for i in range(8):
            val = None if (i + uid) % 3 == 0 else float(10 * uid + i) + 0.25
            rows.append(
                {
                    "event_id": uid * 100 + i,
                    "ts": pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                    "user_id": uid,
                    "event_type": "view",
                    "value": val,
                    "props": "{}",
                }
            )
    pd.DataFrame(rows).to_parquet(fixture / "events.parquet")
    from tests.oracle_harness import compare_query

    _, ORACLE = collect_queries()
    problems = compare_query(
        spark, "q_ts_decayed_sum", str(fixture), QUERIES, ORACLE
    )
    assert not problems, problems
    # and the Python recompute with NULL→0 slot-keeping agrees
    from steaminganalysis_spark.operators.sequences import _DECAY_FRAME

    got = {
        r.event_id: r.decayed_scaled
        for r in QUERIES["q_ts_decayed_sum"](spark, str(fixture)).collect()
    }
    for uid in (1, 2):
        hist = []
        for i in range(8):
            val = None if (i + uid) % 3 == 0 else float(10 * uid + i) + 0.25
            hist.append(0 if val is None else int(val * 100.0 + 0.5))
            frame = hist[-_DECAY_FRAME:]
            expect = sum(
                c * (1 << (_DECAY_FRAME - 1 - d))
                for d, c in enumerate(reversed(frame))
            )
            assert got[uid * 100 + i] == expect, (uid, i)


def test_ts_gapfill_grid_complete_and_interpolation_bounded(spark):
    """Every type's grid is dense from min to max observed hour; known
    buckets pass through unchanged (flag False); interpolated buckets
    lie between their neighboring observed values (linearity implies
    betweenness) and are flagged."""
    rows = QUERIES["q_ts_gapfill_interpolate"](spark, SF).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    ev = pd.read_parquet(f"{SF}/events.parquet")
    # unit-proof epoch hour: parquet NANOS may land as datetime64[us]
    ev["h"] = ev["ts"].map(lambda t: int(t.timestamp()) // 3600)
    ev["cents"] = (ev["value"].astype(float) * 100.0 + 0.5).apply(
        lambda x: int(x // 1)
    )
    known = ev.groupby(["event_type", "h"])["cents"].sum()
    for t, rs in by_type.items():
        hs = sorted(r.h for r in rs)
        assert hs == list(range(hs[0], hs[-1] + 1)), t  # dense grid
        series = {r.h: r for r in rs}
        obs = sorted(h for (tt, h) in known.index if tt == t)
        assert hs[0] == obs[0] and hs[-1] == obs[-1]
        for r in rs:
            if (t, r.h) in known.index:
                assert not r.interpolated
                assert r.cents == known[(t, r.h)]
            else:
                assert r.interpolated
                prev_h = max(h for h in obs if h < r.h)
                next_h = min(h for h in obs if h > r.h)
                lo = min(known[(t, prev_h)], known[(t, next_h)])
                hi = max(known[(t, prev_h)], known[(t, next_h)])
                assert lo <= r.cents <= hi, (t, r.h, r.cents, lo, hi)
        assert any(r.interpolated for r in rs) or len(obs) == len(hs)
