"""Invariant + plan-shape tests for the round-2 extras operators.

Exact values are covered by the oracle parity sweep
(tests/test_oracle_parity.py); these pin the semantic invariants and
the plan properties that matter at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from steaminganalysis_spark.plans import (
    assert_no_cartesian,
    count_exchanges,
    physical_plan,
)
from steaminganalysis_spark.registry import collect_queries

QUERIES, _ = collect_queries()
SF = "/root/testdata/sf0.001"


def test_decontaminate_candidates_are_equi_join(spark):
    """The train⋈eval shingle join must be an equi-join on the hash —
    never a nested-loop/cartesian over the corpora."""
    df = QUERIES["q_decontaminate"](spark, SF)
    plan = physical_plan(df)
    assert_no_cartesian(df)
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_flags_are_real_overlaps(spark):
    """Every flagged train doc must actually share a 5-gram with the
    eval split (recomputed in Python on the collected sf0.001 corpus)."""
    rows = QUERIES["q_decontaminate"](spark, SF).collect()
    import hashlib

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    def grams(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 5]) for i in range(len(t) - 4)}

    def is_eval(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()[:2] < "1a"

    eval_grams = set()
    for did, text in docs.items():
        if is_eval(did):
            eval_grams |= grams(text)
    for r in rows:
        assert not is_eval(r.doc_id), "eval doc leaked into the train output"
        shared = grams(docs[r.doc_id]) & eval_grams
        assert len(shared) == r.n_shared


def test_anomaly_zscore_stats_side_broadcasts(spark):
    """The per-type stats join must broadcast: the event stream never
    shuffles for a handful of stats rows."""
    df = QUERIES["q_anomaly_zscore"](spark, SF)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan


def test_rolling_time_single_shuffle(spark):
    """Rolling interval window: exactly one exchange (hash on user_id);
    the frame arithmetic happens inside each partition's sort."""
    assert count_exchanges(QUERIES["q_window_rolling_time"](spark, SF)) == 1


def test_window_ntile_single_shuffle(spark):
    """Both window specs share one o_orderpriority partitioning —
    Catalyst must not add a second exchange."""
    assert count_exchanges(QUERIES["q_window_ntile"](spark, SF)) == 1


def test_quality_repetition_flags_planted_repetitive_doc(spark):
    """A pathologically repetitive document must be flagged; a
    all-distinct-token document must not."""
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [
                "spam ham " * 20 + "spam ham",  # one bigram dominates
                " ".join(f"w{i}" for i in range(40)),  # all distinct
            ],
        }
    )
    tmp = "/tmp/extras_repetition_docs"
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{tmp}/documents.parquet"
    )
    out = {r.doc_id: r for r in QUERIES["q_quality_repetition"](spark, tmp).collect()}
    assert out[1].flagged and out[1].top_bigram_frac > 0.4
    assert not out[2].flagged and out[2].dup_token_frac == 0.0


def test_posexplode_positions_are_dense(spark):
    """Positions per doc are exactly 0..n_tokens-1."""
    df = QUERIES["q_fn_posexplode"](spark, SF)
    chk = df.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.min("pos").alias("lo"),
        F.max("pos").alias("hi"),
        F.countDistinct("pos").alias("nd"),
    )
    bad = chk.filter(
        (F.col("lo") != 0)
        | (F.col("hi") != F.col("n") - 1)
        | (F.col("nd") != F.col("n"))
    )
    assert bad.count() == 0


def test_lateral_join_decorrelates(spark):
    """The LATERAL top-2-per-group must decorrelate into a window/
    group-limit plan — never a per-row nested loop or cartesian."""
    df = QUERIES["q_join_lateral"](spark, SF)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "Window" in plan or "WindowGroupLimit" in plan


def test_grouping_sets_single_scan(spark):
    """GROUPING SETS expands in one pass: exactly one scan of the
    fact table and one aggregate exchange."""
    df = QUERIES["q_agg_grouping_sets"](spark, SF)
    plan = physical_plan(df)
    # node list only — the formatted detail section repeats node names
    assert plan.split("\n\n")[0].count("Scan parquet") == 1
    assert "Expand" in plan
    assert count_exchanges(df) == 1


def test_merge_upsert_actions_partition_output(spark):
    """insert/update/keep counts must sum to the output size, and
    keys must be unique (MERGE semantics: one row per key)."""
    df = QUERIES["q_merge_upsert"](spark, SF)
    total = df.count()
    by_action = {r["action"]: r["n"] for r in
                 df.groupBy("action").agg(F.count("*").alias("n")).collect()}
    assert sum(by_action.values()) == total
    assert df.select("key").distinct().count() == total


def test_interval_overlap_is_grid_equi_join(spark):
    """The interval-overlap join must execute as an equi-join on
    (user_id, cell) — never a theta/nested-loop join over the event
    pairs."""
    df = QUERIES["q_join_interval_overlap"](spark, SF)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sessionize_dynamic_single_shuffle(spark):
    """lag → flag → running-sum → rollup must all share one user_id
    hash partitioning: exactly one exchange end-to-end."""
    assert count_exchanges(QUERIES["q_sessionize_dynamic"](spark, SF)) == 1


def test_gaps_islands_randomized_vs_python(spark):
    """Seeded randomized ground truth for the island trick: 40 users
    with random day subsets of a 60-day range — the longest streak,
    its bounds, and the earliest-on-ties rule must match a direct
    Python computation for every user."""
    import datetime as dt
    import random

    rng = random.Random(20260814)
    base = dt.date(2024, 1, 1)
    users = {}
    for uid in range(40):
        n_days = rng.randint(1, 40)
        users[uid] = sorted(
            rng.sample([base + dt.timedelta(days=i) for i in range(60)], n_days)
        )

    def best_streak(days):
        runs, start, prev = [], days[0], days[0]
        for d in days[1:]:
            if (d - prev).days == 1:
                prev = d
                continue
            runs.append((start, prev))
            start = prev = d
        runs.append((start, prev))
        # longest, earliest start on ties
        return max(runs, key=lambda r: ((r[1] - r[0]).days + 1, -r[0].toordinal()))

    rows = [
        (uid, dt.datetime.combine(d, dt.time(12)))
        for uid, days in users.items()
        for d in days
    ]
    from steaminganalysis_spark.operators.extras import _gaps_islands

    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["user_id"]: (r["streak_start"], r["streak_end"], r["streak_days"])
        for r in _gaps_islands(df).collect()
    }
    assert set(got) == set(users)
    for uid, days_list in users.items():
        s, e = best_streak(days_list)
        expect = (s.strftime("%Y-%m-%d"), e.strftime("%Y-%m-%d"), (e - s).days + 1)
        assert got[uid] == expect, uid


def test_attribution_tie_stress_vs_python(spark):
    """Tie-stress ground truth for both attribution models: random
    events drawn from only FIVE distinct timestamps force constant ts
    ties, so the (ts, event_id) tie-break — which the tie-free fixture
    never exercises — decides most attributions. Both models must
    match a direct Python computation of the same rule."""
    import random
    from collections import defaultdict

    from steaminganalysis_spark.operators.extras import _attribution

    rng = random.Random(20260815)
    ts_pool = [f"2024-01-01 00:0{i}:00" for i in range(5)]
    rows = []
    for eid in range(400):
        rows.append(
            (
                rng.randrange(12),                      # user_id
                ts_pool[rng.randrange(5)],              # ts (heavy ties)
                eid,                                    # unique event_id
                round(rng.uniform(0, 50), 2),           # value
                rng.choice(["purchase", "click", "view"]),
                rng.randrange(20) if rng.random() < 0.9 else None,  # k
            )
        )
    df = (
        spark.createDataFrame(
            rows, "user_id long, ts string, event_id long, value double, "
                  "event_type string, k long"
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .filter(F.col("event_type").isin("purchase", "click"))
    )

    def python_model(first_touch):
        per_user = defaultdict(list)
        for u, ts, eid, v, et, k in rows:
            if et in ("purchase", "click"):
                per_user[u].append((ts, eid, v, et, k))
        agg = defaultdict(lambda: [0, 0])
        for u, evs in per_user.items():
            evs.sort(key=lambda e: (e[0], e[1]))  # ts, event_id
            for i, (ts, eid, v, et, k) in enumerate(evs):
                if et != "purchase":
                    continue
                marks = [
                    e[4] % 5
                    for e in evs[:i]
                    if e[3] == "click" and e[4] is not None
                ]
                camp = (
                    "organic"
                    if not marks
                    else str(marks[0] if first_touch else marks[-1])
                )
                cents = int(v * 100.0 + 0.5)  # to_cents on two-decimal values
                agg[camp][0] += 1
                agg[camp][1] += cents
        return {c: (n, cents) for c, (n, cents) in agg.items()}

    for first in (False, True):
        got = {
            r["campaign"]: (r["n_purchases"], r["attributed_cents"])
            for r in _attribution(df, first_touch=first).collect()
        }
        assert got == python_model(first), f"first_touch={first}"


def test_decontaminate_fuzzy_matches_string_level_brute_force(spark):
    """String-level reconstruction of q_decontaminate_fuzzy in plain
    Python (no xxhash64 anywhere — certifies the 8-byte-hash join
    counts exactly like the shingle strings, i.e. collision-free on
    the fixture), same md5-prefix split, same integer containment;
    plus the separation property the 50% bar relies on: every emitted
    pair is ≥ 50% and the flagged set is non-empty."""
    import hashlib

    from steaminganalysis_spark.operators.extras import (
        DECON_FUZZY_PPM,
        _EVAL_PREFIX,
    )

    df = QUERIES["q_decontaminate_fuzzy"](spark, SF)
    assert_no_cartesian(df)
    rows = df.collect()
    assert rows, "the 50% bar must flag the planted near-dups"
    for r in rows:
        assert r.containment_ppm >= DECON_FUZZY_PPM
        assert r.containment_ppm == r.shared * 1_000_000 // r.eval_ngrams

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    def shingles(text):
        t = text.split(" ")
        return {" ".join(t[i : i + 5]) for i in range(len(t) - 4)}
    is_eval = lambda d: hashlib.md5(str(d).encode()).hexdigest()[:2] < _EVAL_PREFIX
    ev = {r.doc_id: shingles(r.text) for r in docs if is_eval(r.doc_id)}
    tr = {r.doc_id: shingles(r.text) for r in docs if not is_eval(r.doc_id)}
    expected = set()
    for td, ts in tr.items():
        for ed, es in ev.items():
            if not es:
                continue
            shared = len(ts & es)
            if shared * 1_000_000 // len(es) >= DECON_FUZZY_PPM:
                expected.add((td, ed, shared, len(es)))
    assert {
        (r.train_doc, r.eval_doc, r.shared, r.eval_ngrams) for r in rows
    } == expected


def test_deletion_vector_semantics_bitmap_exactness_and_plan(spark):
    """q_merge_deletion_vector: (a) semantics — visible keys are
    exactly customers minus error-event users; (b) bitmap exactness —
    the DV words' total popcount equals the delete count (no stray
    bits) and the word count is within [deletes/32, deletes] (real
    packing, not one word per delete... unless positions are sparse);
    (c) plan — the masked read applies the DV via a BROADCAST join
    (merge-on-read: the data path is never hash-exchanged; the only
    hash exchanges in the plan belong to the delete-side semi-join +
    word aggregate and the simulated-write window, which is staged out
    of the read plan)."""
    from steaminganalysis_spark.operators.extras import DV_WORD_BITS

    df = QUERIES["q_merge_deletion_vector"](spark, SF)
    visible = {r.key for r in df.collect()}
    cust = {
        r.c_custkey
        for r in spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey").collect()
    }
    dels = {
        r.user_id
        for r in spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("event_type") == "error")
        .select("user_id")
        .distinct()
        .collect()
    } & cust
    assert dels, "no deletions at fixture SF — vacuous"
    assert visible == cust - dels

    # rebuild the DV words with the operator's own expressions and
    # check bit-exactness
    from steaminganalysis_spark.operators.extras import DV_FILES

    from pyspark.sql import Window as W

    c = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey")
    wpos = W.partitionBy(F.col("c_custkey") % DV_FILES).orderBy("c_custkey")
    target = c.select(
        F.col("c_custkey").alias("key"),
        (F.col("c_custkey") % DV_FILES).alias("file_id"),
        (F.row_number().over(wpos) - 1).alias("pos"),
    )
    ddf = spark.createDataFrame([(k,) for k in sorted(dels)], "key long")
    words = (
        target.join(ddf, "key", "semi")
        .groupBy("file_id", F.expr(f"pos DIV {DV_WORD_BITS}").alias("word_idx"))
        .agg(
            F.bit_or(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {DV_WORD_BITS} AS INT))"
                )
            ).alias("word")
        )
        .collect()
    )
    popcount = sum(bin(r.word & ((1 << 64) - 1)).count("1") for r in words)
    assert popcount == len(dels)
    assert len(dels) / DV_WORD_BITS <= len(words) <= len(dels)

    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert_no_cartesian(df)
    # data-path purity: no hash exchange keyed on the target's columns
    # downstream of the staged scan — the only hashpartitioning
    # exchanges are the DV build's
    assert plan.count("Exchange hashpartitioning") <= 2, plan
