"""applyInPandasWithState operator + sketch tolerance tests."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from steaminganalysis_spark.registry import collect_queries
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.sources.registry import events_stream
from steaminganalysis_spark.streaming.stateful import running_user_totals
from tests.conftest import SF_DIR_CORRECTNESS

QUERIES, _ = collect_queries()


def test_stateful_running_user_totals_matches_batch(spark):
    """The custom stateful operator's final state equals the batch
    aggregate (stream-batch equivalence for arbitrary state)."""
    sf_dir = "/root/testdata/sf0.001"
    name = f"stateful_{uuid.uuid4().hex[:6]}"
    out = running_user_totals(events_stream(spark, sf_dir))
    q = out.writeStream.outputMode("update").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode may emit a user several times (once per batch it
    # appears in); the LAST emission per user is the final state
    got = {
        r.user_id: (r.n_events, r.spend_cents)
        for r in spark.table(name).collect()  # memory sink preserves batch order
    }
    expected = {
        r.user_id: (r.n, r.cents)
        for r in load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    (F.col("value").cast("decimal(18,2)") * 100).cast("long"),
                ).otherwise(0)
            ).alias("cents"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for uid, (n, cents) in expected.items():
        assert got[uid] == (n, cents), uid


def test_approx_percentile_tolerance(spark):
    approx = {
        r.l_returnflag: (r.median_qty, r.p90_price)
        for r in QUERIES["q_agg_approx_percentile"](spark, SF_DIR_CORRECTNESS).collect()
    }
    exact = {
        r.l_returnflag: (r.median_qty, r.p90_price)
        for r in QUERIES["q_agg_percentile"](spark, SF_DIR_CORRECTNESS).collect()
    }
    for k, (m, p90) in exact.items():
        am, ap90 = approx[k]
        assert abs(am - m) <= 0.02 * max(abs(m), 1), (k, am, m)
        assert abs(ap90 - p90) <= 0.02 * max(abs(p90), 1), (k, ap90, p90)
