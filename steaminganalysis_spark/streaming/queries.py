"""Windowed event-time operators (SURVEY.md §2 B.8) registered in the
driver contract.

``q_stream_tumbling_daily`` genuinely executes as a streaming query
(file source → stateful event-time window agg → memory sink) and is
still oracle-checked: its answer must equal the batch answer over the
same data — the stream-batch equivalence argument.

Tumbling/sliding/session windows also run in batch mode (same
``window``/``session_window`` expressions), each with an exact SQL
oracle (sliding = union of the two shifted 3h grids; session = classic
gaps-and-islands).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from steaminganalysis_spark.operators.extras import DECON_FUZZY_ORACLE
from steaminganalysis_spark.registry import SQL_DSUM, dsum, query
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.sources.registry import events_stream

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "q_stream_tumbling_daily",
    oracle=f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS total,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS success,
           {SQL_DSUM("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS fee
    FROM events
    GROUP BY 1
    """,
)
def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling event-time window (1 day), run to completion
    over the events parquet via the file source and a memory sink in
    complete mode — then compared against the plain batch SQL. No
    watermark: accumulate-forever semantics, matching the reference's
    Redis accumulators (SURVEY.md §2 late-data note)."""
    name = f"stream_daily_{uuid.uuid4().hex[:8]}"
    stream = events_stream(spark, sf_dir)
    agg = stream.groupBy(F.window("ts", "1 day").alias("w")).agg(
        F.count("*").alias("total"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("success"),
        dsum(
            F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)
        ).alias("fee"),
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
        "total",
        "success",
        "fee",
    )


@query(
    "q_window_sliding",
    oracle=f"""
    WITH grids AS (
      SELECT time_bucket(INTERVAL 3 HOURS, ts) AS w_start, event_type, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 3 HOURS, ts) - INTERVAL 3 HOURS AS w_start, event_type, value
      FROM events
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS total,
           {SQL_DSUM("value")} AS total_value
    FROM grids
    GROUP BY w_start
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time window (6h length, 3h slide) in batch mode:
    each event lands in exactly two windows. Oracle = union of the two
    shifted 3h-grid assignments."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(F.count("*").alias("total"), dsum(F.col("value")).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), _TS_FMT).alias("window_start"),
            "total",
            "total_value",
        )
    )


@query(
    "q_session_window",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTES
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTES, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events,
           {SQL_DSUM("value")} AS session_value
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute gap) per user via the native
    ``session_window`` expression — state per key is one open session,
    merged on overlap; the oracle is the equivalent gaps-and-islands
    SQL. Session end = last event + gap (Spark's definition)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), dsum(F.col("value")).alias("session_value"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), _TS_FMT).alias("session_start"),
            F.date_format(F.col("w.end"), _TS_FMT).alias("session_end"),
            "n_events",
            "session_value",
        )
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT user_id, COUNT(*) AS n
    FROM (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
      FROM events
    ) WHERE rn = 1
    GROUP BY user_id
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on the event key (the reference carries
    a unique orderId but never dedups — SURVEY.md §4.3): file-sourced
    stream, dropDuplicates("event_id"), count per user, memory sink.
    event_id is unique in the fixture so the oracle reduces to a plain
    count; the replayed-duplicate case is exercised in tests."""
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.dropDuplicates(["event_id"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT p.event_id AS p_id, c.event_id AS c_id
    FROM events p
    JOIN events c
      ON c.user_id = p.user_id
     AND c.ts < p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
      AND c.event_type = 'click'
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INNER join, genuinely streamed: purchases ⋈ prior
    clicks within 1h per user, watermarks on both sides so join state
    is evicted once event time passes the tolerance (bounded state at
    any scale — without the watermarks Spark would buffer both streams
    forever). Run to completion over the events parquet via the file
    source + append-mode memory sink; the oracle is the equivalent
    batch time-range join, i.e. stream-batch equivalence."""
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    ev = events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    cond = (
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts < purchases.p_ts)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
    )
    joined = purchases.join(clicks, cond).select("p_id", "c_id")
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query("q_datagen")
def datagen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic order-event generator (reference Producer:37-57 /
    MockData:22-43 field distributions: userId∈[0,1000), courseId∈
    [0,500), fee∈[0,500), flag∈{0,1}, UUID orderId, wall-clock-shaped
    time string) as a distributed, seeded `spark.range` expression —
    no driver-side loop, so it scales to any row count. Rows-only:
    randomness is not SQL-oracle-expressible; schema + domain invariants
    are pinned by test_datagen_matches_reference_schema."""
    from steaminganalysis_spark.streaming.datagen import order_events_batch

    return order_events_batch(spark, n=1000)


def _shll_oracle() -> str:
    from steaminganalysis_spark.operators.aggregates import (
        HLLP_M,
        _hllp_estimate_sql,
        _hllp_hash_sql,
        _hllp_rank_sql,
    )

    return f"""
    WITH hh AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             {_hllp_hash_sql("xor({a}, {b})", '//')} AS h
      FROM events
    ),
    regs AS MATERIALIZED (
      SELECT day, h % {HLLP_M} AS j,
             MAX({_hllp_rank_sql('//')}) AS r
      FROM hh GROUP BY 1, 2
    ),
    est AS (
      SELECT s.day, {_hllp_estimate_sql('s')} AS hll_est_milli
      FROM regs s GROUP BY s.day
    ),
    ex AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT e.day, ex.exact_distinct, e.hll_est_milli
    FROM est e JOIN ex ON ex.day = e.day
    ORDER BY e.day
    """


@query("q_stream_hll_daily", oracle=_shll_oracle())
def stream_hll_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-users-per-day with the streaming STATE being
    the portable HLL register lattice — the q_agg_hll_portable
    discipline applied to streaming state (VERDICT r12 order #7),
    converting this key from rows-only (its previous DataSketches
    ``hll_sketch_agg`` state was engine-internal bytes) to
    ORACLE-EXACT: the stateful aggregate is ``groupBy(day, register
    j) MAX(rank)`` over the shared lowbias32 hash, so the state store
    holds ≤ m = 256 slim integer rows per day — bounded regardless of
    input volume, exactly what the sketch buffer held, but in rows
    both engines can state — and the register-MAX lattice makes
    micro-batch accumulation order-invariant (stream≡batch,
    pinned). The estimate (αm²/Σ2^-r with the linear-counting
    literal table) is folded batch-side from the final register
    relation with the SAME portable SQL the oracle runs, so the
    driver hash-checks the streamed ESTIMATE itself; the exact
    per-day COUNT(DISTINCT) rides along as the accuracy witness.

    Scale shape: streaming state is (days × 256) integer rows total —
    KBs for years of days — versus unbounded per-key user sets for
    exact streaming COUNT(DISTINCT); the MAX merge is associative so
    map-side partial combine does real work every batch, and the
    update-mode aggregate shuffles only register-grain deltas.
    Stream-registers≡batch-registers equivalence pinned in
    tests/test_streaming.py::test_stream_hll_daily_equals_batch."""
    from steaminganalysis_spark.operators.aggregates import (
        HLLP_M,
        _hllp_estimate_sql,
        _hllp_hash_sql,
        _hllp_rank_sql,
    )

    name = f"hll_daily_{uuid.uuid4().hex[:8]}"
    stream = events_stream(spark, sf_dir)
    regs = (
        stream.selectExpr(
            "date_format(ts, 'yyyy-MM-dd') AS day",
            f"{_hllp_hash_sql('({a} ^ {b})', 'DIV')} AS h",
        )
        .selectExpr(
            "day",
            f"h % {HLLP_M} AS j",
            f"{_hllp_rank_sql('DIV')} AS r",
        )
        .groupBy("day", "j")
        .agg(F.max("r").alias("r"))
    )
    q = (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        if q.exception():
            raise RuntimeError(str(q.exception()))
    finally:
        q.stop()
    est = (
        spark.table(name)
        .alias("s")
        .groupBy("day")
        .agg(F.expr(_hllp_estimate_sql("s")).alias("hll_est_milli"))
    )
    exact = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("exact_distinct"))
    )
    return (
        est.join(exact, "day")
        .select("day", "exact_distinct", "hll_est_milli")
        .orderBy("day")
    )


@query("q_stream_neardup")  # rows-only: LSH signatures use engine xxhash64
def stream_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental near-dup detection over the documents
    corpus: the corpus arrives in two micro-batches (doc_id parity,
    maxFilesPerTrigger=1) and every batch is probed against the
    persistent signature index of everything seen before — so
    cross-batch near-duplicates are caught, which a batch-local dedup
    would miss. Deterministic: fixed-seed MinHash, deterministic batch
    split. The match set must equal the batch LSH candidate pairs over
    the union (pinned in tests/test_neardup_stream.py and
    test_stream_neardup_query_matches_batch_candidates)."""
    import glob
    import os
    import shutil

    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.neardup import near_dup_sink

    tmp = scratch_dir("neardup_q")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    for i in (0, 1):
        d = os.path.join(tmp, f"b{i}")
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(d)
        shutil.copy(
            glob.glob(os.path.join(d, "part-*.parquet"))[0],
            os.path.join(src, f"b{i}.parquet"),
        )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # state-dir basename doubles as the KV guard-store name — make it
    # unique per invocation or a rerun in the same session would see
    # the previous run's batch watermark and skip every batch.
    writer, idx = near_dup_sink(
        stream,
        os.path.join(tmp, f"state-{os.path.basename(tmp)}"),
        os.path.join(tmp, "ckpt"),
    )
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return idx.matches(spark).orderBy("new_doc", "dup_of")


@query(
    "q_stream_flagship_replay",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           COUNT(*) AS total,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS success,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS fee_cents
    FROM events
    GROUP BY 1
    """,
)
def stream_flagship_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ACTUAL pipeline, end-to-end as one driver-checked
    key (StreamingAnalysisAppWithKafkaManageOffset.scala:41-79): order-event JSON payloads arrive on a
    stream, are parsed with a declared schema, classified (paid flag,
    day bucket, fee cents), delta-aggregated per micro-batch, and
    accumulated into the idempotent KV sink — the engine's Redis twin
    (streaming/sinks.py). The returned DataFrame is the FINAL KV STORE
    STATE, so the oracle (the plain batch rollup over the same events)
    certifies the whole parse → classify → rollup → exactly-once-apply
    chain, not just the agg.

    The events fixture is re-skinned as the reference's wire format
    (KafkaProducerApp.scala:38-52: all-string JSON fields): purchase →
    flag "1", value → a 2-decimal fee string built from exact cents so
    classify_orders' decimal(18,2) parse reproduces the same integers
    the oracle derives with FLOOR(value·100 + 0.5)."""
    import os

    from steaminganalysis_spark.registry import to_cents
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.pipeline import day_rollup_delta
    from steaminganalysis_spark.streaming.sinks import (
        KEY_PREFIX,
        KVStore,
        day_rollup_sink,
    )

    run = uuid.uuid4().hex[:8]
    store_name = f"flagship_replay_{run}"
    ckpt = os.path.join(scratch_dir("flagship_replay"), f"ckpt_{run}")

    ev = events_stream(spark, sf_dir).withColumn("cents", to_cents(F.col("value")))
    payload = F.to_json(
        F.struct(
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("time"),
            F.col("user_id").cast("string").alias("userId"),
            F.col("event_type").alias("courseId"),
            # Sign-aware encode (ADVICE r3): the previous
            # `div 100` + lpad(cents % 100) spelling silently
            # truncated "-23" to "-2" for negative cents. Fixtures
            # are non-negative, but the encoder shouldn't rely on it.
            F.format_string(
                "%s%d.%02d",
                F.when(F.col("cents") < 0, "-").otherwise(""),
                F.expr("abs(cents) div 100"),
                F.expr("abs(cents) % 100"),
            ).alias("fee"),
            F.when(F.col("event_type") == "purchase", "1").otherwise("0").alias("flag"),
            F.col("event_id").cast("string").alias("orderId"),
        )
    )
    raw = ev.select(payload.alias("value"))

    q = day_rollup_sink(raw, ckpt, day_rollup_delta, store_name=store_name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    store = KVStore.instance(store_name)
    rows = [
        (
            key.removeprefix(KEY_PREFIX),
            int(h["total"]),
            int(h["success"]),
            int(h["fee_cents"]),
        )
        for key in store.keys()
        for h in (store.hgetall(key),)
    ]
    KVStore.reset(store_name)
    return spark.createDataFrame(
        rows, "day string, total bigint, success bigint, fee_cents bigint"
    )


@query(
    "q_stream_static_join",
    oracle=f"""
    SELECT c_mktsegment AS mktsegment,
           COUNT(*) AS n,
           {SQL_DSUM("value")} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join, genuinely streamed: the events stream
    enriches against the static customer dimension (the canonical
    lookup-table pattern — Spark re-plans the static side per
    micro-batch, so a dim refresh is picked up without restarting the
    stream; the dim broadcasts, the stream never shuffles for the
    join), then aggregates per market segment in complete mode. The
    oracle is the equivalent batch join — stream-batch equivalence for
    the B.3 stream-static row, which was previously only
    harness-tested."""
    name = f"ssj_static_{uuid.uuid4().hex[:8]}"
    ev = events_stream(spark, sf_dir)
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count("*").alias("n"),
            dsum(F.col("value")).alias("total_value"),
        )
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "q_stream_append_watermark",
    oracle="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS w FROM events),
    agg AS (SELECT date_trunc('day', ts) AS d, COUNT(*) AS total
            FROM events GROUP BY 1)
    SELECT strftime(d, '%Y-%m-%d') AS day, total
    FROM agg, wm WHERE d + INTERVAL 1 DAY <= wm.w
    """,
)
def stream_append_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode windowed aggregation under a watermark — the
    finalize-and-emit-once semantics (vs the tumbling query's
    complete-mode accumulate-forever): a window row is emitted exactly
    when the watermark (max event time − 1 h delay) passes its end,
    after which late rows for it are DROPPED — bounded state, the only
    viable mode when the day set is unbounded at 100 TB. Run to
    completion over the events fixture, the emitted set is exactly the
    windows whose end ≤ final watermark; the oracle states that rule
    in SQL (the trailing partial day is deliberately absent — it was
    never finalized). State per key is one open window; eviction is
    the emission."""
    name = f"stream_wm_{uuid.uuid4().hex[:8]}"
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").alias("total"))
    )
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"), "total"
    )


@query(
    "q_stream_cdc_scd2",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
      SELECT user_id, event_type AS status, ts, event_id
      FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, status,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                    '%Y-%m-%d %H:%M:%S') AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
             AS is_current
    FROM changes
    """,
)
def stream_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD Type-2 dimension maintenance: the events change
    log arrives in three time-ordered micro-batches (ts-boundary file
    split, maxFilesPerTrigger=1) and each batch MERGEs into the
    standing change table via the recompute-affected-keys pattern
    (streaming/scd2.py) — per-batch work is O(batch + affected users),
    never O(history). The returned frame is the validity-interval view
    of the FINAL table state, and the oracle is the batch SCD2 SQL
    (identical to q_scd2_from_cdc): incremental maintenance must
    converge to the batch answer regardless of batch boundaries. The
    merge commits a version dir then the batch watermark through the
    same atomic KVStore step as the KV sink, so crash-replays rewrite
    an identical version (idempotent by construction)."""
    import glob
    import os
    import shutil

    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.scd2 import (
        intervals_from_changes,
        read_changes,
        scd2_sink,
    )
    from steaminganalysis_spark.streaming.sinks import KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("cdc_scd2")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    bounds = [
        (None, "2024-01-11"),
        ("2024-01-11", "2024-01-21"),
        ("2024-01-21", None),
    ]
    for i, (lo, hi) in enumerate(bounds):
        part = ev
        if lo:
            part = part.filter(F.col("ts") >= F.lit(lo).cast("timestamp"))
        if hi:
            part = part.filter(F.col("ts") < F.lit(hi).cast("timestamp"))
        d = os.path.join(tmp, f"b{i}")
        part.coalesce(1).write.parquet(d)
        shutil.copy(
            glob.glob(os.path.join(d, "part-*.parquet"))[0],
            os.path.join(src, f"b{i}.parquet"),
        )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    table_dir = os.path.join(tmp, "table")
    store_name = f"cdc_scd2_{run}"
    writer, scope = scd2_sink(
        stream, table_dir, os.path.join(tmp, f"ckpt_{run}"), store_name
    )
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = intervals_from_changes(
        read_changes(spark, table_dir, store_name, scope)
    ).localCheckpoint(eager=True)  # detach from the scratch dirs before cleanup
    KVStore.reset(store_name)
    return out


@query(
    "q_stream_stream_left_join",
    oracle="""
    WITH p AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
          WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS c_ts, event_id AS c_id FROM events
          WHERE event_type = 'click'),
    wm AS (SELECT LEAST((SELECT MAX(p_ts) FROM p), (SELECT MAX(c_ts) FROM c))
                    - INTERVAL 2 HOUR AS w),
    matched AS (
      SELECT p.p_id, c.c_id
      FROM p JOIN c ON c.user_id = p.user_id
                   AND c.c_ts < p.p_ts
                   AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
    )
    SELECT p_id, c_id FROM matched
    UNION ALL
    SELECT p.p_id, NULL AS c_id
    FROM p, wm
    WHERE p.p_ts < wm.w
      AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.p_id = p.p_id)
    """,
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER join under watermarks — the hard mode
    of streaming joins: matched (purchase, prior click ≤1h) pairs emit
    immediately, while an UNMATCHED purchase can only emit its
    null-padded row once the watermark proves no future click can match
    (state eviction = emission, the same finalize-once semantics as
    ``q_stream_append_watermark``). Run to completion, the emitted set
    is: every matched pair, plus null rows exactly for the unmatched
    purchases whose timestamp the final watermark has passed —
    purchases above it are still held in state when the query stops and
    are deliberately absent. The final watermark is the MIN across the
    two watermarked branches of (that branch's max event time − 2 h):
    Spark advances the query watermark to the minimum over all
    watermark operators, so the slower branch (here whichever of
    purchases/clicks saw the earlier last event) gates eviction — a
    semantic pinned empirically against all three fixture SFs, where
    the single withheld row differs per SF exactly per this rule. The
    oracle states the rule in SQL; without watermarks both sides would
    buffer forever (unbounded state at 100 TB), and the no-data
    micro-batch after the last file is what flushes the
    expired-unmatched rows."""
    name = f"ssoj_{uuid.uuid4().hex[:8]}"
    ev = events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    cond = (
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts < purchases.p_ts)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
    )
    joined = purchases.join(clicks, cond, "left_outer").select("p_id", "c_id")
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "q_stream_stream_full_join",
    oracle="""
    WITH p AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
          WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS c_ts, event_id AS c_id FROM events
          WHERE event_type = 'click'),
    wm AS (SELECT LEAST((SELECT MAX(p_ts) FROM p), (SELECT MAX(c_ts) FROM c))
                    - INTERVAL 2 HOUR AS w),
    matched AS (
      SELECT p.p_id, c.c_id
      FROM p JOIN c ON c.user_id = p.user_id
                   AND c.c_ts < p.p_ts
                   AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
    )
    SELECT p_id, c_id FROM matched
    UNION ALL
    SELECT p.p_id, NULL AS c_id
    FROM p, wm
    WHERE p.p_ts < wm.w
      AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.p_id = p.p_id)
    UNION ALL
    SELECT NULL AS p_id, c.c_id
    FROM c, wm
    WHERE c.c_ts + INTERVAL 1 HOUR < wm.w
      AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.c_id = c.c_id)
    """,
)
def stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER join under watermarks — both sides'
    unmatched rows must eventually emit, and each side has its OWN
    eviction boundary derived from the join condition: an unmatched
    purchase null-pads once the watermark passes p_ts (no future click
    can satisfy c_ts < p_ts), while an unmatched click must wait until
    the watermark passes c_ts + 1h (a purchase up to one hour later
    could still match it). Run to completion the emitted set is:
    every matched pair, plus null rows for exactly the unmatched
    purchases with p_ts below the final watermark and the unmatched
    clicks with c_ts + 1h below it — rows above either boundary are
    still buffered when the query stops and are deliberately absent.
    The final watermark is the MIN across the two branches of
    (max event time − 2 h), the same global-watermark rule pinned by
    ``q_stream_stream_left_join``; the oracle states both per-side
    boundaries in SQL and is verified at all three fixture SFs. At
    100 TB the watermarks are what bound both state stores — without
    them a full-outer stream join buffers both streams forever."""
    name = f"ssfj_{uuid.uuid4().hex[:8]}"
    ev = events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    cond = (
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts < purchases.p_ts)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
    )
    joined = purchases.join(clicks, cond, "full_outer").select("p_id", "c_id")
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "q_stream_chained_aggs",
    oracle="""
    WITH wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS w FROM events),
    pu AS (
      SELECT date_trunc('hour', ts) AS h, user_id, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(h, '%Y-%m-%d %H:00') AS hour,
           COUNT(*) AS active_users,
           CAST(SUM(n) AS BIGINT) AS events
    FROM pu, wm
    WHERE h + INTERVAL 1 HOUR <= wm.w
    GROUP BY h
    """,
)
def stream_chained_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query (multiple
    stateful ops per query, Spark 3.4+): a per-(user, 1h-window) count
    feeds a second windowed aggregation that reduces each hour to its
    active-user count and event total — the classic two-level rollup
    (dedupe/profile per key, then summarize per window) that older
    engines forced into two jobs with an intermediate topic. Both
    operators share the event-time watermark; in append mode an hour
    emits from the SECOND aggregate only once the watermark finalizes
    it in the FIRST, so the run-to-completion output is exactly the
    hours whose end ≤ final watermark (max event time − 2 h) — the
    oracle states that finalize-once rule. At 100 TB both state stores
    stay bounded: the first by (users × open windows), the second by
    open windows, and eviction cascades through the chain as the
    watermark advances."""
    name = f"chained_{uuid.uuid4().hex[:8]}"
    ev = events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    per_user = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "user_id"
    ).agg(F.count("*").alias("n"))
    per_hour = per_user.groupBy("w").agg(
        F.count("*").alias("active_users"),
        F.sum("n").alias("events"),
    )
    q = (
        per_hour.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:00").alias("hour"),
        "active_users",
        "events",
    )


@query(
    "q_stream_dedup_within_watermark",
    oracle="""
    SELECT user_id, COUNT(*) AS n
    FROM (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts, user_id) AS rn
      FROM events
    ) WHERE rn = 1
    GROUP BY user_id
    """,
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` (Spark 3.5+) — the
    BOUNDED-STATE spelling of streaming dedup: a key's suppression
    state is evicted once the watermark passes its event time plus the
    delay, so state size is O(keys per delay window) instead of
    O(all keys ever) (``q_stream_dedup``'s accumulate-forever
    ``dropDuplicates`` — correct for the reference's semantics, but
    unbounded at 100 TB; THIS is the production spelling when
    duplicates only arrive within a bounded replay horizon, which is
    exactly how Kafka redelivery behaves). First-seen rows emit
    immediately (suppression state, not buffering), so the
    run-to-completion per-user counts equal the batch first-arrival
    dedup; cross-micro-batch suppression inside the horizon is pinned
    in tests/test_streaming.py."""
    name = f"dedup_wm_{uuid.uuid4().hex[:8]}"
    stream = events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = (
        stream.dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "q_stream_stream_right_join",
    oracle="""
    WITH p AS (SELECT user_id, ts AS p_ts, event_id AS p_id FROM events
          WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts AS c_ts, event_id AS c_id FROM events
          WHERE event_type = 'click'),
    wm AS (SELECT LEAST((SELECT MAX(p_ts) FROM p), (SELECT MAX(c_ts) FROM c))
                    - INTERVAL 2 HOUR AS w),
    matched AS (
      SELECT p.p_id, c.c_id
      FROM p JOIN c ON c.user_id = p.user_id
                   AND c.c_ts < p.p_ts
                   AND c.c_ts >= p.p_ts - INTERVAL 1 HOUR
    )
    SELECT p_id, c_id FROM matched
    UNION ALL
    SELECT NULL AS p_id, c.c_id
    FROM c, wm
    WHERE c.c_ts + INTERVAL 1 HOUR < wm.w
      AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.c_id = c.c_id)
    """,
)
def stream_stream_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream RIGHT OUTER join under watermarks — the mirror of
    ``q_stream_stream_left_join``, completing the outer-join family
    (inner r03, left r04-window, full r04-window): matched pairs emit
    immediately; an unmatched CLICK null-pads only once the watermark
    passes its eviction boundary c_ts + 1h — a purchase up to one hour
    later could still match it, the same click-side boundary the full
    join derives (and the asymmetric counterpart of the left join's
    p_ts boundary, because the join condition is not symmetric in
    time). Final watermark = MIN over branches of (max event time −
    2h), the pinned global-MIN rule; the oracle states the rule in
    SQL. Same bounded-state argument as the siblings: the watermark is
    what makes click-side state finite at 100 TB."""
    name = f"ssrj_{uuid.uuid4().hex[:8]}"
    ev = events_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id"))
        .withWatermark("p_ts", "2 hours")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "2 hours")
    )
    cond = (
        (purchases.user_id == clicks.c_user)
        & (clicks.c_ts < purchases.p_ts)
        & (clicks.c_ts >= purchases.p_ts - F.expr("INTERVAL 1 HOUR"))
    )
    joined = purchases.join(clicks, cond, "right_outer").select("p_id", "c_id")
    q = joined.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "q_stream_stateful_profile",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS spend_cents,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_seen
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def stream_stateful_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ARBITRARY stateful operator (``applyInPandasWithState`` —
    PySpark's flatMapGroupsWithState), executed as a real streaming
    query and oracle-checked: per-user running profile (event count,
    exact purchase cents, last-seen timestamp) accumulates in the
    executor state stores, emitting an update whenever the user
    appears in a micro-batch; the registered result is each user's
    FINAL update (row_number on the monotone event count), which must
    equal the batch aggregate — SURVEY §2 B.8's custom-stateful row,
    previously harness-only, now under the same oracle gate as every
    other operator. State per key is three scalars, so the store is
    bounded by active users, not event volume — the property that
    keeps custom state viable at 100 TB."""
    from steaminganalysis_spark.sources.registry import events_stream
    from steaminganalysis_spark.streaming.stateful import running_user_totals

    name = f"ssp_{uuid.uuid4().hex[:8]}"
    ev = events_stream(spark, sf_dir).select("user_id", "event_type", "value", "ts")
    q = (
        running_user_totals(ev)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    updates = spark.table(name)
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events", "spend_cents", "last_seen")
        .orderBy("user_id")
    )


@query(
    "q_stream_dq_drift",
    oracle="""
    WITH tagged AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                  THEN 'ref' ELSE 'cur' END AS cohort,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
               // 2000 AS bucket
      FROM events
    ),
    cells AS (
      SELECT event_type, bucket,
             CAST(COUNT(*) FILTER (WHERE cohort = 'ref') AS BIGINT) AS n_ref,
             CAST(COUNT(*) FILTER (WHERE cohort = 'cur') AS BIGINT) AS n_cur
      FROM tagged GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur,
             CAST(COUNT(*) AS BIGINT) AS n_buckets
      FROM cells GROUP BY 1
    )
    SELECT c.event_type,
           CAST(t.t_ref AS BIGINT) AS n_ref,
           CAST(t.t_cur AS BIGINT) AS n_cur,
           t.n_buckets,
           CAST(SUM(abs((c.n_ref * 1000000) // t.t_ref
                        - (c.n_cur * 1000000) // t.t_cur)) AS BIGINT)
             AS tvd2_ppm
    FROM cells c JOIN tot t ON c.event_type = t.event_type
    GROUP BY 1, 2, 3, 4
    """,
)
def stream_dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift monitor RUN ON THE STREAM (``q_dq_drift``'s streaming
    twin, and the natural deployment — drift is a property you watch,
    not a report you schedule): the fact-sized work, counting (type,
    value-bucket, cohort) cells, executes as a streaming aggregation
    in complete mode over the replayed events; the TVD rollup then
    reads the final state table — ~10² cells — batch-side. Same
    integer-ppm arithmetic as the batch twin, same oracle, so the
    certificate is stream≡batch for the whole monitor. At 100 TB/day
    the cell state is bounded by |types|×|buckets| regardless of
    event volume — the state-size argument that makes complete-mode
    acceptable here."""
    name = f"stream_drift_{uuid.uuid4().hex[:8]}"
    stream = events_stream(spark, sf_dir)
    cells = (
        stream.select(
            "event_type",
            F.when(F.to_date("ts") < F.lit("2024-01-16"), "ref")
            .otherwise("cur")
            .alias("cohort"),
            F.expr(
                "CAST(FLOOR(CAST(value AS DOUBLE) * 100.0D + 0.5D) AS BIGINT)"
                " div 2000"
            ).alias("bucket"),
        )
        .groupBy("event_type", "bucket", "cohort")
        .agg(F.count("*").alias("n"))
    )
    q = (
        cells.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    state = spark.table(name)
    wide = state.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("cohort") == "ref", F.col("n")).otherwise(0)).alias(
            "n_ref"
        ),
        F.sum(F.when(F.col("cohort") == "cur", F.col("n")).otherwise(0)).alias(
            "n_cur"
        ),
    ).localCheckpoint(eager=True)
    # ^ breaks the MemoryPlan attribute lineage: tot below re-aggregates
    # the same ~10² cells, and joining two children of one memory sink
    # view hits Spark's conflicting-reference guard otherwise.
    tot = wide.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count("*").alias("n_buckets"),
    )
    return (
        wide.join(F.broadcast(tot), "event_type")
        .groupBy("event_type", "t_ref", "t_cur", "n_buckets")
        .agg(
            F.sum(
                F.abs(
                    F.expr("(n_ref * 1000000) div t_ref")
                    - F.expr("(n_cur * 1000000) div t_cur")
                )
            )
            .cast("long")
            .alias("tvd2_ppm")
        )
        .select(
            "event_type",
            F.col("t_ref").cast("long").alias("n_ref"),
            F.col("t_cur").cast("long").alias("n_cur"),
            "n_buckets",
            "tvd2_ppm",
        )
    )


@query(
    "q_stream_topk",
    oracle="""
    WITH c AS (
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day, event_type, n, CAST(rk AS BIGINT) AS rk
    FROM (
      SELECT day, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY day
                                ORDER BY n DESC, event_type) AS rk
      FROM c
    )
    WHERE rk <= 3
    """,
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard (top-3 event types per day): the HEAVY
    part — per-(day, type) counts — is maintained incrementally in
    streaming state (complete-mode windowed aggregation, the
    q_stream_tumbling_daily harness); the top-k finalization is a
    window rank over the COMPACT aggregate emitted by the sink, which
    is days × types rows regardless of stream volume. That split is
    the standard way to get a "top-k over all time" from a stream
    without a lambda architecture: rank is not incrementally
    maintainable, counts are — so keep the state in the monoid and
    rank at read time. Oracle = the batch count + rank over the same
    events, so driver parity pins stream≡batch for the composition."""
    name = f"stream_topk_{uuid.uuid4().hex[:8]}"
    stream = events_stream(spark, sf_dir)
    agg = stream.groupBy(
        F.window("ts", "1 day").alias("w"), "event_type"
    ).agg(F.count("*").alias("n"))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    counts = spark.table(name).select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
        "event_type",
        F.col("n").cast("long").alias("n"),
    )
    rk = F.row_number().over(
        W.partitionBy("day").orderBy(F.col("n").desc(), "event_type")
    )
    return (
        counts.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= 3)
        .select("day", "event_type", "n", "rk")
    )


@query(
    "q_stream_mv_maintenance",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_mv_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance — the streaming twin of
    ``q_mv_incremental``: the daily rollup MV is materialized ONCE over
    history (events before the shared MV_CUTOFF), then the delta
    arrives as a stream in two time-ordered micro-batches and each
    batch MERGEs into the stored view by monoid addition
    (streaming/mv.py) — per-batch work is O(batch) + an aggregate-
    cardinality join, never O(history). Each merge writes a version
    dir then commits the batch watermark through the same atomic
    KVStore step as the KV sink, so crash-replays rewrite an identical
    version and replayed batch ids are no-ops (idempotence pinned in
    tests/test_streaming.py). The returned frame is the FINAL
    committed view and the oracle is the full batch recompute over all
    events: streamed maintenance must converge to the batch answer
    regardless of batch boundaries — the same stream≡batch contract as
    q_stream_cdc_scd2."""
    from steaminganalysis_spark.streaming.mv import read_mv
    from steaminganalysis_spark.streaming.sinks import KVStore

    table_dir, store_name, scope = _run_mv_maintenance_stream(spark, sf_dir)
    out = read_mv(spark, table_dir, store_name, scope).localCheckpoint(
        eager=True
    )  # detach from the scratch dirs before cleanup
    KVStore.reset(store_name)
    return out


# The micro-batch boundary the MV maintenance harness splits the
# post-MV_CUTOFF delta on: batch 0 = [MV_CUTOFF, MV_MID), batch 1 =
# [MV_MID, inf). q_stream_mv_time_travel's oracle states the version-0
# snapshot in terms of this constant.
MV_MID = "2024-01-28"


@query(
    "q_stream_mv_backfill",
    oracle="""
    WITH md AS (
      SELECT strftime(MIN(date_trunc('day', ts)), '%Y-%m-%d') AS d
      FROM events
    )
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events, md
    WHERE NOT (strftime(date_trunc('day', ts), '%Y-%m-%d') = md.d
               AND event_type = 'error')
    GROUP BY 1, 2
    """,
)
def stream_mv_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTATEMENT BACKFILL against the streaming MV store — the merge
    mode q_stream_mv_maintenance (monoid addition) cannot express:
    when an audit CORRECTS history, the corrected slice must REPLACE
    the stored rows for the affected grain, not add to them. Batch 0
    is the ordinary post-MV_CUTOFF delta (monoid-added); batch 1 is
    the backfill — the earliest day restated with its 'error' events
    struck (rows flagged ``backfill = 1``), so the merge drops every
    stored row of that day and inserts the corrected rollup
    (streaming/mv.py merge_mv_backfill_batch — broadcast anti-join at
    aggregate cardinality + union; history never re-read, the same
    versioned-watermark exactly-once as every MV merge). Final view =
    the full rollup with (earliest day, 'error') removed — the oracle
    states exactly that, so the driver checks both merge modes
    composed. Restated days are micro-batch-sized by contract (the
    backfill carries the full corrected day)."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.operators.storage import MV_CUTOFF
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.mv import (
        daily_rollup_mv,
        mv_backfill_sink,
        read_mv,
    )
    from steaminganalysis_spark.streaming.sinks import KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_mv_backfill")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    day = F.date_format("ts", "yyyy-MM-dd")
    minday = ev.agg(F.min(day).alias("d")).collect()[0]["d"]
    cut = F.to_timestamp(F.lit(MV_CUTOFF))
    table_dir = os.path.join(tmp, "table")
    daily_rollup_mv(ev.filter(F.col("ts") < cut)).write.mode(
        "overwrite"
    ).parquet(os.path.join(table_dir, "base"))
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    delta = ev.filter(F.col("ts") >= cut).withColumn("backfill", F.lit(0))
    restated = (
        ev.filter((day == minday) & (F.col("event_type") != "error"))
        .withColumn("backfill", F.lit(1))
    )
    now = time.time()
    for i, part in enumerate((delta, restated)):
        d = os.path.join(tmp, f"b{i}")
        part.coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, backfill int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store_name = f"stream_mv_bf_{run}"
    writer, scope = mv_backfill_sink(
        stream, table_dir, os.path.join(tmp, f"ckpt_{run}"), store_name
    )
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = read_mv(spark, table_dir, store_name, scope).localCheckpoint(
        eager=True
    )
    KVStore.reset(store_name)
    return out


def _run_mv_maintenance_stream(spark, sf_dir):
    """Shared harness for the MV maintenance keys: materialize the
    daily-rollup base over pre-MV_CUTOFF history, replay the delta as
    two time-ordered micro-batch files (mtimes forced monotone so the
    file source's modified-time ordering is deterministic: batch 0 is
    ALWAYS the [MV_CUTOFF, MV_MID) slice), and run the foreachBatch
    monoid merge to completion. Returns (table_dir, store_name, scope)
    for the caller to read committed or historical versions from."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.operators.storage import MV_CUTOFF
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.mv import daily_rollup_mv, mv_sink

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_mv")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    cut = F.to_timestamp(F.lit(MV_CUTOFF))
    table_dir = os.path.join(tmp, "table")
    daily_rollup_mv(ev.filter(F.col("ts") < cut)).write.mode(
        "overwrite"
    ).parquet(os.path.join(table_dir, "base"))
    # the delta replayed as two time-ordered micro-batch files
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    delta = ev.filter(F.col("ts") >= cut)
    now = time.time()
    for i, part in enumerate(
        (
            delta.filter(F.col("ts") < F.lit(MV_MID).cast("timestamp")),
            delta.filter(F.col("ts") >= F.lit(MV_MID).cast("timestamp")),
        )
    ):
        d = os.path.join(tmp, f"b{i}")
        part.coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store_name = f"stream_mv_{run}"
    writer, scope = mv_sink(
        stream, table_dir, os.path.join(tmp, f"ckpt_{run}"), store_name
    )
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return table_dir, store_name, scope


@query(
    "q_stream_mv_time_travel",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    WHERE ts < TIMESTAMP '2024-01-28'
    GROUP BY 1, 2
    """,
)
def stream_mv_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the streaming MV store (streaming/mv.py:99):
    run the same two-batch maintenance stream as
    q_stream_mv_maintenance, then read the view AS OF version 0 — the
    snapshot committed after the first micro-batch, i.e. base history
    (ts < MV_CUTOFF) plus only the [MV_CUTOFF, MV_MID) delta slice.
    Every merge writes a full self-contained version dir before
    advancing the watermark, so any committed version is a consistent
    snapshot; the harness pins micro-batch order via file mtimes, which
    makes the v0 contents a pure function of the data. The oracle is
    the batch rollup over exactly the events with ts < MV_MID
    ('2024-01-28') — a historical version must equal the batch answer
    over the prefix of the stream it saw, the time-travel analogue of
    the stream≡batch contract. Uncommitted versions raise (pinned in
    tests/test_streaming.py::test_mv_time_travel_reads_historical_version)."""
    from steaminganalysis_spark.streaming.mv import read_mv_at
    from steaminganalysis_spark.streaming.sinks import KVStore

    table_dir, store_name, _scope = _run_mv_maintenance_stream(spark, sf_dir)
    out = read_mv_at(spark, table_dir, 0).localCheckpoint(eager=True)
    KVStore.reset(store_name)
    return out


from steaminganalysis_spark.operators.curation import SAMPLE_K, _uniform_sql

_WEIGHTED_SAMPLE_ORACLE = f"""
    SELECT doc_id, n_chars
    FROM (
      SELECT doc_id, n_chars,
             ln({_uniform_sql('doc_id', 'wsamp')}) / CAST(n_chars AS DOUBLE)
               AS priority
      FROM documents
    )
    ORDER BY priority DESC, doc_id
    LIMIT {SAMPLE_K}
"""


@query("q_stream_weighted_sample", oracle=_WEIGHTED_SAMPLE_ORACLE)
def stream_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming weighted reservoir sampling — the incremental twin of
    ``q_sample_weighted`` (Efraimidis–Spirakis A-ES, weight =
    n_chars): the corpus arrives in two micro-batches (doc_id parity,
    maxFilesPerTrigger=1, mtimes forced monotone) and each batch
    merges into an O({K})-row stored reservoir — batch-side top-{K} by
    the SAME hash-derived ``ln(u)/w`` priority, union with the
    committed reservoir, re-top (streaming/reservoir.py). Because the
    priority is a pure function of doc_id, top-K-by-priority is an
    associative monoid, so the final reservoir EQUALS the batch A-ES
    over the whole corpus regardless of batch boundaries — the
    registered oracle IS q_sample_weighted's, making stream≡batch the
    driver-checked fact. Versioned commits behind the shared KVStore
    watermark: replayed batch ids are no-ops and torn version dirs are
    invisible (pinned in tests/test_streaming.py). Per batch the
    corpus side never shuffles — one map-side priority projection into
    TakeOrderedAndProject heaps, then a {K}+{K}-row merge."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.reservoir import (
        read_reservoir,
        reservoir_sink,
    )
    from steaminganalysis_spark.streaming.sinks import KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_reservoir")
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    now = time.time()
    for i in (0, 1):
        d = os.path.join(tmp, f"b{i}")
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))
    stream = (
        spark.readStream.schema("doc_id long, n_chars long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store_name = f"stream_reservoir_{run}"
    out_dir = os.path.join(tmp, "versions")
    writer, scope = reservoir_sink(
        stream, out_dir, os.path.join(tmp, f"ckpt_{run}"), store_name, SAMPLE_K
    )
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = (
        read_reservoir(spark, out_dir, store_name, scope)
        .orderBy(F.col("priority").desc(), "doc_id")
        .select("doc_id", "n_chars")
        .localCheckpoint(eager=True)
    )
    KVStore.reset(store_name)
    return out


stream_weighted_sample.__doc__ = stream_weighted_sample.__doc__.replace(
    "{K}", str(SAMPLE_K)
)


@query("q_stream_decon_guard", oracle=DECON_FUZZY_ORACLE)
def stream_decon_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming decontamination guard — the incremental twin of
    ``q_decontaminate_fuzzy``: the TRAINING split arrives in two
    micro-batches (doc_id parity, maxFilesPerTrigger=1, mtimes forced
    monotone) and each batch is shingled and probed against the static
    benchmark-sized eval shingle set before it could reach a training
    mix; flagged (train, eval) pairs at ≥ 50% eval-containment append
    transactionally (streaming/decon.py — per-batch dir + KVStore
    watermark, the shared exactly-once discipline; replay idempotence
    pinned in tests/test_streaming.py). Containment is per
    (document, eval set) and documents never span batches, so the
    union of per-batch flags EQUALS the batch pass over the whole
    corpus — the registered oracle IS the batch key's oracle, making
    the stream≡batch contract itself the driver-checked fact."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.functions.text import shingle_hashes
    from steaminganalysis_spark.operators.extras import _is_eval
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.decon import decon_sink, read_flags
    from steaminganalysis_spark.streaming.sinks import KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_decon")
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # static side: the eval shingle set + per-eval-doc sizes, staged
    # once (benchmark-sized by construction — broadcast in every batch)
    ev = (
        shingle_hashes(docs.filter(_is_eval("doc_id")), n=5)
        .select(F.col("doc_id").alias("eval_doc"), "h")
        .localCheckpoint(eager=True)
    )
    evsz = ev.groupBy("eval_doc").agg(F.count("*").alias("eval_ngrams"))
    # the training split replayed as two parity micro-batches
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    train = docs.filter(~_is_eval("doc_id"))
    now = time.time()
    for i in (0, 1):
        d = os.path.join(tmp, f"b{i}")
        train.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    store_name = f"stream_decon_{run}"
    out_dir = os.path.join(tmp, "flags")
    writer, scope = decon_sink(
        stream, ev, evsz, out_dir, os.path.join(tmp, f"ckpt_{run}"), store_name
    )
    q = writer.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = read_flags(spark, out_dir, store_name, scope).localCheckpoint(
        eager=True
    )
    KVStore.reset(store_name)
    return out


# ------------------------------------------------ rate source (r11)

RATE_SOURCE_ROWS = 512  # deterministic prefix: values 0..511


@query(
    "q_stream_rate_source",
    oracle=f"""
    SELECT CAST(value % 7 AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(value) AS BIGINT) AS total,
           CAST(MIN(value) AS BIGINT) AS lo,
           CAST(MAX(value) AS BIGINT) AS hi
    FROM range({RATE_SOURCE_ROWS}) t(value)
    GROUP BY 1
    ORDER BY 1
    """,
)
def stream_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's built-in ``rate`` STREAMING source run as a genuine
    unbounded stream (micro-batch trigger → filter → append-mode
    memory sink), made oracle-checkable by the deterministic-prefix
    trick: the rate source emits ``value`` = 0, 1, 2, … exactly once
    each (round-robined across partitions, monotone per partition), so
    filtering ``value < K`` BEFORE the sink and polling the sink until
    all K rows landed yields a result that is a pure function of K —
    the wall-clock ``timestamp`` column, the only nondeterministic
    output of the source, is dropped at the filter projection. The
    final frame is a per-``value % 7`` bucket aggregate; the DuckDB
    oracle computes the same aggregate over ``range(K)``, so this is
    a full stream≡batch hash check, not a rows-only row.

    This converts SURVEY §2's "rate/memory source" row from
    harness-only evidence into a driver-checked key, and is the
    Spark-native twin of the reference's synthetic generator (REF A14,
    MockData:22-43 / Producer:37-57 — random order rows pushed into
    the stream; here the generator IS the source, no external
    producer process). Scale shape: the rate source is per-partition
    independent (numPartitions scales it to any executor count); the
    one exchange is the bucket aggregate, with map-side partial
    combine over ≤K rows. Unbounded-stream hygiene: the query is
    stopped in a finally and the uuid-suffixed sink is dropped on
    re-invocation by name uniqueness (the module-wide memory-sink
    convention)."""
    import time

    name = f"rate_src_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 5000)
        .option("numPartitions", 4)
        .load()
        .filter(F.col("value") < RATE_SOURCE_ROWS)
        .select("value")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120.0
        while spark.table(name).count() < RATE_SOURCE_ROWS:
            exc = q.exception()
            if exc is not None:
                raise exc  # surface the real stream failure, not a timeout
            if time.time() > deadline:
                raise TimeoutError(
                    f"rate source produced "
                    f"{spark.table(name).count()}/{RATE_SOURCE_ROWS} "
                    "rows within 120s"
                )
            time.sleep(0.1)
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy((F.col("value") % 7).alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n").cast("long").alias("n"),
            F.col("total").cast("long").alias("total"),
            F.col("lo").cast("long").alias("lo"),
            F.col("hi").cast("long").alias("hi"),
        )
        .orderBy("bucket")
    )


# -------------------------- streaming snapshot-table ingest (r11)


def snapshot_ingest_sink(table: str, store_name: str, marker: str):
    """foreachBatch sink appending each micro-batch to the atomic-
    manifest snapshot table exactly once: (1) the replayed-batch guard
    returns before writing anything; (2) new uuid data files land
    invisible; (3) manifest v{batch+1} = previous committed list + the
    new files commits via fsync + os.replace; (4) the KVStore batch
    watermark advances LAST — a crash anywhere earlier leaves either
    orphan files (invisible by the manifest contract) or a committed
    manifest whose ``txn`` marker map already carries this batch id,
    so the replay re-advances the watermark WITHOUT committing a
    duplicate successor (the Delta txn appId/version pattern — ADVICE
    r12: _snap_latest()+1 addressing alone made a commit-then-crash
    replay re-append on top of its own committed result). Module-level
    so the replay/crash pins in tests/test_streaming.py drive it
    directly."""
    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_commit,
        _snap_latest_doc,
    )
    from steaminganalysis_spark.streaming.sinks import KVStore

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        from steaminganalysis_spark.operators.storage import _snap_commit_cas

        store = KVStore.instance(store_name)
        if batch_id <= store.last_applied(marker):
            return  # replayed, already-committed batch: exactly-once
        # Commit via CAS with a retry loop (r13): the sink used plain
        # os.replace, which CLOBBERS (or is clobbered by) a concurrent
        # maintenance commit — an OPTIMIZE landing mid-batch would
        # silently lose one side. Append-vs-rewrite commits always
        # COMMUTE (the retry re-reads the compacted file list and adds
        # our files on top), so the loser retries, never aborts. The
        # batch is staged ONCE outside the loop — a lost race costs one
        # manifest read + one link syscall, no data rewrite.
        new_files: list | None = None
        for _ in range(20):
            # Resolve the previous snapshot via the latest-committed
            # lookup (never v{batch_id}: batch ids restart at 0 on a
            # fresh checkpoint, and a pre-loaded table may hold several
            # committed snapshots before ingestion starts).
            prev_v, prev_doc = _snap_latest_doc(table)
            prev_txn = prev_doc.get("txn", {})
            if int(prev_txn.get(marker, -1)) >= batch_id:
                # Crash landed between the manifest commit and the
                # watermark advance: the table already holds this batch.
                store.apply_batch(batch_id, [], marker)
                return
            if new_files is None:
                new_files = _snap_add_files(
                    batch_df, table, f"ingest_b{batch_id}"
                )
            if _snap_commit_cas(
                table,
                prev_doc["files"] + new_files,
                prev_v + 1,
                stats=prev_doc.get("stats"),
                txn={**prev_txn, marker: batch_id},
                dv=prev_doc.get("dv"),
            ):
                store.apply_batch(batch_id, [], marker)
                return
        raise RuntimeError(
            f"ingest sink lost 20 consecutive commit races on {table}"
        )

    return sink


@query(
    "q_stream_table_ingest",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def stream_table_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingestion INTO the atomic-manifest snapshot table —
    the capstone that composes q_table_snapshot_read's commit protocol
    with the module's exactly-once discipline: history lands as
    snapshot v0, then the delta streams in two micro-batches and each
    ``foreachBatch`` (1) appends the batch as new uuid data files —
    invisible until committed, (2) commits manifest
    v{batch+1} = previous committed list + the new files (fsync +
    os.replace — O(1) regardless of table size, no data rewritten),
    and (3) advances the KVStore batch watermark. Replayed batch ids
    return before writing anything (exactly-once); a crash between the
    file-append and the manifest commit strands orphan files that the
    manifest contract already keeps invisible, and the replay re-adds
    and commits — the same crash algebra as the MV merges, now at FILE
    grain. The registered frame reads the final committed snapshot and
    rolls it up per event type; the oracle is the batch rollup over
    ALL events — streamed ingestion must converge to the batch answer
    regardless of batch boundaries (stream≡batch), and any reader that
    saw orphans or torn manifests would hash-mismatch.

    Scale shape: per batch, only batch rows are written (one
    partitionless parquet write), the commit is one manifest rename,
    and nothing existing is rewritten — O(batch) forever, the Delta/
    Iceberg streaming-sink economics. Replay idempotence and
    crash-window behavior pinned in tests/test_streaming.py."""
    import glob
    import json
    import os
    import shutil
    import time

    from steaminganalysis_spark.operators.storage import (
        MV_CUTOFF,
        _snap_add_files,
        _snap_commit,
        _snap_read,
    )
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_ingest")
    table = os.path.join(tmp, "table")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    cut = F.to_timestamp(F.lit(MV_CUTOFF))
    base_files = _snap_add_files(
        ev.filter(F.col("ts") < cut), table, "ingest_base"
    )
    _snap_commit(table, base_files, 0)
    # the delta replayed as two time-ordered micro-batch files (the
    # shared mtime-forced harness pattern)
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    delta = ev.filter(F.col("ts") >= cut)
    now = time.time()
    for i, part in enumerate(
        (
            delta.filter(F.col("ts") < F.lit(MV_MID).cast("timestamp")),
            delta.filter(F.col("ts") >= F.lit(MV_MID).cast("timestamp")),
        )
    ):
        d = os.path.join(tmp, f"b{i}")
        part.coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))

    store_name = f"stream_ingest_{run}"
    marker = f"{KEY_PREFIX}ingest-last-applied:{run}"
    sink = snapshot_ingest_sink(table, store_name, marker)
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp, f"ckpt_{run}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = (
        _snap_read(spark, table)  # latest committed snapshot
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)  # detach before scratch cleanup
    )
    KVStore.reset(store_name)
    return out


# ------------------ streaming CDC MERGE into the snapshot table (r12)


def snapshot_cdc_merge_sink(table: str, store_name: str, marker: str):
    """foreachBatch sink applying a CDC micro-batch (op = 'U' update /
    'I' insert) to the atomic-manifest snapshot table as a file-grain
    copy-on-write MERGE, exactly once: (1) the replayed-batch guard
    returns before writing; (2) matched-file classification reads the
    MANIFEST STATS only — files whose recorded event_id span misses
    the batch's update-key range are never opened (stats-less files
    conservatively rewrite); (3) matched files rewrite with the
    update applied via a broadcast of the MICRO-BATCH-sized update
    side (the table side streams); (4) inserts land as new files;
    (5) the successor manifest = untouched-by-name + rewritten +
    inserted commits via CAS, CARRYING surviving files' stats forward
    (else pruning degrades to full rewrites after one commit); (6) the
    KVStore watermark advances LAST — the ingest sink's crash algebra
    at MERGE grain, including the manifest ``txn`` marker map that
    makes a commit-then-crash replay advance the watermark instead of
    re-merging its own committed batch (ADVICE r12). Deletes are
    deliberately out of scope here: the
    repo handles them as deletion vectors (q_merge_deletion_vector,
    merge-on-read) — rewriting files for scattered deletes is the
    anti-pattern. Module-level so the replay/crash/pruning pins in
    tests/test_streaming.py drive it directly."""
    import os

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files_with_stats,
        _snap_commit_cas,
        _snap_latest_doc,
    )
    from steaminganalysis_spark.streaming.sinks import KVStore

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        store = KVStore.instance(store_name)
        if batch_id <= store.last_applied(marker):
            return  # replayed, already-committed batch: exactly-once
        _pv, _pdoc = _snap_latest_doc(table)
        _ptxn = _pdoc.get("txn", {})
        if int(_ptxn.get(marker, -1)) >= batch_id:
            # commit-then-crash replay (ADVICE r12): the manifest txn
            # map shows this batch already merged — advance only.
            store.apply_batch(batch_id, [], marker)
            return
        ups = batch_df.filter(F.col("op") == "U").select("event_id", "value")
        ins = batch_df.filter(F.col("op") == "I").select(
            "event_id", "event_type", "value"
        )
        prev_v, prev_files, prev_stats = _pv, _pdoc["files"], _pdoc.get("stats", {})
        matched: list[str] = []
        new_files: list[str] = []
        new_stats: dict = {}
        bounds = ups.agg(
            F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
        ).first()
        if bounds.lo is not None:
            matched = [
                f
                for f in prev_files
                if f not in prev_stats
                or "event_id" not in prev_stats[f]
                or (
                    prev_stats[f]["event_id"][0] <= bounds.hi
                    and bounds.lo <= prev_stats[f]["event_id"][1]
                )
            ]
        if matched:
            ddir = os.path.join(table, "data")
            u = ups.withColumnRenamed("value", "_new_value")
            rewritten = (
                batch_df.sparkSession.read.parquet(
                    *[os.path.join(ddir, f) for f in matched]
                )
                .join(F.broadcast(u), "event_id", "left")
                .select(
                    "event_id",
                    "event_type",
                    F.coalesce("_new_value", "value").alias("value"),
                )
            )
            rw, rw_stats = _snap_add_files_with_stats(
                rewritten, table, f"cdc_rw_b{batch_id}", ["event_id"]
            )
            new_files += rw
            new_stats.update(rw_stats)
        if ins.take(1):
            ins_files, ins_stats = _snap_add_files_with_stats(
                ins, table, f"cdc_ins_b{batch_id}", ["event_id"]
            )
            new_files += ins_files
            new_stats.update(ins_stats)
        untouched = [f for f in prev_files if f not in matched]
        stats = {f: prev_stats[f] for f in untouched if f in prev_stats}
        stats.update(new_stats)
        if not _snap_commit_cas(
            table,
            untouched + new_files,
            prev_v + 1,
            stats,
            txn={**_ptxn, marker: batch_id},
        ):
            raise RuntimeError("single-writer CDC merge lost a CAS race")
        store.apply_batch(batch_id, [], marker)

    return sink


@query(
    "q_stream_table_cdc_merge",
    oracle="""
    WITH mx AS (SELECT MAX(event_id) AS m FROM events),
    final AS (
      SELECT event_id, event_type,
             value + CASE WHEN event_id <= (SELECT m // 8 FROM mx) THEN 100.0
                          WHEN event_id <= (SELECT m // 4 FROM mx) THEN 7.0
                          ELSE 0.0 END AS value
      FROM events WHERE event_id % 10 < 8
      UNION ALL
      SELECT event_id, event_type, value FROM events WHERE event_id % 10 >= 8
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           (CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
             AS DOUBLE) / 100.0) AS total_value,
           CAST(COUNT(CASE WHEN event_id % 10 >= 8 THEN 1 END) AS BIGINT)
             AS n_inserted
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def stream_table_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC MERGE into the snapshot table — the write-path
    capstone composing q_table_merge_snapshot's file-grain
    copy-on-write with the streaming exactly-once discipline, and the
    first consumer of the r12 manifest stats on the WRITE path:
    per micro-batch, matched-file classification reads the committed
    manifest's per-file event_id bounds (no file opens), only
    span-intersecting files rewrite with the update applied (the
    update side — micro-batch-sized by construction — broadcasts;
    the table side streams), inserts append as new files, and the
    successor manifest CAS-commits carrying surviving stats forward
    so the NEXT batch still prunes. Harness: base = events with
    event_id % 10 < 8, range-clustered into 8 stats-committed files;
    batch 0 = updates over [0, max/8] (value += 100) + inserts
    (% 10 == 8); batch 1 = updates over (max/8, max/4] (value += 7) +
    inserts (% 10 == 9). The oracle states the merged end state from
    the raw table — a dropped carry-through row, a double-applied
    replayed update, or an un-applied boundary file hash-mismatches.
    Replay strict-no-op, crash-window, and stats-carry-forward
    pruning pins in tests/test_streaming.py.

    Scale shape: per batch — one manifest read, O(matched files)
    rewrite (bounded by batch key locality, not table size; the CDC
    batch is small so its key range is narrow on a range-clustered
    table), one broadcast of batch-sized updates, one CAS rename.
    Deletes stay deletion-vector-shaped (q_merge_deletion_vector) —
    COW for scattered deletes is the anti-pattern."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files_with_stats,
        _snap_commit_stats,
        _snap_read,
    )
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_cdc_merge")
    table = os.path.join(tmp, "table")
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    base = ev.filter(F.expr("event_id % 10 < 8"))
    files, stats = _snap_add_files_with_stats(
        base.repartitionByRange(8, "event_id").sortWithinPartitions("event_id"),
        table,
        "cdc_base",
        ["event_id"],
    )
    _snap_commit_stats(table, files, 0, stats)
    m = int(ev.agg(F.max("event_id")).first()[0])
    cut1, cut2 = m // 8, m // 4

    def cdc_batch(upd_filter: str, bump: float, ins_filter: str) -> DataFrame:
        u = ev.filter(F.expr("event_id % 10 < 8")).filter(
            F.expr(upd_filter)
        ).select(
            "event_id",
            "event_type",
            (F.col("value") + F.lit(bump)).alias("value"),
            F.lit("U").alias("op"),
        )
        i = ev.filter(F.expr(ins_filter)).select(
            "event_id", "event_type", "value", F.lit("I").alias("op")
        )
        return u.unionByName(i)

    src = os.path.join(tmp, "src")
    os.makedirs(src)
    now = time.time()
    batches = (
        cdc_batch(f"event_id <= {cut1}", 100.0, "event_id % 10 = 8"),
        cdc_batch(
            f"event_id > {cut1} AND event_id <= {cut2}", 7.0,
            "event_id % 10 = 9",
        ),
    )
    for i, part in enumerate(batches):
        d = os.path.join(tmp, f"b{i}")
        part.coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))

    store_name = f"stream_cdc_{run}"
    marker = f"{KEY_PREFIX}cdc-last-applied:{run}"
    sink = snapshot_cdc_merge_sink(table, store_name, marker)
    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double, op string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp, f"ckpt_{run}"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = (
        _snap_read(spark, table)  # latest committed = post-merge
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            (
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5))
                    .cast("long")
                    .cast("decimal(38,0)")
                ).cast("double")
                / F.lit(100.0)
            ).alias("total_value"),
            F.count(
                F.when(F.col("event_id") % 10 >= 8, 1)
            ).cast("long").alias("n_inserted"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)  # detach before scratch cleanup
    )
    KVStore.reset(store_name)
    return out


# ------- streaming schema evolution on table ingest (r13)


def snapshot_ingest_schema_sink(table: str, store_name: str, marker: str):
    """foreachBatch sink appending micro-batches to the SCHEMA-TRACKED
    snapshot table exactly once — the ingest sink's crash algebra
    (replay guard, files→manifest→watermark ordering, manifest txn
    map) composed with commit-time schema enforcement: every batch's
    freshly-written files are footer-validated against the manifest's
    CURRENT declared schema before the commit — a rogue batch
    carrying an undeclared or type-conflicting column raises BEFORE
    any manifest lands (its files stay invisible orphans, the
    watermark does not advance, and the streaming query surfaces the
    failure), so a producer deploy that widens the payload cannot
    tear the table hours later at read time. The batch is validated
    against whatever schema is COMMITTED when it arrives — evolving
    the schema between batches (or across a stream restart) is one
    metadata commit, after which NULL-fill reads serve the
    pre-evolution batches. Module-level so the rejection/replay pins
    in tests/test_streaming.py drive it directly."""
    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_commit_schema,
        _snap_latest_doc,
    )
    from steaminganalysis_spark.streaming.sinks import KVStore

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        store = KVStore.instance(store_name)
        if batch_id <= store.last_applied(marker):
            return  # replayed, already-committed batch: exactly-once
        prev_v, prev_doc = _snap_latest_doc(table)
        prev_txn = prev_doc.get("txn", {})
        if int(prev_txn.get(marker, -1)) >= batch_id:
            # commit-then-crash replay: the table already holds this
            # batch — re-advance the watermark only
            store.apply_batch(batch_id, [], marker)
            return
        schema = [tuple(p) for p in prev_doc["schema"]]
        new_files = _snap_add_files(batch_df, table, f"evoing_b{batch_id}")
        _snap_commit_schema(  # raises on rogue/conflicting columns
            table,
            prev_doc["files"] + new_files,
            prev_v + 1,
            schema,
            new_files=new_files,
            txn={**prev_txn, marker: batch_id},
        )
        store.apply_batch(batch_id, [], marker)

    return sink


@query(
    "q_stream_table_schema_evolution",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           CAST(COUNT(CASE WHEN ts >= TIMESTAMP '{MV_MID} 00:00:00'
                           THEN 1 END) AS BIGINT) AS n_day_values,
           MAX(CASE WHEN ts >= TIMESTAMP '{MV_MID} 00:00:00'
                    THEN strftime(ts, '%Y-%m-%d') END) AS max_day
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def stream_table_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MID-STREAM SCHEMA EVOLUTION on snapshot-table ingest (VERDICT
    r12 order #6) — q_stream_table_ingest composed with
    q_table_schema_evolution: history lands as schema-tracked v0
    (event_id, event_type, value); micro-batch 0 streams in under
    that schema; the table then evolves — ONE metadata commit adds
    ``day``, no file rewritten — and the stream RESUMES from the same
    checkpoint with the widened source, so micro-batch 1 commits
    4-column files under the evolved schema (the
    producer-redeploy-with-wider-payload lifecycle, exactly-once
    across the restart). Both rejection fault-injections run LIVE
    against the real sink: before the evolution, a batch already
    carrying ``day`` must reject at commit (undeclared column — the
    footer check, not a read-time surprise), and after it a batch
    whose ``day`` is typed double must reject (type conflict); each
    leaves orphan files, no manifest, and an unmoved watermark, and
    the in-stream failure surfaces through the streaming query. The
    frame reads the evolved table with NULL-fill (pre-evolution rows
    have day IS NULL) and rolls up per event type counting and
    MAX-ing the day values; the oracle states the same from raw
    events — a dropped pre-evolution batch, a leaked rogue column, a
    mis-NULL-fill, or a double-committed batch 1 hash-mismatches
    (stream≡batch).

    Scale shape: evolution is one manifest rename regardless of table
    size; per-batch validation is O(batch files) footer reads; the
    read projects the manifest's declared columns so parquet column
    pruning reaches every file. Rejection and commit-then-crash
    replay pins in tests/test_streaming.py."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.operators.storage import (
        MV_CUTOFF,
        _snap_add_files,
        _snap_commit_schema,
        _snap_latest_doc,
        _snap_read_schema,
    )
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_evo")
    table = os.path.join(tmp, "table")
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    cut = F.to_timestamp(F.lit(MV_CUTOFF))
    mid = F.to_timestamp(F.lit(MV_MID))
    schema_v0 = [
        ("event_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
    ]
    base = _snap_add_files(
        ev.filter(F.col("ts") < cut).select("event_id", "event_type", "value"),
        table,
        "evo_hist",
    )
    _snap_commit_schema(table, base, 0, schema_v0, new_files=base)

    src = os.path.join(tmp, "src")
    os.makedirs(src)
    store_name = f"stream_evo_{run}"
    marker = f"{KEY_PREFIX}evoing-last-applied:{run}"
    sink = snapshot_ingest_schema_sink(table, store_name, marker)
    ckpt = os.path.join(tmp, f"ckpt_{run}")

    def _drop(df: DataFrame, name: str, i: float) -> None:
        d = os.path.join(tmp, name)
        df.coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"{name}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        now = time.time()
        os.utime(dst, (now + i, now + i))

    def _segment(read_schema: str) -> None:
        q = (
            spark.readStream.schema(read_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
            if q.exception():
                raise RuntimeError(str(q.exception()))
        finally:
            q.stop()

    # segment 1: batch 0 under the original schema
    _drop(
        ev.filter((F.col("ts") >= cut) & (F.col("ts") < mid)).select(
            "event_id", "event_type", "value"
        ),
        "b0",
        0.0,
    )
    _segment("event_id long, event_type string, value double")

    # rejection #1 (pre-evolution): a batch already carrying `day` —
    # undeclared column, must fail at commit with nothing visible
    v_before, doc_before = _snap_latest_doc(table)
    store = KVStore.instance(store_name)
    wm_before = store.last_applied(marker)
    rogue = ev.filter(F.col("ts") >= mid).limit(10).select(
        "event_id",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    try:
        sink(rogue, wm_before + 1)
        raise RuntimeError("pre-evolution rogue batch was accepted")
    except ValueError:
        pass
    v_after, _doc = _snap_latest_doc(table)
    if v_after != v_before or store.last_applied(marker) != wm_before:
        raise RuntimeError("rejected batch moved the table or watermark")

    # the evolution: ONE metadata commit adds `day`
    schema_v1 = schema_v0 + [("day", "string")]
    _snap_commit_schema(
        table,
        doc_before["files"],
        v_before + 1,
        schema_v1,
        new_files=[],
        txn=doc_before.get("txn", {}),
    )

    # rejection #2 (post-evolution): `day` typed double — type conflict
    badtype = ev.filter(F.col("ts") >= mid).limit(10).select(
        "event_id", "event_type", "value", F.lit(1.5).alias("day")
    )
    try:
        sink(badtype, wm_before + 1)
        raise RuntimeError("type-conflicting batch was accepted")
    except ValueError:
        pass

    # segment 2: the stream resumes from the SAME checkpoint with the
    # widened source; batch 1 commits under the evolved schema
    _drop(
        ev.filter(F.col("ts") >= mid).select(
            "event_id",
            "event_type",
            "value",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
        ),
        "b1",
        1.0,
    )
    _segment("event_id long, event_type string, value double, day string")

    out = (
        _snap_read_schema(spark, table)  # evolved read, NULL-filled
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("total_cents"),
            F.count("day").cast("long").alias("n_day_values"),
            F.max("day").alias("max_day"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)  # detach before scratch cleanup
    )
    KVStore.reset(store_name)
    return out


# ------- partition-aware streaming table ingest (r13)

from steaminganalysis_spark.operators.storage import (  # noqa: E402
    MV_CUTOFF as MV_CUTOFF_LIT,
)


def snapshot_ingest_partitioned_sink(
    table: str, store_name: str, marker: str, spec: list[str]
):
    """foreachBatch sink appending micro-batches to the
    PARTITION-AWARE snapshot table exactly once: each batch writes
    Hive-partitioned by ``spec``, the new files' partition tuples
    join the manifest's carried-forward tuple map, and the commit
    rides the same txn idempotency algebra as the other snapshot
    sinks (replay guard → files → manifest → watermark). This is the
    reference's day-bucketed output model (KafkaApp.scala:58-60 keys
    results by the date substring) elevated to streaming TABLE
    layout: a dashboard's day-range query prunes at manifest grain
    against data that arrived seconds ago. Module-level so the
    replay/tuple-carry pins in tests/test_streaming.py drive it
    directly."""
    from steaminganalysis_spark.operators.storage import (
        _snap_add_files_partitioned,
        _snap_commit_partitioned,
        _snap_latest_doc,
    )
    from steaminganalysis_spark.streaming.sinks import KVStore

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        store = KVStore.instance(store_name)
        if batch_id <= store.last_applied(marker):
            return  # replayed, already-committed batch: exactly-once
        prev_v, prev_doc = _snap_latest_doc(table)
        prev_txn = prev_doc.get("txn", {})
        if int(prev_txn.get(marker, -1)) >= batch_id:
            store.apply_batch(batch_id, [], marker)
            return
        new_files, new_parts = _snap_add_files_partitioned(
            batch_df, table, f"pingest_b{batch_id}", spec
        )
        _snap_commit_partitioned(
            table,
            prev_doc["files"] + new_files,
            prev_v + 1,
            spec,
            {**prev_doc.get("partitions", {}), **new_parts},
            txn={**prev_txn, marker: batch_id},
        )
        store.apply_batch(batch_id, [], marker)

    return sink


@query(
    "q_stream_table_partition_ingest",
    oracle=f"""
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') >= '{MV_CUTOFF_LIT}'
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def stream_table_partition_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest into the PARTITION-AWARE snapshot table
    (r13) — q_stream_table_ingest composed with
    q_table_partition_pruning: history lands as day-partitioned v0,
    the delta streams in two micro-batches, and every batch's files
    enter the manifest WITH their day tuples (one partitioned write +
    one metadata commit per batch — day-grain ingestion commits only
    that batch's days). The registered read then answers the
    dashboard question — the days from the streaming cutoff on — by
    MANIFEST-grain partition pruning: it must plan exactly the
    delta's files (every history file prunes away without a listing
    or a footer read, asserted live) even though those files were
    committed by a stream seconds earlier. The oracle states the
    day-range rollup from raw events — a dropped batch, a
    mis-attached tuple, or an over-pruned file hash-mismatches
    (stream≡batch).

    Scale shape: per batch, O(batch) write + one manifest rename; the
    tuple map adds O(files) metadata; the day-range read unions one
    scan per planned day — bounded by the predicate, not the table's
    history. The reference's day-bucketed rollup (KafkaApp.scala:
    58-60), as streaming table layout. Replay idempotence and tuple
    carry-forward pinned in tests/test_streaming.py."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.operators.storage import (
        MV_CUTOFF,
        _snap_add_files_partitioned,
        _snap_commit_partitioned,
        _snap_latest_doc,
        snap_read_partition_pruned,
    )
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_pingest")
    table = os.path.join(tmp, "table")
    spec = ["day"]
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "event_type",
        "value",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    cut = F.to_timestamp(F.lit(MV_CUTOFF))
    mid = F.to_timestamp(F.lit(MV_MID))
    base, base_parts = _snap_add_files_partitioned(
        ev.filter(F.col("ts") < cut).drop("ts"), table, "pingest_base", spec
    )
    _snap_commit_partitioned(table, base, 0, spec, base_parts)

    src = os.path.join(tmp, "src")
    os.makedirs(src)
    delta = ev.filter(F.col("ts") >= cut).drop("ts")
    now = time.time()
    for i, part in enumerate(
        (
            ev.filter((F.col("ts") >= cut) & (F.col("ts") < mid)).drop("ts"),
            ev.filter(F.col("ts") >= mid).drop("ts"),
        )
    ):
        d = os.path.join(tmp, f"b{i}")
        part.coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))

    store_name = f"stream_pingest_{run}"
    marker = f"{KEY_PREFIX}pingest-last-applied:{run}"
    sink = snapshot_ingest_partitioned_sink(table, store_name, marker, spec)
    q = (
        spark.readStream.schema(
            "event_id long, event_type string, value double, day string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp, f"ckpt_{run}"))
        .start()
    )
    try:
        q.processAllAvailable()
        if q.exception():
            raise RuntimeError(str(q.exception()))
    finally:
        q.stop()

    # the dashboard read: cutoff-onward days, pruned at manifest grain
    days = {
        r[0]
        for r in delta.select("day").distinct().collect()
    }
    got, planned, total = snap_read_partition_pruned(spark, table, "day", days)
    _v, doc = _snap_latest_doc(table)
    parts = doc["partitions"]
    expect = sorted(f for f in doc["files"] if parts[f]["day"] in days)
    if sorted(planned) != expect:
        raise RuntimeError(
            f"pruned plan {len(planned)} files, expected {len(expect)}"
        )
    if set(planned) & set(base):
        raise RuntimeError("a history file survived day pruning")
    if len(planned) >= total:
        raise RuntimeError("day predicate failed to prune history")

    out = (
        got.groupBy("event_type", "day")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("total_cents"),
        )
        .orderBy("event_type", "day")
        .localCheckpoint(eager=True)  # detach before scratch cleanup
    )
    KVStore.reset(store_name)
    return out



# ------- streaming CDC with merge-on-read deletes (r13)


def snapshot_cdc_dv_sink(table: str, store_name: str, marker: str):
    """foreachBatch sink applying a FULL CDC micro-batch — op = 'U'
    update / 'I' insert / 'D' delete — to the snapshot table, with
    each op taking its economically-correct path in ONE atomic
    commit: updates copy-on-write only span-matched files (the
    q_stream_table_cdc_merge algebra — micro-batch side broadcast,
    stats carried), inserts append as new files, and DELETES take the
    merge-on-read path (q_table_merge_dv): an O(delete keys)
    equality-delete file scoped to the untouched files it hits —
    scattered streaming deletes never trigger rewrites. Cross-op
    folding keeps the commit consistent: a rewrite folds in BOTH the
    rewritten files' existing DVs (delete debt compacts) and the SAME
    batch's deletes hitting those files (a delete and an update of
    one key in one batch = delete wins, never a resurrected row). The
    usual exactly-once algebra applies (replay guard, txn map,
    files → manifest → watermark). Module-level so the fold/replay
    pins in tests/test_streaming.py drive it directly."""
    import os

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_add_files_with_stats,
        _snap_commit_cas,
        _snap_latest_doc,
    )
    from steaminganalysis_spark.streaming.sinks import KVStore

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        store = KVStore.instance(store_name)
        if batch_id <= store.last_applied(marker):
            return  # replayed, already-committed batch: exactly-once
        prev_v, doc = _snap_latest_doc(table)
        prev_txn = doc.get("txn", {})
        if int(prev_txn.get(marker, -1)) >= batch_id:
            store.apply_batch(batch_id, [], marker)
            return
        files = doc["files"]
        stats = doc.get("stats", {})
        dv_map = {f: list(v) for f, v in doc.get("dv", {}).items()}
        ddir = os.path.join(table, "data")
        spark = batch_df.sparkSession
        fname = F.element_at(F.split(F.input_file_name(), "/"), -1)

        ups = batch_df.filter(F.col("op") == "U").select("event_id", "value")
        ins = batch_df.filter(F.col("op") == "I").select(
            "event_id", "event_type", "value"
        )
        dels = batch_df.filter(F.col("op") == "D").select("event_id").distinct()

        def span_matched(names: list[str], bounds) -> list[str]:
            if bounds.lo is None:
                return []
            return [
                f
                for f in names
                if f not in stats
                or "event_id" not in stats[f]
                or (
                    stats[f]["event_id"][0] <= bounds.hi
                    and bounds.lo <= stats[f]["event_id"][1]
                )
            ]

        ub = ups.agg(
            F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
        ).first()
        matched = span_matched(files, ub)

        new_files: list[str] = []
        new_stats: dict = {}
        if matched:
            rewritten = (
                spark.read.parquet(*[os.path.join(ddir, f) for f in matched])
                .join(
                    F.broadcast(ups.withColumnRenamed("value", "_new_value")),
                    "event_id",
                    "left",
                )
                .select(
                    "event_id",
                    "event_type",
                    F.coalesce("_new_value", "value").alias("value"),
                )
                # fold the SAME batch's deletes: delete wins over update
                .join(F.broadcast(dels), "event_id", "left_anti")
            )
            old_dv = sorted({d for f in matched for d in dv_map.get(f, [])})
            if old_dv:  # fold the rewritten files' existing DVs
                pairs = (
                    spark.read.parquet(
                        *[os.path.join(ddir, d) for d in old_dv]
                    )
                    .filter(F.col("target_file").isin(matched))
                    .select(F.col("key").alias("event_id"))
                )
                rewritten = rewritten.join(
                    F.broadcast(pairs), "event_id", "left_anti"
                )
            rw, rw_stats = _snap_add_files_with_stats(
                rewritten, table, f"cdcdv_rw_b{batch_id}", ["event_id"]
            )
            new_files += rw
            new_stats.update(rw_stats)
            for f in matched:
                dv_map.pop(f, None)  # their debt was folded in

        untouched = [f for f in files if f not in matched]
        db = dels.agg(
            F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
        ).first()
        del_targets = span_matched(untouched, db)
        if del_targets:
            hits = (
                spark.read.parquet(
                    *[os.path.join(ddir, f) for f in del_targets]
                )
                .select("event_id")
                .withColumn("target_file", fname)
                .join(F.broadcast(dels), "event_id")
                .select("target_file", F.col("event_id").alias("key"))
            )
            dv_files = _snap_add_files(
                hits.coalesce(1), table, f"cdcdv_dv_b{batch_id}"
            )
            if dv_files:
                covered = {
                    r.target_file
                    for r in hits.select("target_file").distinct().collect()
                }
                for f in covered:
                    dv_map[f] = dv_map.get(f, []) + dv_files

        if ins.take(1):
            ins_files, ins_stats = _snap_add_files_with_stats(
                ins, table, f"cdcdv_ins_b{batch_id}", ["event_id"]
            )
            new_files += ins_files
            new_stats.update(ins_stats)

        successor_stats = {f: stats[f] for f in untouched if f in stats}
        successor_stats.update(new_stats)
        if not _snap_commit_cas(
            table,
            untouched + new_files,
            prev_v + 1,
            stats=successor_stats,
            txn={**prev_txn, marker: batch_id},
            dv=dv_map,
        ):
            raise RuntimeError("single-writer CDC-DV merge lost a CAS race")
        store.apply_batch(batch_id, [], marker)

    return sink


CDC_DV_OFFSET = 2_000_000_000  # re-key offset for CDC-DV inserts


@query(
    "q_stream_table_cdc_dv",
    oracle=f"""
    WITH mx AS (SELECT MAX(event_id) AS m FROM events),
    merged AS (
      SELECT event_id, event_type,
             CASE WHEN event_id <= (SELECT m // 8 FROM mx)
                  THEN value + 5.0
                  WHEN event_id <= (SELECT m // 4 FROM mx)
                  THEN value + 7.0
                  ELSE value END AS value
      FROM events
      WHERE NOT (event_id > (SELECT m // 4 FROM mx)
                 AND (event_id % 173 = 0 OR event_id % 191 = 0))
      UNION ALL
      SELECT event_id + {CDC_DV_OFFSET}, event_type, value
      FROM events WHERE event_id % 89 = 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {SQL_DSUM("value")} AS total_value,
           CAST(COUNT(CASE WHEN event_id >= {CDC_DV_OFFSET} THEN 1 END)
                AS BIGINT) AS n_inserted
    FROM merged GROUP BY 1 ORDER BY 1
    """,
)
def stream_table_cdc_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC with MERGE-ON-READ DELETES — the completion
    q_stream_table_cdc_merge deliberately deferred ("deletes stay
    deletion-vector-shaped"): two CDC micro-batches carry U/I/D ops
    and each op takes its economically-correct path inside ONE atomic
    commit per batch — updates copy-on-write span-matched files,
    inserts append, deletes write O(keys) equality-delete files
    scoped to the untouched files they hit (zero rewrites for
    scattered deletes, the whole point). Batch 0: +5 on the lowest
    span, %173 deletes above the update range, even-half inserts;
    batch 1: +7 on the next span, %191 deletes, odd-half inserts —
    so the final table interleaves COW rewrites, accumulated DV
    files, and appends across two commits, and the registered
    merge-on-read read (one broadcast anti-join) must reproduce the
    batch-stated MERGE semantics exactly (stream≡batch oracle): a
    resurrected deleted row, an unapplied second-batch update, a DV
    applied to the wrong file, or a double-applied replay
    hash-mismatches.

    Scale shape: per batch — O(matched files) rewrite bounded by the
    update keys' locality, O(delete keys) DV write with NO rewrite,
    O(batch) insert write, one CAS rename; the table side never
    shuffles (both the update and delete sides broadcast at
    micro-batch size). Same-batch delete-beats-update and
    DV-fold-into-rewrite pins in tests/test_streaming.py."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files_with_stats,
        _snap_commit,
        snap_read_mor,
    )
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_cdcdv")
    table = os.path.join(tmp, "table")
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    base, bstats = _snap_add_files_with_stats(
        ev.repartitionByRange(8, "event_id").sortWithinPartitions("event_id"),
        table,
        "cdcdv_base",
        ["event_id"],
    )
    _snap_commit(table, base, 0, stats=bstats)
    m = int(ev.agg(F.max("event_id")).first()[0])

    def cdc_batch(i: int) -> DataFrame:
        lo, hi, bump, dmod, par = (
            (-1, m // 8, 5.0, 173, 0)  # lo exclusive: -1 admits id 0
            if i == 0
            else (m // 8, m // 4, 7.0, 191, 1)
        )
        ups = (
            ev.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi))
            .select(
                F.lit("U").alias("op"),
                "event_id",
                "event_type",
                (F.col("value") + F.lit(bump)).alias("value"),
            )
        )
        dels = (
            ev.filter(
                (F.col("event_id") > m // 4)
                & (F.col("event_id") % dmod == 0)
            )
            .select(
                F.lit("D").alias("op"),
                "event_id",
                "event_type",
                "value",
            )
        )
        ins = (
            ev.filter(
                (F.expr("event_id % 89 = 0")) & (F.col("event_id") % 2 == par)
            )
            .select(
                F.lit("I").alias("op"),
                (F.col("event_id") + F.lit(CDC_DV_OFFSET)).alias("event_id"),
                "event_type",
                "value",
            )
        )
        return ups.unionByName(dels).unionByName(ins)

    src = os.path.join(tmp, "src")
    os.makedirs(src)
    now = time.time()
    for i in (0, 1):
        d = os.path.join(tmp, f"b{i}")
        cdc_batch(i).coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))

    store_name = f"stream_cdcdv_{run}"
    marker = f"{KEY_PREFIX}cdcdv-last-applied:{run}"
    sink = snapshot_cdc_dv_sink(table, store_name, marker)
    q = (
        spark.readStream.schema(
            "op string, event_id long, event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(tmp, f"ckpt_{run}"))
        .start()
    )
    try:
        q.processAllAvailable()
        if q.exception():
            raise RuntimeError(str(q.exception()))
    finally:
        q.stop()

    out = (
        snap_read_mor(spark, table, "event_id")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            dsum(F.col("value")).alias("total_value"),
            F.count(
                F.when(F.col("event_id") >= CDC_DV_OFFSET, 1)
            ).cast("long").alias("n_inserted"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)  # detach before scratch cleanup
    )
    KVStore.reset(store_name)
    return out


# ---------- the snapshot table as a STREAMING SOURCE (CDF, r13)


def table_cdf_consumer_step(
    spark: SparkSession,
    src_table: str,
    mv_table: str,
    version: int,
    key_col: str,
    store_name: str,
    marker: str,
    crash_before_watermark: bool = False,
) -> str:
    """Consume ONE committed source version as one micro-batch — the
    Delta/Iceberg "table as streaming source" contract (one batch per
    commit, offsets = snapshot versions) — applying its change-data
    -feed to a downstream MV table exactly once. The consumer-side
    crash algebra mirrors snapshot_ingest_sink's (ADVICE r12), one
    level up the pipeline: (1) the KVStore watermark guard skips
    versions already fully consumed; (2) the MV table's own manifest
    ``txn`` marker detects a crash that landed BETWEEN the MV commit
    and the watermark advance — the replay re-advances the watermark
    WITHOUT committing a duplicate MV successor (double-applying a
    signed delta is silent data corruption, not just extra rows);
    (3) the signed-delta application itself is the q_table_mv_from_cdf
    refresh (insert/update_postimage add, delete/update_preimage
    subtract — integer-cent monoids, exact); (4) the watermark
    advances LAST. Returns which arm ran ('applied' /
    'skipped-watermark' / 'skipped-txn') so harnesses and pins can
    assert the exact path. ``crash_before_watermark`` injects the
    crash window.

    Scale shape: each step reads O(changed files) via snap_diff's
    manifest-grain cancellation, aggregates O(changed rows) deltas
    with map-side combine, and commits an O(groups) MV — a 100 TB
    source table whose commit touched 0.1% of files costs the
    consumer 0.1% of a scan, forever, with no change journal written
    by the producer."""
    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_commit_cas,
        _snap_latest_doc,
        _snap_read,
        snap_diff,
    )
    from steaminganalysis_spark.registry import to_cents
    from steaminganalysis_spark.streaming.sinks import KVStore

    store = KVStore.instance(store_name)
    if version <= store.last_applied(marker):
        return "skipped-watermark"
    mv_v, mv_doc = _snap_latest_doc(mv_table)
    mv_txn = mv_doc.get("txn", {})
    if int(mv_txn.get(marker, -1)) >= version:
        # crash landed between the MV commit and the watermark
        # advance: the MV already holds this version's delta
        store.apply_batch(version, [], marker)
        return "skipped-txn"

    diff = snap_diff(spark, src_table, version - 1, version, key_col)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = diff.groupBy("event_type").agg(
        F.sum(sign).cast("long").alias("d_rows"),
        F.sum(sign * to_cents(F.col("value"))).cast("long").alias("d_cents"),
    )
    mv1 = (
        _snap_read(spark, mv_table, mv_v)
        .join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n_rows", F.lit(0)) + F.coalesce("d_rows", F.lit(0)))
            .alias("n_rows"),
            (F.coalesce("cents", F.lit(0)) + F.coalesce("d_cents", F.lit(0)))
            .alias("cents"),
        )
        .filter(F.col("n_rows") > 0)
        .coalesce(1)
    )
    files = _snap_add_files(mv1, mv_table, f"cdf_v{version}")
    # CAS, not os.replace: the MV table has exactly one writer (this
    # consumer), so a lost race means a misconfigured second consumer
    # — fail loudly rather than clobber its commit.
    if not _snap_commit_cas(
        mv_table, files, mv_v + 1, txn={**mv_txn, marker: version}
    ):
        raise RuntimeError(
            f"MV table {mv_table} has a concurrent writer (CAS lost)"
        )
    if crash_before_watermark:
        return "applied"  # harness-injected crash: watermark NOT advanced
    store.apply_batch(version, [], marker)
    return "applied"


@query(
    "q_stream_from_table_cdf",
    oracle=f"""
    WITH mx AS (SELECT MAX(event_id) // 4 AS cut FROM events),
    final AS (
      SELECT event_id, event_type,
             CASE WHEN event_id <= (SELECT cut FROM mx)
                  THEN value + 10.0 ELSE value END AS value
      FROM events
      WHERE NOT (event_id <= (SELECT cut FROM mx)
                 AND event_id % 131 = 0)
      UNION ALL
      SELECT event_id + 1000000000, event_type, value
      FROM events WHERE event_id % 97 = 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {SQL_DSUM("value")} AS total_value
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def stream_from_table_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE SNAPSHOT TABLE AS A STREAMING SOURCE — the read-side twin
    of q_stream_table_ingest, completing the table-format streaming
    loop: a producer commits v0 (history) → v1 (an append) → v2 (a
    COW merge with updates AND deletes), and a downstream consumer
    treats each committed version as ONE micro-batch (offsets =
    snapshot versions — exactly Delta's streaming-source contract),
    deriving the change-data-feed from the manifests alone (no
    journal) and folding signed deltas into an exactly-once MV table.

    The harness drives the full crash algebra live: v1 consumes
    normally; v2's consumption CRASHES between the MV commit and the
    watermark advance; the restart replays v2 and must take the
    manifest-txn skip arm (asserted — a re-apply would double the
    deltas and silently corrupt), leaving exactly three MV commits
    (asserted). Final gates: the MV equals the re-aggregated source
    head row-for-row (exceptAll both ways), and the oracle states the
    post-merge content from raw events — a sign error, a double-
    applied replay, or a missed delete all hash-mismatch.

    Scale: consumer cost per batch is O(changed files + changed rows)
    via manifest-grain diff cancellation — the economics that make
    "stream from the lakehouse table" viable at 100 TB where tailing
    a journal or rescanning snapshots is not. Reference parity: the
    reference's Kafka→rollup pipeline (KafkaApp:44-80) re-expressed
    with the TABLE as the transport."""
    import os

    from steaminganalysis_spark.operators.storage import (
        DIFF_DEL_MOD,
        MERGE_INSERT_OFFSET,
        _snap_add_files,
        _snap_add_files_with_stats,
        _snap_commit,
        _snap_commit_cas,
        _snap_read,
        _snap_versions,
    )
    from steaminganalysis_spark.registry import to_cents
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_cdf_src")
    src = os.path.join(tmp, "src_table")
    mv = os.path.join(tmp, "mv_table")
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")

    # producer: v0 = history, range-clustered with stats
    base, bstats = _snap_add_files_with_stats(
        ev.repartitionByRange(8, "event_id").sortWithinPartitions("event_id"),
        src,
        "cdfsrc_base",
        ["event_id"],
    )
    _snap_commit(src, base, 0, stats=bstats)

    # v1 = append (%97 re-keyed inserts land as new files)
    ins, ins_stats = _snap_add_files_with_stats(
        ev.filter(F.expr("event_id % 97 = 0")).select(
            (F.col("event_id") + F.lit(MERGE_INSERT_OFFSET)).alias("event_id"),
            "event_type",
            "value",
        ),
        src,
        "cdfsrc_ins",
        ["event_id"],
    )
    s1 = dict(bstats)
    s1.update(ins_stats)
    if not _snap_commit_cas(src, base + ins, 1, stats=s1):
        raise RuntimeError("single-writer CDF harness lost a CAS race (v1)")

    # v2 = COW merge: inside the <= max/4 span, +10 updates and
    # %DIFF_DEL_MOD deletes; only span-matched files rewrite
    cut = int(ev.agg(F.max("event_id")).first()[0]) // 4
    ddir = os.path.join(src, "data")
    matched = [f for f in base if bstats[f]["event_id"][0] <= cut]
    rewritten = (
        spark.read.parquet(*[os.path.join(ddir, f) for f in matched])
        .filter(
            ~(
                (F.col("event_id") <= cut)
                & (F.col("event_id") % DIFF_DEL_MOD == 0)
            )
        )
        .withColumn(
            "value",
            F.when(F.col("event_id") <= cut, F.col("value") + F.lit(10.0))
            .otherwise(F.col("value")),
        )
    )
    rw, rw_stats = _snap_add_files_with_stats(
        rewritten, src, "cdfsrc_rw", ["event_id"]
    )
    untouched = [f for f in base if f not in matched]
    s2 = {f: s1[f] for f in untouched + ins}
    s2.update(rw_stats)
    if not _snap_commit_cas(src, untouched + ins + rw, 2, stats=s2):
        raise RuntimeError("single-writer CDF harness lost a CAS race (v2)")

    # consumer bootstrap: MV v0 materialized from source v0
    marker = f"{KEY_PREFIX}cdf-consumer:{run}"
    store_name = f"stream_cdf_{run}"
    mv0 = (
        _snap_read(spark, src, 0)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(to_cents(F.col("value"))).cast("long").alias("cents"),
        )
        .coalesce(1)
    )
    _snap_commit(mv, _snap_add_files(mv0, mv, "cdfmv_base"), 0, txn={marker: 0})
    KVStore.instance(store_name).apply_batch(0, [], marker)

    # consume v1 normally; v2 crashes between MV commit and watermark
    arms = [
        table_cdf_consumer_step(
            spark, src, mv, 1, "event_id", store_name, marker
        ),
        table_cdf_consumer_step(
            spark,
            src,
            mv,
            2,
            "event_id",
            store_name,
            marker,
            crash_before_watermark=True,
        ),
    ]
    # restart: the watermark still says 1, so v2 replays — and must
    # take the manifest-txn skip arm instead of double-applying
    arms.append(
        table_cdf_consumer_step(
            spark, src, mv, 2, "event_id", store_name, marker
        )
    )
    if arms != ["applied", "applied", "skipped-txn"]:
        raise RuntimeError(f"consumer crash algebra took wrong arms: {arms}")
    if KVStore.instance(store_name).last_applied(marker) != 2:
        raise RuntimeError("replay did not re-advance the watermark")
    if sorted(_snap_versions(mv)) != [0, 1, 2]:
        raise RuntimeError("duplicate or missing MV commit after replay")

    # stream≡batch: the MV equals the re-aggregated source head
    final = _snap_read(spark, mv).localCheckpoint(eager=True)
    reagg = (
        _snap_read(spark, src)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(to_cents(F.col("value"))).cast("long").alias("cents"),
        )
    )
    if final.exceptAll(reagg).take(1) or reagg.exceptAll(final).take(1):
        raise RuntimeError("consumer MV diverged from source re-aggregation")

    out = (
        final.select(
            "event_type",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("cents").cast("double") / 100.0).alias("total_value"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)  # detach before scratch cleanup
    )
    KVStore.reset(store_name)
    return out



# ---------- table-to-table replication via CDF (r13)


@query(
    "q_stream_table_replicate",
    oracle=f"""
    WITH mx AS (SELECT MAX(event_id) // 4 AS cut FROM events),
    final AS (
      SELECT event_id, event_type,
             CASE WHEN event_id <= (SELECT cut FROM mx)
                  THEN value + 10.0 ELSE value END AS value
      FROM events
      WHERE event_id % 131 != 0
      UNION ALL
      SELECT event_id + 1000000000, event_type, value
      FROM events WHERE event_id % 97 = 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {SQL_DSUM("value")} AS total_value,
           CAST(MIN(event_id) AS BIGINT) AS lo_id,
           CAST(MAX(event_id) AS BIGINT) AS hi_id
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def stream_table_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-TO-TABLE REPLICATION VIA THE CHANGE-DATA-FEED — the
    composition the last two table-format waves were building toward:
    the CDF comes OUT of the source through snap_diff (no journal —
    q_table_snapshot_diff's manifest-grain derivation), maps 1:1 onto
    CDC ops (insert→I, update_postimage→U, delete→D; preimages drop),
    and goes INTO the replica through the full-CDC DV sink
    (q_stream_table_cdc_dv's apply: updates COW span-matched files,
    inserts append, deletes take the merge-on-read path) — each source
    version one exactly-once replica commit, version = batch id, the
    sink's replay guard + txn map unchanged. This is lakehouse
    replication (Delta deep-clone-by-CDF / Fivetran-style table sync)
    built ENTIRELY from already-pinned components, which is the point:
    the crash algebra, pruning economics, and write-amplification
    behavior were each proven separately and compose without new
    machinery.

    Live gates: (1) after consuming both versions the replica's
    merge-on-read content equals the source head ROW FOR ROW
    (exceptAll both ways — the replication invariant); (2) a replay of
    the last version leaves the replica manifest byte-identical;
    (3) the replica carries a dv map (the scattered source deletes
    took the DV path — zero rewrite amplification on the replica,
    asserted). The per-type rollup (with id bounds witnessing the
    re-keyed inserts and deletes) hash-checks against the oracle
    stating the source's post-merge content from raw events.

    Scale: per version the replica pays O(diff rows) + O(span-matched
    replica files) — a 100 TB source whose merge touched 0.1% of keys
    replicates for 0.1% of a scan on each side. Reference parity: the
    reference's Kafka relay re-expressed as table→table transport
    (SURVEY §2 B.8 extension)."""
    import json
    import os

    from steaminganalysis_spark.operators.storage import (
        DIFF_DEL_MOD,
        MERGE_INSERT_OFFSET,
        _snap_add_files_with_stats,
        _snap_commit,
        _snap_commit_cas,
        _snap_latest_doc,
        _snap_read,
        snap_diff,
        snap_read_mor,
    )
    from steaminganalysis_spark.registry import dsum
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_replicate")
    src = os.path.join(tmp, "src")
    rep = os.path.join(tmp, "replica")
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")

    # source history: v0 base / v1 append / v2 COW merge (the
    # q_stream_from_table_cdf producer shape)
    base, bstats = _snap_add_files_with_stats(
        ev.repartitionByRange(8, "event_id").sortWithinPartitions("event_id"),
        src,
        "rep_base",
        ["event_id"],
    )
    _snap_commit(src, base, 0, stats=bstats)
    ins, ins_stats = _snap_add_files_with_stats(
        ev.filter(F.expr("event_id % 97 = 0")).select(
            (F.col("event_id") + F.lit(MERGE_INSERT_OFFSET)).alias("event_id"),
            "event_type",
            "value",
        ),
        src,
        "rep_ins",
        ["event_id"],
    )
    s1 = dict(bstats)
    s1.update(ins_stats)
    if not _snap_commit_cas(src, base + ins, 1, stats=s1):
        raise RuntimeError("single-writer replicate harness lost a CAS race")
    cut = int(ev.agg(F.max("event_id")).first()[0]) // 4
    ddir = os.path.join(src, "data")
    # the source v2 merge deletes %DIFF_DEL_MOD keys across the WHOLE
    # base range (so the replica sees deletes both inside and outside
    # its update span — the out-of-span ones must take its DV path)
    # and updates +10 inside the <= cut span; every base file rewrites
    rewritten = (
        spark.read.parquet(*[os.path.join(ddir, f) for f in base])
        .filter(~(F.col("event_id") % DIFF_DEL_MOD == 0))
        .withColumn(
            "value",
            F.when(F.col("event_id") <= cut, F.col("value") + F.lit(10.0))
            .otherwise(F.col("value")),
        )
    )
    rw, rw_stats = _snap_add_files_with_stats(
        rewritten, src, "rep_rw", ["event_id"]
    )
    s2 = {f: s1[f] for f in ins}
    s2.update(rw_stats)
    if not _snap_commit_cas(src, ins + rw, 2, stats=s2):
        raise RuntimeError("single-writer replicate harness lost a CAS race")

    # replica bootstrap = source v0 content in its OWN files
    rfiles, rstats = _snap_add_files_with_stats(
        _snap_read(spark, src, 0)
        .repartitionByRange(8, "event_id")
        .sortWithinPartitions("event_id"),
        rep,
        "rep_boot",
        ["event_id"],
    )
    _snap_commit(rep, rfiles, 0, stats=rstats)

    # replicate: CDF out of the source, full-CDC into the replica
    marker = f"{KEY_PREFIX}replicate:{run}"
    store_name = f"replicate_{run}"
    sink = snapshot_cdc_dv_sink(rep, store_name, marker)
    for v in (1, 2):
        diff = snap_diff(spark, src, v - 1, v, "event_id")
        batch = diff.filter(F.col("_change_type") != "update_preimage").select(
            F.when(F.col("_change_type") == "insert", F.lit("I"))
            .when(F.col("_change_type") == "update_postimage", F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("op"),
            "event_id",
            "event_type",
            "value",
        )
        sink(batch, v)

    # gate 2: replaying the last version leaves the manifest identical
    rv, rdoc = _snap_latest_doc(rep)
    before = json.dumps(rdoc, sort_keys=True)
    diff2 = snap_diff(spark, src, 1, 2, "event_id")
    sink(
        diff2.filter(F.col("_change_type") != "update_preimage").select(
            F.when(F.col("_change_type") == "insert", F.lit("I"))
            .when(F.col("_change_type") == "update_postimage", F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("op"),
            "event_id",
            "event_type",
            "value",
        ),
        2,
    )
    rv2, rdoc2 = _snap_latest_doc(rep)
    if json.dumps(rdoc2, sort_keys=True) != before:
        raise RuntimeError("replay mutated the replica manifest")
    # gate 3: the scattered deletes took the DV path on the replica
    if not rdoc2.get("dv"):
        raise RuntimeError("replica deletes did not take the DV path")

    # gate 1: the replication invariant — replica == source head
    replica = snap_read_mor(spark, rep, "event_id").localCheckpoint(eager=True)
    head = _snap_read(spark, src)
    if replica.exceptAll(head).take(1) or head.exceptAll(replica).take(1):
        raise RuntimeError("replica diverged from the source head")

    out = (
        replica.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            dsum(F.col("value")).alias("total_value"),
            F.min("event_id").cast("long").alias("lo_id"),
            F.max("event_id").cast("long").alias("hi_id"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)  # detach before scratch cleanup
    )
    KVStore.reset(store_name)
    return out


@query(
    "q_stream_table_maintenance",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {SQL_DSUM("value")} AS total_value,
           CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_ids
    FROM events
    WHERE event_id % 10 >= 5
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_table_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING INGEST × AUTO-OPTIMIZE (r14) — the lifecycle a real
    lakehouse table actually lives: streaming ingestion drips one
    small file per micro-batch into the snapshot table
    (snapshot_ingest_sink, exactly-once), and the metadata-driven
    maintenance pass (snap_auto_optimize, selection from footer row
    counts in the files relation) runs BETWEEN ingest epochs —
    including across a checkpoint RESTART, the interleaving that
    breaks naive version addressing. Asserted live: after epoch 1
    (five drip files) maintenance folds them into one right-sized
    file; epoch 2 restarts the SAME checkpoint, drips five more, and
    the second maintenance pass selects exactly those five (the
    epoch-1 compacted file is now well-sized and byte-untouched —
    size+mtime); a third pass is a committed no-op (convergence); the
    final table holds 2 compacted files. The rollup hash-checks
    against the raw slice — ingest batching, compaction, and restarts
    must never change content (stream≡batch), and the CAS commit
    algebra (ingest commits commute with maintenance commits — pinned
    since r13) is what makes running them concurrently safe at scale.

    100 TB: this is the operational answer to the streaming
    small-file problem — O(batch) ingest commits forever, O(small
    files) maintenance on a metadata-decided cadence, planning costs
    flat. Reference parity: the reference's restart story (ZkApp
    offset restore) composed with maintenance no engine in the
    reference had. SURVEY §2 streaming×table composition."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.operators.storage import (
        _snap_latest_doc,
        _snap_read,
        snap_auto_optimize,
    )
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    from steaminganalysis_spark.operators.storage import _snap_commit

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_maint")
    table = os.path.join(tmp, "table")
    _snap_commit(table, [], 0)  # the table exists before ingestion starts
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    now = time.time()

    def drip(i: int) -> None:
        # slice i: last digit 5 + i%5, tens-digit parity i//5 — the
        # ten slices are disjoint and union to event_id % 10 >= 5
        d = os.path.join(tmp, f"b{i}")
        ev.filter(
            F.expr(
                f"event_id % 10 = {5 + i % 5}"
                f" AND (event_id DIV 10) % 2 = {i // 5}"
            )
        ).coalesce(1).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))

    store_name = f"stream_maint_{run}"
    marker = f"{KEY_PREFIX}maint-last-applied:{run}"
    sink = snapshot_ingest_sink(table, store_name, marker)
    ckpt = os.path.join(tmp, f"ckpt_{run}")

    def run_epoch() -> None:
        stream = (
            spark.readStream.schema(
                "event_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # epoch 1: batches 0-4 land five files covering %10 in [5, 9]
    for i in range(5):
        drip(i)
    run_epoch()
    _, doc1 = _snap_latest_doc(table)
    if len(doc1["files"]) != 5:
        raise RuntimeError(f"epoch 1 landed {len(doc1['files'])} files")
    import pyarrow.parquet as pq

    total1 = sum(
        pq.ParquetFile(os.path.join(table, "data", f)).metadata.num_rows
        for f in doc1["files"]
    )
    rec1 = snap_auto_optimize(
        spark, table, small_rows=total1, target_rows=total1 + 1
    )
    if sorted(rec1["selected"]) != doc1["files"] or rec1["n_out"] != 1:
        raise RuntimeError(f"epoch-1 maintenance misfired: {rec1}")
    _, doc1b = _snap_latest_doc(table)
    merged1 = doc1b["files"][0]
    ddir = os.path.join(table, "data")
    meta1 = (
        os.path.getsize(os.path.join(ddir, merged1)),
        os.path.getmtime(os.path.join(ddir, merged1)),
    )

    # epoch 2: the other tens-digit parity of the same last digits
    for i in range(5, 10):
        drip(i)
    run_epoch()
    _, doc2 = _snap_latest_doc(table)
    new_small = sorted(set(doc2["files"]) - {merged1})
    if len(new_small) != 5:
        raise RuntimeError(f"epoch 2 landed {sorted(doc2['files'])}")
    rec2 = snap_auto_optimize(
        spark, table, small_rows=total1, target_rows=total1 * 2
    )
    if sorted(rec2["selected"]) != new_small:
        raise RuntimeError(f"epoch-2 maintenance selected {rec2['selected']}")
    meta1_after = (
        os.path.getsize(os.path.join(ddir, merged1)),
        os.path.getmtime(os.path.join(ddir, merged1)),
    )
    if meta1 != meta1_after:
        raise RuntimeError("maintenance rewrote the well-sized file")
    rec3 = snap_auto_optimize(
        spark, table, small_rows=total1, target_rows=total1 * 2
    )
    if rec3["selected"] or rec3["version"] != rec2["version"]:
        raise RuntimeError(f"maintenance did not converge: {rec3}")
    _, doc3 = _snap_latest_doc(table)
    if len(doc3["files"]) != 2:
        raise RuntimeError(f"expected 2 files, got {len(doc3['files'])}")

    out = (
        _snap_read(spark, table)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            dsum(F.col("value")).alias("total_value"),
            F.countDistinct("event_id").cast("long").alias("n_ids"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)
    )
    KVStore.reset(store_name)
    return out


@query(
    "q_stream_table_epoch_tags",
    oracle=f"""
    SELECT event_type,
           CAST(COUNT(CASE WHEN event_id % 10 IN (5, 6, 7) THEN 1 END)
                AS BIGINT) AS v1_rows,
           CAST(COUNT(*) AS BIGINT) AS head_rows,
           {SQL_DSUM("value")} AS head_value
    FROM events
    WHERE event_id % 10 >= 5
    GROUP BY 1 ORDER BY 1
    """,
)
def stream_table_epoch_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINING-DATA SNAPSHOTS AS TAGS (r14) — the reproducibility
    contract an LLM training pipeline needs from its corpus store:
    streaming ingestion lands epoch 1 (three micro-batch files), the
    pipeline TAGS the committed snapshot ``train_v1``, ingestion
    continues (epoch 2), maintenance COMPACTS all the small files
    (replacing every file the tag's manifest references), and VACUUM
    runs retaining only the live head — and reading BY TAG must still
    return exactly the epoch-1 corpus: the tag keeps its manifest
    alive through snap_expire's ref counting, and the manifest keeps
    the superseded data files on disk through the shared-file
    reference count, even though no live version references them
    (asserted live: the compacted head is 1 file, the tagged files
    still exist, and the tag read's row count equals epoch 1's).
    Dropping the tag and re-VACUUMing then actually reclaims both the
    manifest and the orphaned files (asserted) — retention is a
    policy you can point at a training run, not a prayer. The frame
    joins the tag read with the head read per event type and
    hash-checks both against raw events.

    100 TB: "which exact rows trained model v1" becomes one JSON ref
    + reference-counted files — no copies, no export, survives every
    later compaction; cost is the tagged snapshot's storage delta vs
    the live head. Reference parity: none (SURVEY §2 streaming×table
    composition; composes q_table_refs, q_stream_table_ingest,
    q_table_auto_optimize, and VACUUM)."""
    import glob
    import os
    import shutil
    import time

    from steaminganalysis_spark.operators.storage import (
        _snap_commit,
        _snap_latest_doc,
        _snap_read,
        _snap_versions,
        snap_auto_optimize,
        snap_expire,
        snap_read_ref,
        snap_ref_create,
        snap_ref_drop,
    )
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_tags")
    table = os.path.join(tmp, "table")
    _snap_commit(table, [], 0)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    src = os.path.join(tmp, "src")
    os.makedirs(src)
    now = time.time()

    def drip(i: int) -> None:
        d = os.path.join(tmp, f"b{i}")
        ev.filter(F.expr(f"event_id % 10 = {5 + i}")).coalesce(
            1
        ).write.parquet(d)
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(glob.glob(os.path.join(d, "part-*.parquet"))[0], dst)
        os.utime(dst, (now + i, now + i))

    store_name = f"stream_tags_{run}"
    sink = snapshot_ingest_sink(
        table, store_name, f"{KEY_PREFIX}tags-last-applied:{run}"
    )
    ckpt = os.path.join(tmp, f"ckpt_{run}")

    def run_epoch() -> None:
        q = (
            spark.readStream.schema(
                "event_id long, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # epoch 1: %10 in {5,6,7} -> tag the committed snapshot
    for i in range(3):
        drip(i)
    run_epoch()
    v1 = snap_ref_create(table, "train_v1", "tag")
    v1_files = set(_snap_latest_doc(table)[1]["files"])
    v1_rows = _snap_read(spark, table, v1).count()

    # epoch 2 (%10 in {8,9}), then maintenance replaces EVERY file
    for i in range(3, 5):
        drip(i)
    run_epoch()
    import pyarrow.parquet as pq

    _, doc = _snap_latest_doc(table)
    total = sum(
        pq.ParquetFile(os.path.join(table, "data", f)).metadata.num_rows
        for f in doc["files"]
    )
    rec = snap_auto_optimize(
        spark, table, small_rows=total + 1, target_rows=total + 1
    )
    if rec["n_out"] != 1 or not v1_files <= set(rec["selected"]):
        raise RuntimeError(f"maintenance did not fold the epochs: {rec}")

    head_v = max(_snap_versions(table))
    snap_expire(table, [head_v], orphan_grace_seconds=0.0)
    if v1 not in _snap_versions(table):
        raise RuntimeError("VACUUM expired the tagged training snapshot")
    ddir = os.path.join(table, "data")
    if not all(os.path.exists(os.path.join(ddir, f)) for f in v1_files):
        raise RuntimeError("VACUUM swept files the tag still references")

    tag_read = snap_read_ref(spark, table, "train_v1")
    if tag_read.count() != v1_rows:
        raise RuntimeError("tag read changed after compaction + VACUUM")

    out = (
        tag_read.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("v1_rows"))
        .join(
            _snap_read(spark, table)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("head_rows"),
                dsum(F.col("value")).alias("head_value"),
            ),
            "event_type",
            "right",
        )
        .select(
            "event_type",
            F.coalesce("v1_rows", F.lit(0)).alias("v1_rows"),
            "head_rows",
            "head_value",
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)
    )

    # drop the tag -> the next VACUUM actually reclaims
    snap_ref_drop(table, "train_v1")
    snap_expire(table, [head_v], orphan_grace_seconds=0.0)
    if v1 in _snap_versions(table) or any(
        os.path.exists(os.path.join(ddir, f)) for f in v1_files
    ):
        raise RuntimeError("dropped tag did not release its snapshot")
    if _snap_read(spark, table).count() == 0:
        raise RuntimeError("reclaim touched the live head")

    KVStore.reset(store_name)
    return out


# ---------- rate-limited CDF source (r15, VERDICT r14 order #6)


def table_cdf_backfill_step(
    spark: SparkSession,
    src_table: str,
    mv_table: str,
    max_files: int,
    store_name: str,
    marker: str,
    crash_before_watermark: bool = False,
) -> dict:
    """Consume the NEXT ≤ ``max_files`` pending appended files of the
    source table as ONE micro-batch — the maxFilesPerTrigger bound on
    the table-as-streaming-source contract (q_stream_from_table_cdf
    consumes one COMMIT per batch; a large backfill commit then lands
    as one giant batch, exactly the failure Delta's
    maxFilesPerTrigger exists for). Offsets are an INDEX into the
    deterministic append-file log ((version, file) pairs in commit
    order, files sorted within a commit — Delta's
    (reservoirVersion, index) offset shape), persisted as the KVStore
    watermark; the MV manifest's txn marker carries the same index so
    a crash BETWEEN the MV commit and the watermark advance replays
    into the skipped-txn arm and re-advances without double-applying.
    Non-append commits in range REFUSE (a rewrite mixes copied and
    changed rows — file-grain sub-batching is unsound; the unbounded
    consumer's diff path owns that case). Returns the decision record
    {"arm", "consumed", "offset"}.

    Scale: a 10k-file backfill into a 100 TB table drains as 10k/N
    bounded batches, each O(max_files) reads + one O(groups) MV
    commit, restartable at file grain with nothing replayed."""
    import json
    import os

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_commit_cas,
        _snap_latest_doc,
        _snap_versions,
    )
    from steaminganalysis_spark.registry import to_cents
    from steaminganalysis_spark.streaming.sinks import KVStore

    committed = _snap_versions(src_table)
    docs = {
        v: json.loads(
            open(os.path.join(src_table, "manifests", committed[v])).read()
        )
        for v in sorted(committed)
    }
    vs = sorted(docs)
    log: list[tuple[int, str]] = []
    prev = set(docs[vs[0]]["files"])
    for v in vs[1:]:
        cur = set(docs[v]["files"])
        if not cur >= prev:
            raise ValueError(
                f"commit v{v} is not append-shaped: rate-limited "
                "consumption is append-only (rewrites need the diff path)"
            )
        log.extend((v, f) for f in sorted(cur - prev))
        prev = cur

    store = KVStore.instance(store_name)
    offset = max(store.last_applied(marker), 0)
    pending = log[offset:]
    if not pending:
        return {"arm": "idle", "consumed": [], "offset": offset}

    mv_v, mv_doc = _snap_latest_doc(mv_table)
    mv_txn = mv_doc.get("txn", {})
    # Exactly-once across restarts with a DIFFERENT max_files (r16
    # ADVICE): after a crash-before-watermark the MV's txn marker can
    # sit strictly between offset and offset+max_files; an unclamped
    # slice would pass the skipped-txn guard below and re-apply entries
    # [offset, marker) the MV already absorbed. Clamp the batch so
    # new_offset never crosses a marker ahead of the watermark — the
    # skipped-txn arm then catches the store up to the marker first.
    _m = int(mv_txn.get(marker, -1))
    take = (_m - offset) if offset < _m < offset + max_files else max_files
    batch = pending[:take]
    new_offset = offset + len(batch)
    if _m >= new_offset:
        # crash landed between the MV commit and the watermark advance:
        # the MV already holds exactly this slice (the log is
        # deterministic, so the replayed batch IS the committed batch)
        store.apply_batch(new_offset, [], marker)
        return {
            "arm": "skipped-txn",
            "consumed": [f for _v, f in batch],
            "offset": new_offset,
        }

    ddir = os.path.join(src_table, "data")
    delta = (
        spark.read.parquet(*[os.path.join(ddir, f) for _v, f in batch])
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("d_rows"),
            F.sum(to_cents(F.col("value"))).cast("long").alias("d_cents"),
        )
    )
    from steaminganalysis_spark.operators.storage import _snap_read

    mv1 = (
        _snap_read(spark, mv_table, mv_v)
        .join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n_rows", F.lit(0)) + F.coalesce("d_rows", F.lit(0)))
            .alias("n_rows"),
            (F.coalesce("cents", F.lit(0)) + F.coalesce("d_cents", F.lit(0)))
            .alias("cents"),
        )
        .coalesce(1)
    )
    files = _snap_add_files(mv1, mv_table, f"cdfrl_{new_offset}")
    if not _snap_commit_cas(
        mv_table, files, mv_v + 1, txn={**mv_txn, marker: new_offset}
    ):
        raise RuntimeError(
            f"MV table {mv_table} has a concurrent writer (CAS lost)"
        )
    if crash_before_watermark:
        return {
            "arm": "applied",
            "consumed": [f for _v, f in batch],
            "offset": new_offset,
        }
    store.apply_batch(new_offset, [], marker)
    return {
        "arm": "applied",
        "consumed": [f for _v, f in batch],
        "offset": new_offset,
    }


@query(
    "q_stream_from_table_cdf_ratelimited",
    oracle=f"""
    WITH final AS (
      SELECT event_id, event_type, value FROM events
      UNION ALL
      SELECT event_id + 1000000000, event_type, value
      FROM events WHERE event_id % 97 = 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {SQL_DSUM("value")} AS total_value
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def stream_from_table_cdf_ratelimited(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RATE-LIMITED TABLE-AS-STREAMING-SOURCE (VERDICT r14 order #6)
    — the maxFilesPerTrigger refinement of q_stream_from_table_cdf:
    the producer commits v0 (history) then ONE large backfill append
    of FIVE files (v1); the consumer drains it with max_files=2, so
    the single commit splits across THREE micro-batches (asserted —
    the batch plan is [2, 2, 1] by file count). Exactly-once across a
    MID-BACKFILL crash, asserted live: batch 2 crashes between its MV
    commit and the watermark advance; the restart replays the SAME
    log slice (offsets are indexes into the deterministic append-file
    log — the (reservoirVersion, index) shape), takes the
    manifest-txn skip arm, re-advances the watermark, and the MV
    commit count is unchanged — NOTHING re-applied. A non-append
    (rewrite) commit then refuses loudly (asserted). Final gates: the
    MV equals the re-aggregated source head (exceptAll both ways) and
    hash-checks against raw events with the backfill stated in SQL.

    Scale: the whole point — a backfill writing 10k files into a
    100 TB table becomes 10k/N bounded batches restartable at file
    grain, instead of one batch sized like the backfill."""
    import os

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_add_files_with_stats,
        _snap_commit,
        _snap_latest_doc,
        _snap_read,
        _snap_versions,
        snap_append_optimistic,
        snap_compact_optimistic,
    )
    from steaminganalysis_spark.registry import to_cents
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_cdf_rl")
    src = os.path.join(tmp, "src_table")
    mv = os.path.join(tmp, "mv_table")
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")

    base, bstats = _snap_add_files_with_stats(
        ev.repartitionByRange(2, "event_id").sortWithinPartitions("event_id"),
        src,
        "cdfrl_base",
        ["event_id"],
    )
    _snap_commit(src, base, 0, stats=bstats)
    # ONE backfill commit, FIVE files — the oversized batch
    backfill = _snap_add_files(
        ev.filter(F.expr("event_id % 97 = 0"))
        .select(
            (F.col("event_id") + F.lit(1000000000)).alias("event_id"),
            "event_type",
            "value",
        )
        .repartition(5),
        src,
        "cdfrl_backfill",
    )
    if len(backfill) != 5:
        raise RuntimeError(f"harness broke: backfill wrote {len(backfill)} files")
    snap_append_optimistic(src, backfill)

    marker = f"{KEY_PREFIX}cdf-rl-consumer:{run}"
    store_name = f"stream_cdf_rl_{run}"
    mv0 = (
        _snap_read(spark, src, 0)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(to_cents(F.col("value"))).cast("long").alias("cents"),
        )
        .coalesce(1)
    )
    _snap_commit(mv, _snap_add_files(mv0, mv, "cdfrl_mv0"), 0, txn={marker: 0})
    KVStore.instance(store_name).apply_batch(0, [], marker)

    step = lambda **kw: table_cdf_backfill_step(  # noqa: E731
        spark, src, mv, 2, store_name, marker, **kw
    )
    recs = [step(), step(crash_before_watermark=True)]
    recs.append(step())  # restart: must skip-txn, replay nothing
    recs.extend([step(), step()])
    arms = [r["arm"] for r in recs]
    if arms != ["applied", "applied", "skipped-txn", "applied", "idle"]:
        raise RuntimeError(f"backfill drain took wrong arms: {arms}")
    if [len(r["consumed"]) for r in recs] != [2, 2, 2, 1, 0]:
        raise RuntimeError(
            f"batch plan wrong: {[r['consumed'] for r in recs]}"
        )
    if recs[2]["consumed"] != recs[1]["consumed"]:
        raise RuntimeError("replay consumed a different slice")
    if sorted(
        f for r in recs if r["arm"] == "applied" for f in r["consumed"]
    ) != sorted(backfill):
        raise RuntimeError("applied batches do not tile the backfill exactly")
    if sorted(_snap_versions(mv)) != [0, 1, 2, 3]:
        raise RuntimeError("duplicate or missing MV commit after replay")
    if KVStore.instance(store_name).last_applied(marker) != 5:
        raise RuntimeError("watermark did not reach the log end")

    # a rewrite commit makes the range non-append: must refuse
    rw = _snap_add_files(
        spark.read.parquet(os.path.join(src, "data", base[0])),
        src,
        "cdfrl_rw",
    )
    snap_compact_optimistic(src, [base[0]], rw)
    try:
        step()
        raise RuntimeError("rate-limited step consumed a rewrite commit")
    except ValueError:
        pass

    final = _snap_read(spark, mv, 3).localCheckpoint(eager=True)
    reagg = (
        _snap_read(spark, src, 1)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(to_cents(F.col("value"))).cast("long").alias("cents"),
        )
    )
    if final.exceptAll(reagg).take(1) or reagg.exceptAll(final).take(1):
        raise RuntimeError("drained MV diverged from source re-aggregation")

    out = (
        final.select(
            "event_type",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("cents").cast("double") / 100.0).alias("total_value"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)  # detach before scratch cleanup
    )
    KVStore.reset(store_name)
    return out


def table_cdf_signed_step(
    spark: SparkSession,
    src_table: str,
    mv_table: str,
    max_files: int,
    store_name: str,
    marker: str,
    crash_before_watermark: bool = False,
) -> dict:
    """Consume the next ≤ ``max_files`` entries of the SIGNED
    append-file log — the r16 completion of table_cdf_backfill_step
    (VERDICT r15 order #6): that consumer REFUSES non-append commits
    and hands them to the unbounded diff path, which then lands a
    whole rewrite as one batch. This one bounds that arm too. Each
    commit classifies into signed file entries — removed files
    (prev − cur) as −1, added files (cur − prev) as +1, removed
    first, sorted within each side — and a micro-batch applies
    Σ sign·agg(file) for its slice. Sound because the MV is ADDITIVE
    (counts and cent-sums under full-outer merge): a rewrite's net
    delta decomposes per file and the slices commute within the
    drain, so a 3-entry MERGE rewrite lands across two bounded
    batches whose intermediate states are transient partial sums that
    converge exactly at the slice boundary. Appends degenerate to the
    backfill consumer's behavior (adds only). Offsets stay an index
    into the deterministic signed log ((version, file, sign) in
    commit order — the (reservoirVersion, index) shape); the MV
    manifest's txn marker carries the same index, so a crash between
    the MV commit and the watermark advance replays into the
    skipped-txn arm with nothing re-applied. Removed files are read
    from their OLDER manifests' storage — retention must cover the
    drain (the same contract Delta's CDF reads have with VACUUM).
    Returns {"arm", "consumed", "offset"}.

    Scale: a compaction or MERGE touching 10k files of a 100 TB
    table drains as 10k/N bounded batches, each O(max_files) file
    reads + one O(groups) MV commit, restartable at entry grain."""
    import json
    import os

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_commit_cas,
        _snap_latest_doc,
        _snap_read,
        _snap_versions,
    )
    from steaminganalysis_spark.registry import to_cents
    from steaminganalysis_spark.streaming.sinks import KVStore

    committed = _snap_versions(src_table)
    docs = {
        v: json.loads(
            open(os.path.join(src_table, "manifests", committed[v])).read()
        )
        for v in sorted(committed)
    }
    vs = sorted(docs)
    log: list[tuple[int, str, int]] = []
    prev = set(docs[vs[0]]["files"])
    for v in vs[1:]:
        cur = set(docs[v]["files"])
        log.extend((v, f, -1) for f in sorted(prev - cur))
        log.extend((v, f, 1) for f in sorted(cur - prev))
        prev = cur

    store = KVStore.instance(store_name)
    offset = max(store.last_applied(marker), 0)
    pending = log[offset:]
    if not pending:
        return {"arm": "idle", "consumed": [], "offset": offset}

    mv_v, mv_doc = _snap_latest_doc(mv_table)
    mv_txn = mv_doc.get("txn", {})
    # clamp the slice at a txn marker ahead of the watermark (r16
    # ADVICE, low — see table_cdf_backfill_step): a restart with a
    # larger max_files after a crash-before-watermark must not re-apply
    # entries [offset, marker) the MV already absorbed.
    _m = int(mv_txn.get(marker, -1))
    take = (_m - offset) if offset < _m < offset + max_files else max_files
    batch = pending[:take]
    new_offset = offset + len(batch)
    if _m >= new_offset:
        store.apply_batch(new_offset, [], marker)
        return {
            "arm": "skipped-txn",
            "consumed": [(f, s) for _v, f, s in batch],
            "offset": new_offset,
        }

    ddir = os.path.join(src_table, "data")
    parts = []
    for sign in (1, -1):
        fl = [f for _v, f, s in batch if s == sign]
        if fl:
            parts.append(
                spark.read.parquet(*[os.path.join(ddir, f) for f in fl])
                .groupBy("event_type")
                .agg(
                    (F.count("*") * sign).cast("long").alias("d_rows"),
                    (F.sum(to_cents(F.col("value"))) * sign)
                    .cast("long")
                    .alias("d_cents"),
                )
            )
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionByName(p)
    delta = delta.groupBy("event_type").agg(
        F.sum("d_rows").cast("long").alias("d_rows"),
        F.sum("d_cents").cast("long").alias("d_cents"),
    )
    mv1 = (
        _snap_read(spark, mv_table, mv_v)
        .join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n_rows", F.lit(0)) + F.coalesce("d_rows", F.lit(0)))
            .alias("n_rows"),
            (F.coalesce("cents", F.lit(0)) + F.coalesce("d_cents", F.lit(0)))
            .alias("cents"),
        )
        .coalesce(1)
    )
    files = _snap_add_files(mv1, mv_table, f"cdfsg_{new_offset}")
    if not _snap_commit_cas(
        mv_table, files, mv_v + 1, txn={**mv_txn, marker: new_offset}
    ):
        raise RuntimeError(
            f"MV table {mv_table} has a concurrent writer (CAS lost)"
        )
    if not crash_before_watermark:
        store.apply_batch(new_offset, [], marker)
    return {
        "arm": "applied",
        "consumed": [(f, s) for _v, f, s in batch],
        "offset": new_offset,
    }


@query(
    "q_stream_from_table_rewrite_ratelimited",
    oracle=f"""
    WITH mx AS (SELECT MAX(event_id) // 2 AS cut FROM events),
    final AS (
      SELECT event_id, event_type,
             CASE WHEN event_id <= (SELECT cut FROM mx)
                       AND event_id % 50 = 3
                  THEN value * 2 ELSE value END AS value
      FROM events
      UNION ALL
      SELECT event_id + 1000000000, event_type, value
      FROM events WHERE event_id % 97 = 0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           {SQL_DSUM("value")} AS total_value
    FROM final GROUP BY 1 ORDER BY 1
    """,
)
def stream_from_table_rewrite_ratelimited(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RATE-LIMITED CONSUMPTION OF REWRITE COMMITS (r16, VERDICT r15
    order #6) — the arm q_stream_from_table_cdf_ratelimited refuses,
    bounded: the source commits v0 (two explicit-range history
    files), v1 (a four-file backfill append), v2 (a MERGE-shaped
    rewrite — the lower-range file rewritten into TWO files with
    value doubled where event_id % 50 = 3), and v3 (a pure compaction
    of those two files — a net-zero rewrite). The signed consumer
    (remove entries −1, add entries +1) drains the 10-entry log with
    max_files=2 across FIVE bounded batches — the 3-entry rewrite and
    the 3-entry compaction each SPAN batch boundaries, the scale
    point — with a mid-rewrite crash between MV commit and watermark
    replayed into the skipped-txn arm, nothing re-applied (asserted:
    arms, batch plan, replay slice identity, MV commit count). A
    mid-drain MV state is asserted to differ from BOTH the v1
    aggregate and the head aggregate (the batches are genuinely
    sub-commit). After the drain the MV equals the head
    re-aggregation exactly (exceptAll both ways) — the compaction
    contributed exactly zero — and the rollup hash-checks against raw
    events with the rewrite stated in SQL.

    Scale: rewrites are how curation lands (MERGE, compaction,
    DV folds); bounding their replay at file grain keeps every
    micro-batch O(max_files) no matter how large the maintenance
    commit was. SURVEY §2 B.8 extension (stream×table family)."""
    import os

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_commit,
        _snap_latest_doc,
        _snap_read,
        _snap_versions,
        snap_append_optimistic,
        snap_compact_optimistic,
    )
    from steaminganalysis_spark.registry import to_cents
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    run = uuid.uuid4().hex[:8]
    tmp = scratch_dir("stream_cdf_sg")
    src = os.path.join(tmp, "src_table")
    mv = os.path.join(tmp, "mv_table")
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    cut = int(ev.agg(F.max("event_id")).first()[0]) // 2

    lo = _snap_add_files(
        ev.filter(F.col("event_id") <= cut).coalesce(1), src, "cdfsg_lo"
    )
    hi = _snap_add_files(
        ev.filter(F.col("event_id") > cut).coalesce(1), src, "cdfsg_hi"
    )
    _snap_commit(src, lo + hi, 0)
    backfill = _snap_add_files(
        ev.filter(F.expr("event_id % 97 = 0"))
        .select(
            (F.col("event_id") + F.lit(1000000000)).alias("event_id"),
            "event_type",
            "value",
        )
        .repartition(4),
        src,
        "cdfsg_bf",
    )
    if len(backfill) != 4:
        raise RuntimeError(f"harness broke: backfill wrote {len(backfill)}")
    snap_append_optimistic(src, backfill)
    # v2: MERGE-shaped rewrite of the lower-range file (1 removed,
    # 2 added, values doubled on the % 50 = 3 slice)
    rewritten = _snap_add_files(
        spark.read.parquet(os.path.join(src, "data", lo[0]))
        .withColumn(
            "value",
            F.when(
                F.col("event_id") % 50 == 3, F.col("value") * 2
            ).otherwise(F.col("value")),
        )
        .repartition(2),
        src,
        "cdfsg_rw",
    )
    if len(rewritten) != 2:
        raise RuntimeError("harness broke: rewrite wrote != 2 files")
    snap_compact_optimistic(src, lo, rewritten)
    # v3: pure compaction of the rewrite output (2 removed, 1 added)
    squashed = _snap_add_files(
        spark.read.parquet(
            *[os.path.join(src, "data", f) for f in rewritten]
        ).coalesce(1),
        src,
        "cdfsg_sq",
    )
    snap_compact_optimistic(src, rewritten, squashed)

    marker = f"{KEY_PREFIX}cdf-sg-consumer:{run}"
    store_name = f"stream_cdf_sg_{run}"
    agg_of = lambda df: (  # noqa: E731
        df.groupBy("event_type").agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(to_cents(F.col("value"))).cast("long").alias("cents"),
        )
    )
    mv0 = agg_of(_snap_read(spark, src, 0)).coalesce(1)
    _snap_commit(mv, _snap_add_files(mv0, mv, "cdfsg_mv0"), 0, txn={marker: 0})
    KVStore.instance(store_name).apply_batch(0, [], marker)

    step = lambda **kw: table_cdf_signed_step(  # noqa: E731
        spark, src, mv, 2, store_name, marker, **kw
    )
    recs = [step(), step(), step(crash_before_watermark=True)]
    recs.append(step())  # restart mid-rewrite: skip-txn, replay nothing
    # capture a mid-drain MV state (after the remove+first-add slice
    # of the rewrite): genuinely sub-commit — equal to NEITHER the v1
    # aggregate nor the head aggregate
    mid = _snap_read(spark, mv).localCheckpoint(eager=True)
    v1agg = agg_of(_snap_read(spark, src, 1)).localCheckpoint(eager=True)
    headagg = agg_of(_snap_read(spark, src)).localCheckpoint(eager=True)
    if not (
        mid.exceptAll(v1agg).take(1) or v1agg.exceptAll(mid).take(1)
    ) or not (
        mid.exceptAll(headagg).take(1) or headagg.exceptAll(mid).take(1)
    ):
        raise RuntimeError("mid-drain MV is not a sub-commit state")
    recs.extend([step(), step(), step()])
    arms = [r["arm"] for r in recs]
    if arms != [
        "applied", "applied", "applied", "skipped-txn",
        "applied", "applied", "idle",
    ]:
        raise RuntimeError(f"signed drain took wrong arms: {arms}")
    if [len(r["consumed"]) for r in recs] != [2, 2, 2, 2, 2, 2, 0]:
        raise RuntimeError(f"batch plan wrong: {[r['consumed'] for r in recs]}")
    if recs[3]["consumed"] != recs[2]["consumed"]:
        raise RuntimeError("replay consumed a different slice")
    signs = [s for r in recs if r["arm"] == "applied" for _f, s in r["consumed"]]
    if signs != [1, 1, 1, 1, -1, 1, 1, -1, -1, 1]:
        raise RuntimeError(f"signed log order wrong: {signs}")
    if sorted(_snap_versions(mv)) != [0, 1, 2, 3, 4, 5]:
        raise RuntimeError("duplicate or missing MV commit after replay")
    if KVStore.instance(store_name).last_applied(marker) != 10:
        raise RuntimeError("watermark did not reach the signed log end")

    final = _snap_read(spark, mv, 5).localCheckpoint(eager=True)
    if final.exceptAll(headagg).take(1) or headagg.exceptAll(final).take(1):
        raise RuntimeError("drained MV diverged from head re-aggregation")

    out = (
        final.select(
            "event_type",
            F.col("n_rows").cast("long").alias("n_rows"),
            (F.col("cents").cast("double") / 100.0).alias("total_value"),
        )
        .orderBy("event_type")
        .localCheckpoint(eager=True)  # detach before scratch cleanup
    )
    KVStore.reset(store_name)
    return out
