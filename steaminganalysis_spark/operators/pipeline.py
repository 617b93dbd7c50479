"""Training-data-pipeline operators over the events/lineitem tables
(BASELINE.json north star: the operations a large-scale training-data
pipeline needs beyond the reference's own surface).

Scale design notes:
- `q_sample_hash` is *deterministic* sampling: the keep/drop decision is
  a pure function of the key (md5 prefix), so it is reproducible across
  runs, engines, and repartitions — unlike `TABLESAMPLE`, whose RNG is
  partition-dependent. It also samples whole orders (all lineitems of a
  kept order survive), the grouping a pipeline needs to keep documents
  intact. The filter is evaluated map-side in the scan stage: no
  shuffle at any scale.
- `q_dedup_latest_per_key` is the CDC compaction idiom (keep newest
  record per key): one shuffle on the key, `row_number` in each hash
  partition. At 100 TB the same plan holds — AQE splits skewed keys.
- `q_sessionize` is gap-based sessionization entirely with window
  functions: one shuffle on user_id, then lag → flag → running-sum →
  group, all within the same hash partitioning (Catalyst reuses the
  exchange: the three window ops and the final groupBy share one
  partitioning of user_id).
- `q_retention_cohorts` / `q_funnel` are the standard cohort/funnel
  shapes: per-user window min (one shuffle on user_id) then a tiny
  re-aggregation.
- `q_histogram` is a fixed-width bucket aggregate: bucket id computed
  map-side, shuffle moves only ~10 partial rows per task.

Reference lineage: these generalize the reference's only aggregation
pattern — classify rows, bucket them, accumulate per bucket
(StreamingAnalysisAppWithKafkaManageOffset.scala:52-74) — from calendar buckets to hash buckets, value
buckets, session buckets, and cohort buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import SQL_DSUM, dsum, query
from steaminganalysis_spark.sources import load

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "q_sample_hash",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample keyed on the order id: keep rows whose
    md5-hex prefix falls below '1a' (26/256 of the hash space). The same
    order is always fully in or fully out, on any engine."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 2) < "1a"
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "q_dedup_latest_per_key",
    oracle=f"""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the newest event per user (CDC/log compaction): window
    row_number with a unique-id tiebreak for determinism."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", _TS_FMT).alias("ts_s"),
            "event_type",
            "value",
        )
    )


@query(
    "q_sessionize",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts > lag(ts) OVER w + INTERVAL 24 HOUR
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           {SQL_DSUM("value")} AS session_value
    FROM numbered
    GROUP BY user_id, session_idx
    """,
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based batch sessionization (24 h inactivity closes a
    session): lag → new-session flag → running sum = session index →
    per-session rollup. All four steps share one hash partitioning on
    user_id, so Catalyst plans a single exchange."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 24 HOURS")), 1
    ).otherwise(0)
    numbered = ev.withColumn("new_sess", new_sess).withColumn(
        "session_idx",
        F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), _TS_FMT).alias("session_start"),
        F.date_format(F.max("ts"), _TS_FMT).alias("session_end"),
        dsum(F.col("value")).alias("session_value"),
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts,
             MIN(ts) OVER (PARTITION BY user_id) AS first_ts
      FROM events
    )
    SELECT strftime(first_ts, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', CAST(first_ts AS DATE), CAST(ts AS DATE)) AS INT) AS day_offset,
           COUNT(DISTINCT user_id) AS n_users
    FROM firsts
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: cohort = first activity day per user; count
    distinct active users per (cohort, day offset)."""
    ev = load(spark, sf_dir, "events")
    first_ts = F.min("ts").over(W.partitionBy("user_id"))
    return (
        ev.withColumn("first_ts", first_ts)
        .groupBy(
            F.date_format("first_ts", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.to_date("ts"), F.to_date("first_ts")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "q_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'signup')   AS t_signup,
             MIN(ts) FILTER (WHERE event_type = 'click')    AS t_click,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events
      GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(t_signup) AS n_signup,
           COUNT(*) FILTER (WHERE t_click > t_signup) AS n_click_after_signup,
           COUNT(*) FILTER (WHERE t_click > t_signup AND t_purchase > t_click)
             AS n_purchase_after_click
    FROM per_user
    """,
)
def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase via per-user conditional
    first-timestamps (one shuffle on user_id, then a scalar rollup)."""
    ev = load(spark, sf_dir, "events")

    def first_of(et: str):
        return F.min(F.when(F.col("event_type") == et, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_signup").alias("n_signup"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias(
            "n_click_after_signup"
        ),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_signup"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_purchase_after_click"),
    )


@query(
    "q_histogram",
    oracle=f"""
    SELECT CAST(least(floor(value / 50.0), 9) AS INT) AS bucket,
           COUNT(*) AS n,
           {SQL_DSUM("value")} AS bucket_sum
    FROM events
    GROUP BY 1
    """,
)
def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values (10 buckets of width 50,
    top bucket open). Bucket ids are computed map-side; the exchange
    carries ≤10 partial rows per task regardless of input size."""
    ev = load(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int")
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"), dsum(F.col("value")).alias("bucket_sum")
    )


@query(
    "q_dq_checks",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS null_keys,
      (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0) AS nonpositive_prices,
      (SELECT COUNT(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1) AS bad_discounts,
      (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        AS orphan_lineitems,
      (SELECT COUNT(*) FROM orders
        WHERE o_orderdate > TIMESTAMP '2030-01-01 00:00:00') AS future_orders
    """,
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint profiling (Deequ-style, one pass per
    table): null keys, non-positive prices, out-of-range discounts,
    referential orphans (anti-join, broadcast when dims are small),
    future dates. One row out — the gate a pipeline evaluates before
    promoting a snapshot. At 100 TB each check is a map-side predicate
    count; the FK check is the only join and prunes to the key column."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    per_row = li.select(
        F.when(F.col("l_orderkey").isNull(), 1).otherwise(0).alias("nk"),
        F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0).alias("np"),
        F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        .otherwise(0)
        .alias("bd"),
    ).agg(
        F.sum("nk").alias("null_keys"),
        F.sum("np").alias("nonpositive_prices"),
        F.sum("bd").alias("bad_discounts"),
    )
    orphans = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count("*").alias("orphan_lineitems"))
    )
    future = o.agg(
        F.count(
            F.when(F.col("o_orderdate") > F.lit("2030-01-01").cast("timestamp"), 1)
        ).alias("future_orders")
    )
    return per_row.crossJoin(orphans).crossJoin(future)


@query(
    "q_train_test_split",
    oracle="""
    WITH tagged AS (
      SELECT doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM tagged GROUP BY split
    """,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/valid/test split keyed on the doc
    id's md5 prefix ('cc' ≈ 204/256, 'e6' ≈ 230/256): reproducible on
    any engine, stable under repartition/re-runs, and a document can
    never leak across splits between runs — the property random splits
    lose the moment data order changes."""
    d = load(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "cc", "train").when(h2 < "e6", "valid").otherwise("test")
    )
    return d.select("doc_id", split.alias("split")).groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


@query(
    "q_sample_stratified",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_sampled,
           COUNT(DISTINCT source) AS n_sources
    FROM documents
    WHERE substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 2) < '34'
    GROUP BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: ~20% ('34' ≈ 52/256) drawn
    INDEPENDENTLY per language (the hash is salted with the stratum key,
    so strata don't share the same selected id pattern). Map-side only;
    the aggregate is just the verification summary."""
    d = load(spark, sf_dir, "documents")
    keep = (
        F.substring(
            F.md5(F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string"))),
            1,
            2,
        )
        < "34"
    )
    return (
        d.filter(keep)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


@query(
    "q_data_mix",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    ), capped AS (
      SELECT source, doc_id FROM ranked
      WHERE rn <= CASE WHEN source IN ('src0', 'src1') THEN 20
                       WHEN source IN ('src2', 'src3') THEN 10
                       ELSE 2 END
    )
    SELECT source, COUNT(*) AS n_taken, MIN(doc_id) AS first_doc
    FROM capped GROUP BY source
    """,
)
def data_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: per-source document caps (the
    up/down-weighting step that turns raw corpora into a training mix —
    20 docs from premium sources, 10 from mid, 2 from the tail),
    selected deterministically by doc_id rank. One shuffle on source;
    WindowGroupLimit prunes each partition to its cap before any
    downstream work."""
    d = load(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    cap = (
        F.when(F.col("source").isin("src0", "src1"), 20)
        .when(F.col("source").isin("src2", "src3"), 10)
        .otherwise(2)
    )
    return (
        d.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .groupBy("source")
        .agg(F.count("*").alias("n_taken"), F.min("doc_id").alias("first_doc"))
    )


@query(
    "q_text_pii_scrub",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-'
                  || CAST(1000 + doc_id % 9000 AS VARCHAR) AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+@[a-z]+\\.[a-z]+')) AS INT)
             AS n_emails,
           CAST(len(regexp_extract_all(text, '\\+1-[0-9]{3}-[0-9]{4}')) AS INT)
             AS n_phones,
           md5(regexp_replace(
                 regexp_replace(text, '[a-z0-9]+@[a-z]+\\.[a-z]+', '<EMAIL>', 'g'),
                 '\\+1-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS scrubbed_md5
    FROM seeded
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: deterministic synthetic emails/phones are seeded
    into each document, then detected (regexp counts) and redacted to
    placeholder tags; the md5 of the scrubbed text is hash-verified, so
    the redaction output — not just the counts — is proven identical.
    All JVM regex; one map-side pass."""
    d = load(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        (1000 + F.col("doc_id") % 9000).cast("string"),
    )
    email_re = "[a-z0-9]+@[a-z]+\\.[a-z]+"
    phone_re = "\\+1-[0-9]{3}-[0-9]{4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(seeded, email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(seeded, F.lit(email_re)).cast("int").alias("n_emails"),
        F.regexp_count(seeded, F.lit(phone_re)).cast("int").alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@query(
    "q_corpus_pipeline",
    oracle="""
    WITH deduped AS (
      -- stage 1: exact dedup, keep the lowest doc_id per content hash
      SELECT doc_id, source, text
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                         ORDER BY doc_id) AS rn
            FROM documents)
      WHERE rn = 1
    ), quality AS (
      -- stage 2: cheap deterministic quality gate
      SELECT doc_id, source, text,
             len(string_split(text, ' ')) AS n_tok,
             len(list_distinct(string_split(text, ' '))) AS n_dist
      FROM deduped
    ), kept AS (
      SELECT * FROM quality
      WHERE n_tok >= 5
        AND CAST(n_dist AS DOUBLE) / n_tok > 0.5
    ), toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                  || ' ' || t[i+4] AS g
      FROM toks, unnest(generate_series(1, len(t) - 4)) AS r(i)
    ), eval_sh AS (
      SELECT DISTINCT g FROM sh
      WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
    ), contaminated AS (
      SELECT DISTINCT s.doc_id FROM sh s JOIN eval_sh e ON s.g = e.g
      WHERE substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 2) >= '1a'
    ), clean AS (
      -- stage 3: decontaminate (drop train docs sharing any 5-gram
      -- with the held-out eval split; eval docs themselves drop too)
      SELECT k.* FROM kept k
      WHERE substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 2) >= '1a'
        AND NOT EXISTS (SELECT 1 FROM contaminated c
                        WHERE c.doc_id = k.doc_id)
    )
    -- stage 4: corpus accounting per source
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM clean
    GROUP BY source
    """,
)
def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM training-corpus pipeline END-TO-END — the
    actual job this engine exists for, as one declarative plan:

      exact dedup (keep-first per content hash)
      → quality gate (length + duplicate-token ratio)
      → decontamination (drop train docs sharing any 5-gram with the
        hash-held-out eval split)
      → per-source corpus accounting (docs, tokens).

    Each stage is the registered kernel (q_dedup_exact,
    q_quality_repetition's ratio, q_decontaminate) composed in one
    DataFrame chain, so Catalyst fuses the whole thing: the dedup
    window and the quality projection share the content-hash shuffle,
    the contamination check is a broadcast-able semi-join on 8-byte
    5-gram hashes, and nothing materializes between stages. The
    oracle replays the identical four stages as one DuckDB CTE chain
    — certifying the COMPOSITION, not just the parts."""
    from steaminganalysis_spark.functions import shingle_hashes, tokens

    docs = load(spark, sf_dir, "documents")

    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    t = tokens("text")
    quality = deduped.select(
        "doc_id",
        "source",
        "text",
        F.size(t).alias("n_tok"),
        F.size(F.array_distinct(t)).alias("n_dist"),
    )
    kept = quality.filter(
        (F.col("n_tok") >= 5)
        & (F.col("n_dist").cast("double") / F.col("n_tok") > 0.5)
    )

    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    sh = shingle_hashes(docs, n=5)
    eval_sh = sh.filter(is_eval).select("h").distinct()
    contaminated = (
        sh.filter(~is_eval).join(eval_sh, "h").select("doc_id").distinct()
    )

    clean = kept.filter(~is_eval).join(contaminated, "doc_id", "left_anti")
    return clean.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


_DRIFT_SPLIT = "2024-01-16"  # ref = days before, cur = days from here
_DRIFT_BUCKET = 2000  # cents per fixed-width histogram bucket


@query(
    "q_dq_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type,
             CASE WHEN CAST(ts AS DATE) < DATE '{_DRIFT_SPLIT}'
                  THEN 'ref' ELSE 'cur' END AS cohort,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
               // {_DRIFT_BUCKET} AS bucket
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
def dq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor — the companion to the constraint
    gate ``q_dq_checks``: per event type, the value distribution of the
    month's second half against its first half as 2×TVD (total
    variation distance, the Σ|p_ref − p_cur| PSI-alternative that
    needs NO logarithm) over fixed-width integer-cents buckets, in
    exact ppm integers end-to-end (per-bucket shares via integer div —
    no float ever touches the hash-compared output, unlike PSI whose
    ln() the determinism conventions ban). One fact pass collapses to
    (type, bucket, cohort-counts) cells; totals broadcast back onto
    the cell table. At 100 TB this is the scheduled drift job that
    decides retraining — fixed buckets keep ref/cur comparable across
    runs, which quantile buckets would not."""
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value").cast("double") * 100.0 + 0.5).cast("long")
    tagged = ev.select(
        "event_type",
        F.when(F.to_date("ts") < F.lit(_DRIFT_SPLIT), "ref")
        .otherwise("cur")
        .alias("cohort"),
        F.expr(f"CAST(FLOOR(CAST(value AS DOUBLE) * 100.0D + 0.5D) AS BIGINT)"
               f" div {_DRIFT_BUCKET}").alias("bucket"),
    )
    cells = tagged.groupBy("event_type", "bucket").agg(
        F.count(F.when(F.col("cohort") == "ref", 1)).alias("n_ref"),
        F.count(F.when(F.col("cohort") == "cur", 1)).alias("n_cur"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"),
        F.sum("n_cur").alias("t_cur"),
        F.count("*").alias("n_buckets"),
    )
    return (
        cells.join(F.broadcast(tot), "event_type")
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
    "q_dq_profile",
    oracle="""
    WITH a AS (
      SELECT
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS k_nulls,
        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS k_dist,
        CAST(MIN(o_orderkey) AS VARCHAR) AS k_min,
        CAST(MAX(o_orderkey) AS VARCHAR) AS k_max,
        CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS c_nulls,
        CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS c_dist,
        CAST(MIN(o_custkey) AS VARCHAR) AS c_min,
        CAST(MAX(o_custkey) AS VARCHAR) AS c_max,
        CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT) AS s_nulls,
        CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS s_dist,
        MIN(o_orderstatus) AS s_min,
        MAX(o_orderstatus) AS s_max,
        CAST((SUM(len(o_orderstatus)) * 1000000) // COUNT(o_orderstatus)
             AS BIGINT) AS s_len,
        CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) AS t_nulls,
        CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS t_dist,
        CAST(CAST(floor(MIN(o_totalprice) * 100 + 0.5) AS BIGINT)
             AS VARCHAR) AS t_min,
        CAST(CAST(floor(MAX(o_totalprice) * 100 + 0.5) AS BIGINT)
             AS VARCHAR) AS t_max,
        CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT) AS d_nulls,
        CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS d_dist,
        strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S.%f') AS d_min,
        strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S.%f') AS d_max,
        CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT) AS p_nulls,
        CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS p_dist,
        MIN(o_orderpriority) AS p_min,
        MAX(o_orderpriority) AS p_max,
        CAST((SUM(len(o_orderpriority)) * 1000000)
             // COUNT(o_orderpriority) AS BIGINT) AS p_len
      FROM orders
    )
    SELECT 'o_orderkey' AS col_name, n_rows, k_nulls AS n_nulls,
           k_dist AS n_distinct, k_min AS min_repr, k_max AS max_repr,
           CAST(NULL AS BIGINT) AS avg_len_ppm FROM a
    UNION ALL
    SELECT 'o_custkey', n_rows, c_nulls, c_dist, c_min, c_max,
           CAST(NULL AS BIGINT) FROM a
    UNION ALL
    SELECT 'o_orderstatus', n_rows, s_nulls, s_dist, s_min, s_max,
           s_len FROM a
    UNION ALL
    SELECT 'o_totalprice', n_rows, t_nulls, t_dist, t_min, t_max,
           CAST(NULL AS BIGINT) FROM a
    UNION ALL
    SELECT 'o_orderdate', n_rows, d_nulls, d_dist, d_min, d_max,
           CAST(NULL AS BIGINT) FROM a
    UNION ALL
    SELECT 'o_orderpriority', n_rows, p_nulls, p_dist, p_min, p_max,
           p_len FROM a
    """,
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table column profiler (the `summarize`/dbt-profiler
    shape): ONE aggregation pass over `orders` emits, per column, the
    row count, null count, exact distinct count, min/max, and (for
    string columns) mean length in ppm — the first report a data-
    quality pipeline materializes for drift baselining and contract
    checks. Values cross engine boundaries only as canonical strings:
    doubles as exact cents (the to_cents floor(x·100+0.5) convention),
    timestamps via an explicit micro-second format — never raw float
    or timestamp repr, which engines print differently.

    Scale shape: a single scan with map-side partial aggregation; the
    six exact COUNT(DISTINCT)s share one Expand (rows × 7 map-side,
    but one pass and one shuffle of partial states). At petabyte scale
    the documented swap is HLL sketches per column
    (q_agg_hll_sketch's family) — the plan shape stays identical. The
    1-row aggregate unpivots to the 6-row report with a zero-cost
    driver-side stack."""
    o = load(spark, sf_dir, "orders")
    a = o.agg(
        F.count("*").cast("long").alias("n_rows"),
        (F.count("*") - F.count("o_orderkey")).cast("long").alias("k_nulls"),
        F.countDistinct("o_orderkey").cast("long").alias("k_dist"),
        F.min("o_orderkey").cast("string").alias("k_min"),
        F.max("o_orderkey").cast("string").alias("k_max"),
        (F.count("*") - F.count("o_custkey")).cast("long").alias("c_nulls"),
        F.countDistinct("o_custkey").cast("long").alias("c_dist"),
        F.min("o_custkey").cast("string").alias("c_min"),
        F.max("o_custkey").cast("string").alias("c_max"),
        (F.count("*") - F.count("o_orderstatus")).cast("long").alias("s_nulls"),
        F.countDistinct("o_orderstatus").cast("long").alias("s_dist"),
        F.min("o_orderstatus").alias("s_min"),
        F.max("o_orderstatus").alias("s_max"),
        F.expr(
            "CAST((SUM(length(o_orderstatus)) * 1000000)"
            " DIV COUNT(o_orderstatus) AS BIGINT)"
        ).alias("s_len"),
        (F.count("*") - F.count("o_totalprice")).cast("long").alias("t_nulls"),
        F.countDistinct("o_totalprice").cast("long").alias("t_dist"),
        F.expr(
            "CAST(CAST(floor(MIN(o_totalprice) * 100 + 0.5D) AS BIGINT)"
            " AS STRING)"
        ).alias("t_min"),
        F.expr(
            "CAST(CAST(floor(MAX(o_totalprice) * 100 + 0.5D) AS BIGINT)"
            " AS STRING)"
        ).alias("t_max"),
        (F.count("*") - F.count("o_orderdate")).cast("long").alias("d_nulls"),
        F.countDistinct("o_orderdate").cast("long").alias("d_dist"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "d_min"
        ),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
            "d_max"
        ),
        (F.count("*") - F.count("o_orderpriority")).cast("long").alias("p_nulls"),
        F.countDistinct("o_orderpriority").cast("long").alias("p_dist"),
        F.min("o_orderpriority").alias("p_min"),
        F.max("o_orderpriority").alias("p_max"),
        F.expr(
            "CAST((SUM(length(o_orderpriority)) * 1000000)"
            " DIV COUNT(o_orderpriority) AS BIGINT)"
        ).alias("p_len"),
    )
    return a.selectExpr(
        """stack(6,
          'o_orderkey', k_nulls, k_dist, k_min, k_max, CAST(NULL AS BIGINT),
          'o_custkey', c_nulls, c_dist, c_min, c_max, CAST(NULL AS BIGINT),
          'o_orderstatus', s_nulls, s_dist, s_min, s_max, s_len,
          'o_totalprice', t_nulls, t_dist, t_min, t_max, CAST(NULL AS BIGINT),
          'o_orderdate', d_nulls, d_dist, d_min, d_max, CAST(NULL AS BIGINT),
          'o_orderpriority', p_nulls, p_dist, p_min, p_max, p_len
        ) AS (col_name, n_nulls, n_distinct, min_repr, max_repr, avg_len_ppm)""",
        "n_rows",
    ).select(
        "col_name",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_repr",
        "max_repr",
        "avg_len_ppm",
    )
