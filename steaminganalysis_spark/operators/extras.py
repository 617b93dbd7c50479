"""Round-2 additions: training-pipeline decontamination, repetition
quality filters, interval-range rolling windows, distribution windows
(ntile/cume_dist/nth_value), per-group z-score anomaly flags, and
positional explode.

Registered AFTER every round-1 module (registry.collect_queries imports
this last) so the driver's 50-entry correctness window — joins + tpch +
windows + relational this round — is not displaced.

Scale design notes:
- `q_decontaminate` is the classic train/eval n-gram decontamination
  pass (filter training docs that share any 5-gram with the eval set).
  Candidates come from an equi-join on 8-byte xxhash64 shingle keys —
  the shuffle never moves shingle strings, and when the eval corpus is
  benchmark-sized its distinct-hash side falls under the broadcast
  threshold, making the whole pass a map-side semi-join over the
  training corpus.
- `q_quality_repetition` (Gopher-style repetition filters) needs one
  shuffle on (doc_id, bigram-hash) and one on doc_id; both aggregates
  partial map-side. Per-doc token stats are pure map-side array ops.
- `q_window_rolling_time` orders on `unix_micros(ts)` (exact int64 —
  identical on any engine, no fractional-second double drift) and sums
  integer cents inside the frame, so the rolling sum is bit-exact
  under any partitioning.
- `q_anomaly_zscore` reduces each event_type to exact integer
  (n, Σcents, Σcents²) triples — a tiny broadcastable stats table —
  then flags map-side. Per-value square of cents must stay < 2^63:
  holds for |value| < ~9.5e7 at scale 2, which a metering stream
  satisfies by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from steaminganalysis_spark.functions import shingle_hashes, tokens, word_ngrams
from steaminganalysis_spark.registry import (
    SQL_DSUM,
    SQL_ROUND,
    query,
    round_half_up,
    to_cents,
)
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage

_TS_FMT = "yyyy-MM-dd HH:mm:ss"

# Deterministic ~10% eval split: same md5-prefix rule as q_sample_hash
# (pure function of the key → reproducible on any engine/partitioning).
_EVAL_PREFIX = "1a"


def _is_eval(doc_id: Column | str) -> Column:
    return F.substring(F.md5(F.col(doc_id).cast("string")), 1, 2) < _EVAL_PREFIX


@query(
    "q_decontaminate",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                       || ' ' || t[i+4] AS g
           FROM toks, unnest(generate_series(1, len(t) - 4)) AS r(i)),
    eval_sh AS (SELECT DISTINCT g FROM sh
                WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_EVAL_PREFIX}'),
    train_sh AS (SELECT * FROM sh
                 WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{_EVAL_PREFIX}')
    SELECT t.doc_id, COUNT(*) AS n_shared
    FROM train_sh t JOIN eval_sh e ON t.g = e.g
    GROUP BY t.doc_id
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: flag training documents sharing any
    word 5-gram with the (hash-split) eval set, with the count of
    distinct shared 5-grams. The join runs on 64-bit shingle hashes —
    8-byte shuffle keys — and the eval side is a distinct-hash set that
    broadcasts when the eval corpus is benchmark-sized."""
    docs = load(spark, sf_dir, "documents")
    # shingle the corpus ONCE and split by the doc_id hash afterwards
    # (shingling is per-doc, so filter-then-shingle == shingle-then-
    # filter); the staged table serves both splits — one corpus pass
    # instead of two.
    sh_all = stage(shingle_hashes(docs, n=5), "decon_shingles", bucket_col="h")
    eval_sh = sh_all.filter(_is_eval("doc_id")).select("h").distinct()
    train_sh = sh_all.filter(~_is_eval("doc_id"))
    # rows are distinct per (doc_id, h) and eval_sh is distinct per h,
    # so count(*) == count of distinct shared shingles.
    return (
        train_sh.join(eval_sh, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )


@query(
    "q_quality_repetition",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tok_stats AS (SELECT doc_id, len(t) AS n_tok,
                         len(list_distinct(t)) AS n_dist FROM toks),
    bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS g
           FROM toks, unnest(generate_series(1, len(t) - 1)) AS r(i)),
    cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2),
    top AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg FROM cnt GROUP BY 1)
    SELECT s.doc_id,
           FLOOR((1.0 - CAST(n_dist AS DOUBLE) / n_tok) * 1000000.0 + 0.5) / 1000000.0 AS dup_token_frac,
           FLOOR(CAST(top_c AS DOUBLE) / n_bg * 1000000.0 + 0.5) / 1000000.0 AS top_bigram_frac,
           (1.0 - CAST(n_dist AS DOUBLE) / n_tok > 0.2
            OR CAST(top_c AS DOUBLE) / n_bg > 0.1) AS flagged
    FROM tok_stats s JOIN top ON s.doc_id = top.doc_id
    """,
)
def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters: duplicate-token
    fraction (1 - |distinct|/|tokens|) and most-frequent-bigram mass.
    Documents dominated by repeated n-grams are low-quality training
    text; flag when either fraction exceeds its threshold. The
    fractions are exact integer ratios, so both engines agree
    bit-for-bit."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("t"))
    tok_stats = t.select(
        "doc_id",
        F.size("t").alias("n_tok"),
        F.size(F.array_distinct("t")).alias("n_dist"),
    )
    bg = t.select("doc_id", F.explode(word_ngrams(F.col("t"), 2)).alias("g"))
    cnt = bg.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    top = cnt.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("n_bg")
    )
    dup_frac = F.lit(1.0) - F.col("n_dist").cast("double") / F.col("n_tok")
    top_frac = F.col("top_c").cast("double") / F.col("n_bg")
    return (
        tok_stats.join(top, "doc_id")
        .select(
            "doc_id",
            round_half_up(dup_frac, 6).alias("dup_token_frac"),
            round_half_up(top_frac, 6).alias("top_bigram_frac"),
            ((dup_frac > 0.2) | (top_frac > 0.1)).alias("flagged"),
        )
    )


@query(
    "q_window_rolling_time",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           COUNT(*) OVER w AS n_1h,
           (CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                 OVER w AS DOUBLE) / 100.0) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 1-hour rolling count and sum over events: an
    interval-RANGE frame ordered on exact microsecond epochs. The
    frame sum accumulates integer cents (exact under any order); one
    shuffle on user_id, everything else inside the sort within each
    hash partition."""
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = to_cents(F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.count("*").over(w).alias("n_1h"),
        (F.sum(cents).over(w).cast("double") / F.lit(100.0)).alias("sum_1h"),
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           FLOOR(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0 AS cd,
           nth_value(o_orderkey, 3) OVER wf AS third_key
    FROM orders
    WINDOW w  AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: price quartile within each order
    priority (ntile), cumulative distribution, and the partition's
    third-cheapest order key (nth_value over the full frame). Ordering
    ties broken on the unique o_orderkey; cume_dist is an exact integer
    ratio. One shuffle on o_orderpriority shared by both specs."""
    o = load(spark, sf_dir, "orders")
    order_cols = [F.col("o_totalprice"), F.col("o_orderkey")]
    w = W.partitionBy("o_orderpriority").orderBy(*order_cols)
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        round_half_up(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("o_orderkey", 3).over(wf).alias("third_key"),
    )


@query(
    "q_anomaly_zscore",
    oracle="""
    WITH c AS (
      SELECT event_id, event_type, value,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ), s AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(CAST(cents AS HUGEINT)) AS sc,
             SUM(CAST(cents * cents AS HUGEINT)) AS ssc
      FROM c GROUP BY event_type
    ), z AS (
      SELECT event_id, c.event_type, value,
             (CAST(cents AS DOUBLE) - CAST(sc AS DOUBLE) / n)
               / sqrt(CAST(ssc AS DOUBLE) / n
                      - (CAST(sc AS DOUBLE) / n) * (CAST(sc AS DOUBLE) / n))
               AS zraw
      FROM c JOIN s ON c.event_type = s.event_type
    )
    SELECT event_id, event_type, value, round(zraw, 6) AS z,
           abs(zraw) > 3.0 AS flagged
    FROM z
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score anomaly flags. Group statistics are exact
    integer triples (n, Σcents, Σcents²) — order-insensitive and tiny
    (one row per event type), so the stats join broadcasts and the
    z-score + flag evaluate map-side over the event stream. Both
    engines derive mean/stddev from the same exact integers with the
    same float expression, so even the |z| > 3 boundary agrees."""
    ev = load(spark, sf_dir, "events")
    cents = to_cents(F.col("value"))
    c = ev.select("event_id", "event_type", "value", cents.alias("cents"))
    s = c.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sc"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("ssc"),
    )
    mean_c = F.col("sc").cast("double") / F.col("n")
    zraw = (F.col("cents").cast("double") - mean_c) / F.sqrt(
        F.col("ssc").cast("double") / F.col("n") - mean_c * mean_c
    )
    return (
        c.join(F.broadcast(s), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            F.round(zraw, 6).alias("z"),
            (F.abs(zraw) > 3.0).alias("flagged"),
        )
    )


@query(
    "q_fn_posexplode",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id, i - 1 AS pos, t[i] AS tok
    FROM toks, unnest(generate_series(1, len(t))) AS r(i)
    """,
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (LATERAL VIEW posexplode): one output row per
    token with its 0-based position — the tokenize-with-offsets
    primitive sequence-labeling pipelines need. Pure map-side generate;
    no shuffle at any scale."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
    )


_SPAN = 8  # tokens per span (C4 dedups 3-sentence spans; fixtures have
# no sentence punctuation, so spans are fixed 8-token chunks)


@query(
    "q_dedup_spans_global",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    chunks AS (
      SELECT doc_id, i AS pos,
             array_to_string(t[(i*{_SPAN}+1):(i*{_SPAN}+{_SPAN})], ' ') AS span
      FROM toks,
           unnest(generate_series(0,
                  CAST(ceil(len(t) / {_SPAN}.0) AS INT) - 1)) AS r(i)
    ),
    kept AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY span
                                   ORDER BY doc_id, pos) AS rn
      FROM chunks
    )
    SELECT doc_id, COUNT(*) AS n_spans,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN span END,
                                   ' ' ORDER BY pos), '')) AS cleaned_hash
    FROM kept GROUP BY doc_id
    """,
)
def dedup_spans_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style global span dedup: split every document into
    consecutive 8-token spans, keep only the FIRST occurrence of each
    span corpus-wide (first = lowest (doc_id, pos)), and rebuild the
    cleaned text (emitted as an md5 so the output stays narrow).
    One shuffle keyed on the span for the keep-first window, one on
    doc_id to reassemble — the exact shape of C4's three-sentence-span
    dedup job, which this generalizes."""
    docs = load(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens("text").alias("t"))
    n_chunks = F.ceil(F.size("t") / F.lit(float(_SPAN))).cast("int")
    chunks = t.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("t"), i * _SPAN + 1, _SPAN)
                ),
            )
        ).alias("pos", "span"),
    )
    w = W.partitionBy("span").orderBy("doc_id", "pos")
    kept = chunks.withColumn("rn", F.row_number().over(w))
    first_span = F.when(F.col("rn") == 1, F.struct("pos", "span"))
    return kept.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(first_span)),
                    lambda x: x["span"],
                ),
                " ",
            )
        ).alias("cleaned_hash"),
    )


@query(
    "q_tokenize_vocab",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tk AS (SELECT doc_id, i - 1 AS pos, t[i] AS tok
           FROM toks, unnest(generate_series(1, len(t))) AS r(i)),
    vocab AS (SELECT tok,
                     ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) - 1 AS vid
              FROM tk GROUP BY tok),
    enc AS (SELECT doc_id, pos, vid FROM tk JOIN vocab USING (tok))
    SELECT doc_id, COUNT(*) AS n_tokens,
           md5(string_agg(CAST(vid AS VARCHAR), ' ' ORDER BY pos)) AS ids_hash
    FROM enc GROUP BY doc_id
    """,
)
def tokenize_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency vocabulary + id encoding (the tokenize-to-ids
    step of a training pipeline): build word ids ranked by global
    frequency (ties on the word — fully deterministic), encode every
    document as its ordered id sequence, emit an md5 of the sequence.
    The vocabulary is corpus-DISTINCT words — tiny next to the corpus —
    so its global ranking window runs on word-count rows (one slim
    partition), never on corpus rows, and the encode join broadcasts
    the vocab against the token stream."""
    docs = load(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
    )
    wv = W.orderBy(F.col("cnt").desc(), F.col("tok"))
    vocab = (
        tk.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .withColumn("vid", F.row_number().over(wv) - 1)
        .drop("cnt")
    )
    enc = tk.join(F.broadcast(vocab), "tok")
    return enc.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "vid"))),
                    lambda x: x["vid"].cast("string"),
                ),
                " ",
            )
        ).alias("ids_hash"),
    )


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS rf,
           COALESCE(l_linestatus, '<all>') AS ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not a rollup/cube prefix pattern):
    per-returnflag totals, per-linestatus totals, and the grand total
    in ONE pass — Catalyst expands the sets into a single Expand +
    aggregate, so the fact table is scanned once, not once per set."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<all>') AS rf,
               COALESCE(l_linestatus, '<all>') AS ls,
               COUNT(*) AS n,
               SUM(CAST(l_quantity AS BIGINT)) AS qty
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_join_lateral",
    oracle="""
    SELECT n.n_name, t.c_custkey, t.c_acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) t
    """,
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-2 customers by balance per
    nation. Catalyst decorrelates this into the same
    window/group-limit plan as q_topk_per_group — the lateral is API
    surface, not a nested-loop execution."""
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation_lat n, LATERAL (
          SELECT c_custkey, c_acctbal
          FROM customer_lat c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey
          LIMIT 2
        ) t
        """
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH latest AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT COALESCE(c.c_custkey, l.user_id) AS key,
           (CASE WHEN l.user_id IS NOT NULL AND c.c_custkey IS NOT NULL
                 THEN 'update'
                 WHEN c.c_custkey IS NULL THEN 'insert'
                 ELSE 'keep' END) AS action,
           round(COALESCE(l.value, c.c_acctbal), 2) AS merged_value
    FROM customer c FULL OUTER JOIN latest l ON c.c_custkey = l.user_id
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert without a table format: compact the change stream
    to its latest row per key (CDC window), FULL OUTER join against
    the snapshot, coalesce update-over-base, and tag each row
    insert/update/keep — the exact dataflow a Delta/Iceberg MERGE
    compiles to. One shuffle to compact, one to merge; at scale the
    snapshot side is usually bucketed on the key, removing the second
    exchange."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    wlat = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.withColumn("rn", F.row_number().over(wlat))
        .filter(F.col("rn") == 1)
        .select("user_id", "value")
    )
    m = cust.select("c_custkey", "c_acctbal").join(
        latest, cust["c_custkey"] == latest["user_id"], "full_outer"
    )
    action = (
        F.when(
            F.col("user_id").isNotNull() & F.col("c_custkey").isNotNull(),
            F.lit("update"),
        )
        .when(F.col("c_custkey").isNull(), F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    return m.select(
        F.coalesce("c_custkey", "user_id").alias("key"),
        action.alias("action"),
        F.round(F.coalesce("value", "c_acctbal"), 2).alias("merged_value"),
    )


DV_FILES = 8  # simulated data files (key mod DV_FILES)
DV_WORD_BITS = 32  # positions per bitmap word (1<<31 fits BIGINT safely)


@query(
    "q_merge_deletion_vector",
    oracle=f"""
    WITH target AS MATERIALIZED (
      SELECT c_custkey AS key,
             c_custkey % {DV_FILES} AS file_id,
             ROW_NUMBER() OVER (PARTITION BY c_custkey % {DV_FILES}
                                ORDER BY c_custkey) - 1 AS pos
      FROM customer
    ),
    dels AS (
      SELECT DISTINCT user_id AS key FROM events WHERE event_type = 'error'
    ),
    dv AS MATERIALIZED (
      SELECT t.file_id,
             t.pos // {DV_WORD_BITS} AS word_idx,
             bit_or(CAST(1 AS BIGINT) << (t.pos % {DV_WORD_BITS})) AS word
      FROM target t JOIN dels d ON d.key = t.key
      GROUP BY 1, 2
    )
    SELECT t.file_id, t.pos, t.key
    FROM target t
    LEFT JOIN dv ON dv.file_id = t.file_id
               AND dv.word_idx = t.pos // {DV_WORD_BITS}
    WHERE dv.word IS NULL
       OR (dv.word & (CAST(1 AS BIGINT) << (t.pos % {DV_WORD_BITS}))) = 0
    ORDER BY t.file_id, t.pos
    """,
)
def merge_deletion_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-as-DELETION-VECTORS — the Delta Lake / Iceberg v2
    "merge-on-read" delete path: instead of rewriting data files to
    drop rows, the MERGE writes a tiny per-file BITMAP of deleted row
    positions and readers apply the mask at scan time. Target =
    the customer snapshot addressed as (file_id, pos) — key mod {NF}
    simulated data files with a stable row position inside each (in a
    real table format the position is the physical file offset, free
    at write time; the window here is the simulation's one-time write
    cost, staged). Delete set = customers with an 'error' event. The
    DV is real bitmap encoding, not a key list: per (file, {WB}-bit
    word) one BIGINT whose bit j marks position word_idx·{WB}+j
    deleted — built by ONE groupBy(file_id, word_idx) + bit_or
    aggregate over the matched keys (O(|deletes|) work, the whole
    point of DVs). The masked read joins the scan against the
    broadcast DV on (file_id, word_idx) and tests the bit map-side —
    the data files are never rewritten, never shuffled.

    Scale shape: the delete-side work is O(|deletes|) (semi-join +
    word aggregate); the DV relation is |deletes|/{WB} .. |deletes|
    words and broadcasts (a billion deletes ≈ tens of MB of words,
    still broadcastable per-file at real layouts); the read-side mask
    is a broadcast hash join + a bitwise AND inside whole-stage
    codegen — zero exchanges on the data path. Reference parity: no
    table-format surface in the reference (SURVEY §2 B.1 extension,
    next to q_merge_upsert / q_merge_with_deletes which rewrite)."""
    from steaminganalysis_spark.staging import stage

    cust = load(spark, sf_dir, "customer").select("c_custkey")
    wpos = W.partitionBy(F.col("c_custkey") % DV_FILES).orderBy("c_custkey")
    target = stage(
        cust.select(
            F.col("c_custkey").alias("key"),
            (F.col("c_custkey") % DV_FILES).alias("file_id"),
            (F.row_number().over(wpos) - 1).alias("pos"),
        ),
        "dv_target",
    )
    dels = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(F.col("user_id").alias("key"))
        .distinct()
    )
    dv = (
        target.join(dels, "key", "semi")
        .groupBy(
            "file_id", F.expr(f"pos DIV {DV_WORD_BITS}").alias("word_idx")
        )
        .agg(
            F.bit_or(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(pos % {DV_WORD_BITS} AS INT))"
                )
            ).alias("word")
        )
    )
    t = target.alias("t")
    masked = t.join(
        F.broadcast(dv.alias("dv")),
        (F.col("dv.file_id") == F.col("t.file_id"))
        & (F.col("dv.word_idx") == F.expr(f"t.pos DIV {DV_WORD_BITS}")),
        "left",
    )
    bit = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(t.pos % {DV_WORD_BITS} AS INT))"
    )
    return (
        masked.filter(
            F.col("dv.word").isNull() | (F.col("dv.word").bitwiseAND(bit) == 0)
        )
        .select(
            F.col("t.file_id").alias("file_id"),
            F.col("t.pos").alias("pos"),
            F.col("t.key").alias("key"),
        )
        .orderBy("file_id", "pos")
    )


merge_deletion_vector.__doc__ = merge_deletion_vector.__doc__.replace(
    "{NF}", str(DV_FILES)
).replace("{WB}", str(DV_WORD_BITS))


@query(
    "q_fn_map2",
    oracle="""
    WITH m AS (
      SELECT event_id,
             MAP(['a','b'], [CAST(value AS DOUBLE), CAST(user_id AS DOUBLE)]) AS mp
      FROM events
    )
    SELECT event_id,
           array_to_string(list_sort(list_transform(map_entries(mp),
                           e -> e.key || '=' || CAST(round(e.value * 2.0, 2) AS VARCHAR))),
                           ',') AS doubled,
           len(list_filter(map_entries(mp), e -> e.value > 100.0)) AS n_big
    FROM m
    """,
)
def fn_map2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_values (doubling), and a
    filtered entry count — emitted as sorted key=value strings so both
    engines agree on entry order. Pure map-side at any scale."""
    ev = load(spark, sf_dir, "events")
    mp = F.create_map(
        F.lit("a"), F.col("value").cast("double"),
        F.lit("b"), F.col("user_id").cast("double"),
    )
    doubled = F.transform_values(mp, lambda k, v: F.round(v * 2.0, 2))
    entry_strs = F.transform(
        F.map_entries(doubled),
        lambda e: F.concat(e["key"], F.lit("="), e["value"].cast("string")),
    )
    n_big = F.size(F.filter(F.map_entries(mp), lambda e: e["value"] > 100.0))
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(entry_strs), ",").alias("doubled"),
        n_big.alias("n_big"),
    )


@query(
    "q_fn_array3",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(list_filter(toks, x -> len(x) >= 6)) AS n_long,
           CAST(len(list_filter(toks, x -> x = 'spark')) > 0 AS BOOLEAN) AS has_spark,
           CAST(len(list_filter(toks, x -> len(x) >= 2)) = len(toks) AS BOOLEAN)
             AS all_ge2
    FROM t
    """,
)
def fn_array3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array predicate higher-order functions: filter-count, exists,
    forall — each a JVM lambda inside whole-stage codegen, no UDF, no
    shuffle."""
    docs = load(spark, sf_dir, "documents")
    toks = tokens("text")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) >= 6)).alias("n_long"),
        F.exists(toks, lambda x: x == "spark").alias("has_spark"),
        F.forall(toks, lambda x: F.length(x) >= 2).alias("all_ge2"),
    )


@query(
    "q_data_mix_weighted",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    p AS (SELECT source, n,
                 sqrt(CAST((SELECT MIN(n) FROM c) AS DOUBLE))
                   / sqrt(CAST(n AS DOUBLE)) AS keep_p
          FROM c),
    kept AS (
      SELECT d.source, p.keep_p FROM documents d JOIN p ON d.source = p.source
      WHERE CAST((d.doc_id * 2654435761) % 65536 AS DOUBLE) / 65536.0 < p.keep_p
    )
    SELECT source, COUNT(*) AS n_kept, round(keep_p, 6) AS keep_p
    FROM kept GROUP BY source, round(keep_p, 6)
    """,
)
def data_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened training mixture (sample source s with
    probability ∝ n_s^(α-1), α=0.5, scaled so the smallest source
    keeps everything — the standard multilingual/multi-source
    rebalancing step). The keep decision is a pure integer function of
    doc_id (Knuth multiplicative hash), so the mix is reproducible on
    any engine and any partitioning; per-source keep probabilities
    derive from exact integer counts. Source stats are a tiny
    broadcast; the filter runs map-side over the corpus scan."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    n_min = F.min("n").over(W.partitionBy(F.lit(1)))
    p = counts.select(
        "source",
        (
            F.sqrt(n_min.cast("double")) / F.sqrt(F.col("n").cast("double"))
        ).alias("keep_p"),
    )
    u = ((F.col("doc_id") * F.lit(2654435761)) % 65536).cast("double") / F.lit(
        65536.0
    )
    kept = d.join(F.broadcast(p), "source").filter(u < F.col("keep_p"))
    return kept.groupBy("source", F.round("keep_p", 6).alias("keep_p")).agg(
        F.count("*").alias("n_kept")
    ).select("source", "n_kept", "keep_p")


_IVL_MIN = 30  # interval length (minutes) and grid cell size


@query(
    "q_join_interval_overlap",
    oracle=f"""
    WITH a AS (
      SELECT user_id, event_id AS a_id, epoch_us(ts) AS a_start,
             epoch_us(ts) + {_IVL_MIN} * 60 * 1000000 AS a_end
      FROM events WHERE event_type = 'purchase'
    ), b AS (
      SELECT user_id, event_id AS b_id, epoch_us(ts) AS b_start,
             epoch_us(ts) + {_IVL_MIN} * 60 * 1000000 AS b_end
      FROM events WHERE event_type = 'view'
    )
    SELECT a.user_id, a_id, b_id,
           least(a_end, b_end) - greatest(a_start, b_start) AS overlap_us
    FROM a JOIN b ON a.user_id = b.user_id
                 AND a_start <= b_end AND b_start <= a_end
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (the time-series classic: which purchase
    windows overlap which view windows, per user) executed as a
    GRID-BUCKETED EQUI-JOIN: each 30-minute interval is exploded onto
    the 30-minute grid cells it touches (≤2), candidates come from an
    equi-join on (user_id, cell), then the exact overlap predicate
    verifies and a distinct collapses double-counted pairs. A naive
    theta join is quadratic per user at scale; this shape shuffles
    8-byte grid keys and stays linear in the true match count."""
    ev = load(spark, sf_dir, "events")
    cell_us = _IVL_MIN * 60 * 1_000_000

    def side(etype: str, prefix: str) -> DataFrame:
        start = F.unix_micros("ts")
        end = start + F.lit(cell_us)
        return ev.filter(F.col("event_type") == etype).select(
            "user_id",
            F.col("event_id").alias(f"{prefix}_id"),
            start.alias(f"{prefix}_start"),
            end.alias(f"{prefix}_end"),
            F.explode(
                F.sequence(
                    F.floor(start / F.lit(cell_us)),
                    F.floor(end / F.lit(cell_us)),
                )
            ).alias("cell"),
        )

    a = side("purchase", "a")
    b = side("view", "b")
    pairs = (
        a.join(b, ["user_id", "cell"])
        .filter(
            (F.col("a_start") <= F.col("b_end"))
            & (F.col("b_start") <= F.col("a_end"))
        )
        .select(
            "user_id",
            "a_id",
            "b_id",
            # exact int64 microseconds: a division here would need
            # truncate-vs-round parity between engines
            (
                F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
            ).alias("overlap_us"),
        )
        .distinct()
    )
    return pairs


@query(
    "q_sessionize_dynamic",
    oracle="""
    WITH o AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER w AS prev_us,
             LAG(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), flagged AS (
      SELECT *, CASE WHEN prev_us IS NULL
                       OR us - prev_us > (CASE WHEN prev_type IN ('view','click')
                                               THEN 1800000000 ELSE 600000000 END)
                     THEN 1 ELSE 0 END AS new_s
      FROM o
    ), numbered AS (
      SELECT user_id, event_id, us,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no, COUNT(*) AS n_events,
           MIN(us) AS start_us, MAX(us) AS end_us
    FROM numbered GROUP BY user_id, session_no
    """,
)
def sessionize_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization (the batch analog of Spark's
    dynamic `session_window`): browsing events (view/click) keep a
    session alive for 30 minutes, transactional events only 10 — the
    gap depends on the PREVIOUS event's type. Same gaps-and-islands
    dataflow as `q_sessionize`: lag → flag → running sum → rollup, all
    inside ONE hash partitioning of user_id (a single exchange at any
    scale). Timestamps handled as exact int64 microseconds."""
    ev = load(spark, sf_dir, "events")
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    gap = F.when(
        F.lag("event_type").over(wo).isin("view", "click"),
        F.lit(1_800_000_000),
    ).otherwise(F.lit(600_000_000))
    new_s = F.when(
        F.lag(us).over(wo).isNull() | ((us - F.lag(us).over(wo)) > gap), 1
    ).otherwise(0)
    flagged = ev.select(
        "user_id", "event_id", us.alias("us"), new_s.alias("new_s")
    )
    numbered = flagged.select(
        "user_id",
        "event_id",
        "us",
        F.sum("new_s").over(
            W.partitionBy("user_id")
            .orderBy("us", "event_id")
            .rowsBetween(W.unboundedPreceding, 0)
        ).alias("session_no"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
    )


_SALT_N = 8


@query(
    "q_join_salted",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join — the manual remedy when one join key dominates
    and AQE's skew split cannot help (e.g. the key is hot on BOTH
    inputs): the fact side gets a deterministic salt in [0, N); the
    dim side is replicated N ways (explode of a literal range, a
    narrow map-side expansion); the join key becomes (key, salt), so
    the hot key's rows spread over N partitions instead of one. The
    result is provably identical to the unsalted join — the oracle IS
    the plain join."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        (F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_SALT_N))).alias(
            "salt"
        ),
    )
    o = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(_SALT_N - 1))))
    )
    j = li.join(
        o,
        (li["l_orderkey"] == o["o_orderkey"]) & (li["salt"] == o["salt"]),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("qty"),
    )


@query(
    "q_cte_recursive",
    oracle="""
    WITH RECURSIVE days(d) AS (
      SELECT DATE '2023-12-30'
      UNION ALL
      SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '2024-02-02'
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, COALESCE(n, 0) AS n
    FROM days
    LEFT JOIN (SELECT CAST(ts AS DATE) AS ed, COUNT(*) AS n
               FROM events GROUP BY 1) e ON e.ed = d
    """,
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4) driving time-series GAP FILLING: a
    recursively generated calendar spine (deliberately wider than the
    data: Dec 30 – Feb 2) left-joined to daily event counts, so days
    with no events appear as explicit zeros — the series shape
    downstream forecasting/monitoring needs, which a plain GROUP BY
    silently omits. The spine is O(days) rows; the fact side
    aggregates before the join, so the recursion never touches event
    volume."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_rc")
    return spark.sql(
        """
        WITH RECURSIVE days(d) AS (
          SELECT DATE '2023-12-30'
          UNION ALL
          SELECT date_add(d, 1) FROM days WHERE d < DATE '2024-02-02'
        )
        SELECT date_format(d, 'yyyy-MM-dd') AS day, COALESCE(n, 0) AS n
        FROM days
        LEFT JOIN (SELECT to_date(ts) AS ed, COUNT(*) AS n
                   FROM events_rc GROUP BY 1) e ON e.ed = d
        """
    )


@query(
    "q_fn_variant",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
    FROM events
    WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 50
    GROUP BY event_type
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT type (Spark 4): parse each event's JSON
    props to a variant once, path-extract with `variant_get` (binary
    variant access — no per-access JSON re-parse, the point of the
    type), filter and aggregate. The oracle is DuckDB's JSON path
    extraction over the same strings."""
    ev = load(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "q_source_python",
    oracle="""
    WITH g AS (
      SELECT i AS order_id, (i * 2654435761) % 100000 AS amount_cents
      FROM generate_series(0, 9999) AS t(i)
    ), r AS (
      SELECT order_id, amount_cents,
             CASE WHEN amount_cents % 10 < 7 THEN 'paid' ELSE 'refund' END AS status,
             printf('2024-01-%02d', CAST(order_id % 30 + 1 AS INT)) AS day
      FROM g
    )
    SELECT day, status, COUNT(*) AS n, CAST(SUM(amount_cents) AS BIGINT) AS cents
    FROM r GROUP BY day, status
    """,
)
def source_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 connector API) end-to-end:
    the `sa_ledger` source plans 8 partitions and generates rows as a
    pure function of order_id (`sources.pysource.ledger_row`), so the
    DuckDB oracle reconstructs the identical table from
    generate_series arithmetic — a fully verifiable custom connector.
    The aggregate on top proves partition-parallel reads compose with
    the rest of the engine."""
    from steaminganalysis_spark.sources.pysource import register_ledger_source

    register_ledger_source(spark)
    ledger = spark.read.format("sa_ledger").load()
    return ledger.groupBy("day", "status").agg(
        F.count("*").alias("n"), F.sum("amount_cents").alias("cents")
    )


@query(
    "q_stream_source_python",
    oracle="""
    WITH g AS (
      SELECT i AS order_id, (i * 2654435761) % 100000 AS amount_cents
      FROM generate_series(0, 9999) AS t(i)
    ), r AS (
      SELECT amount_cents,
             CASE WHEN amount_cents % 10 < 7 THEN 'paid' ELSE 'refund' END AS status
      FROM g
    )
    SELECT status, COUNT(*) AS n, CAST(SUM(amount_cents) AS BIGINT) AS cents
    FROM r GROUP BY status
    """,
)
def stream_source_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom connector's STREAMING half, run to completion: the
    sa_ledger source emits the deterministic ledger in 2500-row
    micro-batches (offsets = row positions, committed ranges exactly
    replayable), aggregated in complete mode. The oracle regenerates
    the same rows with generate_series arithmetic — stream, batch and
    SQL all agree on the connector's contract."""
    import uuid as _uuid

    from steaminganalysis_spark.sources.pysource import register_ledger_source

    register_ledger_source(spark)
    name = f"ledger_stream_{_uuid.uuid4().hex[:8]}"
    agg = (
        spark.readStream.format("sa_ledger")
        .load()
        .groupBy("status")
        .agg(F.count("*").alias("n"), F.sum("amount_cents").alias("cents"))
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
    return spark.table(name)


@query(
    "q_stream_sink_python",
    oracle="""
    WITH g AS (
      SELECT i AS order_id, (i * 2654435761) % 100000 AS amount_cents
      FROM generate_series(0, 9999) AS t(i)
    ), r AS (
      SELECT order_id, amount_cents,
             CASE WHEN amount_cents % 10 < 7 THEN 'paid' ELSE 'refund' END AS status,
             printf('2024-01-%02d', CAST(order_id % 30 + 1 AS INT)) AS day
      FROM g
    )
    SELECT day, status, COUNT(*) AS n, CAST(SUM(amount_cents) AS BIGINT) AS cents
    FROM r GROUP BY day, status
    """,
)
def stream_sink_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom connector's STREAMING SINK half, run end-to-end: the
    sa_ledger stream source emits the deterministic ledger in
    micro-batches, `writeStream.format("sa_ledger")` drives the
    DataSourceStreamWriter (per-batch task files + atomic
    `_MANIFEST-<batchId>` publish — replayed batch ids replace their
    own manifest, so readers count each batch exactly once), and the
    manifest-honoring read-back must reconstruct the ENTIRE ledger:
    the oracle is the same generate_series arithmetic as
    `q_source_python`, so a dropped batch, a double-counted replay, or
    a stray uncommitted task file all surface as a hash mismatch."""
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.sources.pysource import (
        read_ledger_stream_output,
        register_ledger_source,
    )
    import os

    register_ledger_source(spark)
    root = scratch_dir("pysink")
    q = (
        spark.readStream.format("sa_ledger")
        .load()
        .writeStream.format("sa_ledger")
        .option("path", os.path.join(root, "out"))
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    led = read_ledger_stream_output(
        spark,
        os.path.join(root, "out"),
        "order_id long, day string, amount_cents long, status string",
    )
    return led.groupBy("day", "status").agg(
        F.count("*").alias("n"), F.sum("amount_cents").alias("cents")
    )


@query(
    "q_ts_similarity",
    oracle="""
    WITH grid AS (
      SELECT u.user_id, h.h
      FROM (SELECT DISTINCT user_id FROM events) u,
           unnest(generate_series(0, 23)) AS h(h)
    ), cnt AS (
      SELECT user_id, EXTRACT(hour FROM ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), prof AS (
      SELECT g.user_id,
             array_agg(CAST(COALESCE(cnt.n, 0) AS DOUBLE) ORDER BY g.h) AS v
      FROM grid g LEFT JOIN cnt ON g.user_id = cnt.user_id AND g.h = cnt.h
      GROUP BY g.user_id
    ), n AS (
      SELECT user_id, v,
             sqrt(list_sum(list_transform(generate_series(1, len(v)),
                                          i -> v[i] * v[i]))) AS nrm
      FROM prof
    ), pairs AS (
      SELECT a.user_id AS query_id, b.user_id AS neighbor_id,
             list_sum(list_transform(generate_series(1, len(a.v)),
                                     i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm)
               AS cosine
      FROM n a JOIN n b ON a.user_id < 5 AND a.user_id != b.user_id
    ), ranked AS (
      SELECT query_id, neighbor_id, round(cosine, 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY round(cosine, 6) DESC, neighbor_id) AS rn
      FROM pairs
    )
    SELECT query_id, neighbor_id, cosine, rn FROM ranked WHERE rn <= 3
    """,
)
def ts_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (EDBT'19 shape) over DERIVED
    series: each user's 24-dim hour-of-day activity profile (dense —
    missing hours explicit zeros via a user×hour grid), then cosine
    top-3 neighbors for the query users. Profiles are tiny fixed-width
    vectors, so the query side broadcasts and the corpus of profiles
    streams map-side — the same scale shape as q_sim_topk, applied to
    features the engine built itself. Rounded-rank tiebreaks keep the
    ranking engine-independent."""
    from steaminganalysis_spark.functions import dot, norm

    ev = load(spark, sf_dir, "events")
    cnt = ev.groupBy(
        "user_id", F.hour("ts").alias("h")
    ).agg(F.count("*").alias("n"))
    grid = (
        ev.select("user_id")
        .distinct()
        .select("user_id", F.explode(F.sequence(F.lit(0), F.lit(23))).alias("h"))
    )
    prof = (
        grid.join(cnt, ["user_id", "h"], "left")
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("h", F.coalesce("n", F.lit(0)).alias("n"))
                    )
                ),
                lambda x: x["n"].cast("double"),
            ).alias("v")
        )
    )
    withn = prof.select("user_id", "v", norm(F.col("v")).alias("nrm"))
    q = withn.filter(F.col("user_id") < 5).select(
        F.col("user_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    pairs = withn.join(
        F.broadcast(q), F.col("user_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("user_id").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rn")
    )


@query(
    "q_ts_resample",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                  AS DOUBLE) / (100.0 * COUNT(*)) AS v
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, MIN(d) AS lo, MAX(d) AS hi FROM daily GROUP BY 1
    ), grid AS (
      SELECT b.user_id, CAST(g.d AS DATE) AS d
      FROM bounds b, unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS g(d)
    ), joined AS (
      SELECT g.user_id, g.d, daily.v,
             LAST_VALUE(daily.v IGNORE NULLS) OVER w AS pv,
             LAST_VALUE(CASE WHEN daily.v IS NOT NULL THEN g.d END IGNORE NULLS)
               OVER w AS pd,
             FIRST_VALUE(daily.v IGNORE NULLS) OVER wf AS nv,
             FIRST_VALUE(CASE WHEN daily.v IS NOT NULL THEN g.d END IGNORE NULLS)
               OVER wf AS nd
      FROM grid g LEFT JOIN daily ON g.user_id = daily.user_id AND g.d = daily.d
      WINDOW w AS (PARTITION BY g.user_id ORDER BY g.d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY g.user_id ORDER BY g.d
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
           round(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE pv + (nv - pv) * (CAST(d - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
           END, 6) AS value_interp,
           (v IS NULL) AS interpolated
    FROM joined
    """,
)
def ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with linear gap interpolation — the
    standard densify step before any windowed model sees a series:
    per-user DAILY mean value on a gap-free calendar grid (each user's
    own [min_day, max_day] range via `sequence`), missing days filled
    by linear interpolation between the nearest observed neighbors
    (IGNORE NULLS window scans, one partition pass each way — no
    self-join on the calendar). Exactness: daily means are integer
    cents over counts, the interpolation expression is the identical
    IEEE arithmetic on both engines, rounded to 6. One shuffle on
    user_id shared by the window pair; the grid explode is map-side."""
    ev = load(spark, sf_dir, "events")
    cents = to_cents(F.col("value"))
    daily = ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
        (
            F.sum(cents.cast("decimal(38,0)")).cast("double")
            / (F.lit(100.0) * F.count("*"))
        ).alias("v")
    )
    bounds = daily.groupBy("user_id").agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("d"),
    )
    j = grid.join(daily, ["user_id", "d"], "left")
    wb = (
        W.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_d = F.when(F.col("v").isNotNull(), F.col("d"))
    pv = F.last("v", ignorenulls=True).over(wb)
    pd_ = F.last(obs_d, ignorenulls=True).over(wb)
    nv = F.first("v", ignorenulls=True).over(wf)
    nd = F.first(obs_d, ignorenulls=True).over(wf)
    frac = F.datediff(F.col("d"), pd_).cast("double") / F.datediff(nd, pd_).cast(
        "double"
    )
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(pv + (nv - pv) * frac)
    )
    return j.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.round(interp, 6).alias("value_interp"),
        F.col("v").isNull().alias("interpolated"),
    )


@query(
    "q_scd2_from_cdc",
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
def scd2_from_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change log: collapse each
    user's event stream into status validity intervals — consecutive
    equal statuses merge, each surviving change opens an interval
    [valid_from, valid_to) closed by the next change (NULL = current
    row). The lag-filter-lead chain shares ONE hash partitioning of
    user_id; this is the warehouse-standard history table every
    dimension pipeline maintains, derived with two window passes and
    no self-join. Both window passes (and the oracle's) tie-break on
    event_id after ts: two status changes for one user at an identical
    timestamp would otherwise make valid_to/is_current engine-order
    dependent (ADVICE r3)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", F.col("event_type").alias("status"), "ts", "event_id")
    )
    w2 = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w2)
    return changes.select(
        "user_id",
        "status",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q_yoy_revenue",
    oracle=f"""
    WITH yearly AS (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
             {SQL_DSUM("o.o_totalprice")} AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT nation, yr, revenue,
           lag(revenue) OVER (PARTITION BY nation ORDER BY yr) AS prev_revenue,
           CASE WHEN lag(revenue) OVER (PARTITION BY nation ORDER BY yr) IS NULL
                THEN NULL
                ELSE {SQL_ROUND("(revenue - lag(revenue) OVER (PARTITION BY nation ORDER BY yr)) / lag(revenue) OVER (PARTITION BY nation ORDER BY yr)")}
           END AS yoy_growth
    FROM yearly
    """,
)
def yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue comparison per nation — the standard
    period-over-period analytic: aggregate to (nation, year), then a
    LAG window over the yearly grain computes the previous period and
    the growth ratio. The window runs on the AGGREGATED table
    (nations × years — thousands of rows at any corpus size), never on
    the fact table, so the pattern costs one fact shuffle for the
    group-by (dims broadcast) plus a negligible window pass; growth is
    ``round_half_up`` so the ratio hashes identically cross-engine."""
    from steaminganalysis_spark.registry import dsum

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    yearly = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(dsum(F.col("o_totalprice")).alias("revenue"))
    )
    w = W.partitionBy("nation").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "nation",
        "yr",
        "revenue",
        prev.alias("prev_revenue"),
        F.when(
            prev.isNotNull(), round_half_up((F.col("revenue") - prev) / prev)
        ).alias("yoy_growth"),
    )


def _attribution(ev: DataFrame, first_touch: bool) -> DataFrame:
    """Shared attribution core over an arbitrary events frame with
    (user_id, ts, event_id, value, event_type, k): credit each
    purchase to the campaign (k % 5) of the EARLIEST (first-touch) or
    MOST RECENT (last-touch) strictly-prior click, ties on ts broken
    by event_id — driven directly by the tie-stress randomized test."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    pick = F.first if first_touch else F.last
    filled = ev.withColumn(
        "campaign",
        pick(
            F.when(F.col("event_type") == "click", F.col("k") % 5),
            ignorenulls=True,
        ).over(w),
    )
    return (
        filled.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("campaign").cast("string"), F.lit("organic")).alias(
                "campaign"
            )
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(to_cents(F.col("value"))).alias("attributed_cents"),
        )
    )


@query(
    "q_attribution_last_touch",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, value, event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE event_type IN ('purchase', 'click')
    ), filled AS (
      SELECT user_id, ts, event_id, value, event_type,
             last_value(CASE WHEN event_type = 'click' THEN k % 5 END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS campaign
      FROM ev
    )
    SELECT COALESCE(CAST(campaign AS VARCHAR), 'organic') AS campaign,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS attributed_cents
    FROM filled
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH marketing attribution — the as-of join put to its
    canonical use: each purchase's value is credited to the campaign
    of the user's most recent prior click (campaign = the click's
    props.k mod 5; purchases with no prior click fall to 'organic'),
    then rolled up to campaign totals in exact integer cents. Same
    single-shuffle union+window shape as ``q_join_asof`` — the
    attribution column rides the one user partitioning, and the final
    campaign rollup aggregates the already-tiny purchase set."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    return _attribution(ev, first_touch=False)


@query(
    "q_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    ), grp AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS island
      FROM days
    ), islands AS (
      SELECT user_id, island,
             COUNT(*) AS len,
             strftime(MIN(d), '%Y-%m-%d') AS streak_start,
             strftime(MAX(d), '%Y-%m-%d') AS streak_end
      FROM grp GROUP BY user_id, island
    ), best AS (
      SELECT user_id, len, streak_start, streak_end,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY len DESC, streak_start) AS rn
      FROM islands
    )
    SELECT user_id, len AS streak_days, streak_start, streak_end
    FROM best WHERE rn = 1
    """,
)
def gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — the classic consecutive-run detection
    pattern: each user's activity days collapse into maximal runs of
    consecutive dates via the date-minus-row_number trick (consecutive
    days share a constant difference, so the difference IS the island
    key — no self-join, no recursion), then the longest streak per
    user is reported (earliest on ties). Retention and engagement
    pipelines live on this. Cost at 100 TB: one distinct on
    (user, day) — partial map-side — then everything else runs inside
    the per-user sort of a single exchange; the island key is pure
    arithmetic on already-sorted rows."""
    return _gaps_islands(load(spark, sf_dir, "events"))


def _gaps_islands(ev: DataFrame) -> DataFrame:
    """Core of ``q_gaps_islands`` over an arbitrary (user_id, ts)
    frame — driven directly by the randomized ground-truth test."""
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    wd = W.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "island", F.date_sub("d", F.row_number().over(wd))
    )
    islands = grp.groupBy("user_id", "island").agg(
        F.count("*").alias("len"),
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("streak_start"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("streak_end"),
    )
    wb = W.partitionBy("user_id").orderBy(F.desc("len"), F.asc("streak_start"))
    return (
        islands.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("streak_days"),
            "streak_start",
            "streak_end",
        )
    )


@query(
    "q_attribution_first_touch",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, value, event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
      WHERE event_type IN ('purchase', 'click')
    ), filled AS (
      SELECT user_id, ts, event_id, value, event_type,
             first_value(CASE WHEN event_type = 'click' THEN k % 5 END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS campaign
      FROM ev
    )
    SELECT COALESCE(CAST(campaign AS VARCHAR), 'organic') AS campaign,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS attributed_cents
    FROM filled
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-TOUCH attribution — the companion model to
    ``q_attribution_last_touch``: each purchase credits the campaign of
    the user's EARLIEST prior click (first_value over the same trailing
    frame), so acquisition channels get the credit instead of closing
    ones. Identical single-shuffle union+window cost; running both
    models together shares the one user partitioning and the delta
    between the two rollups is the classic funnel-position report."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select(
            "user_id",
            "ts",
            "event_id",
            "value",
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
    )
    return _attribution(ev, first_touch=True)


@query(
    "q_event_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS src, next_type AS dst,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ordered WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    totals AS (SELECT src, SUM(n) AS tot FROM trans GROUP BY 1)
    SELECT t.src, t.dst, t.n,
           CAST((t.n * 1000000) // x.tot AS BIGINT) AS p_ppm
    FROM trans t JOIN totals x ON x.src = t.src
    ORDER BY t.src, t.dst
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event journeys:
    for each user's ts-ordered event sequence (event_id tie-break),
    count src→dst transitions and the per-source transition
    probability as an exact ppm integer (n·10⁶ div total). The
    user-journey transition matrix behind funnel diagnostics and
    next-action models — one window shuffle on user_id (the
    sessionize/attribution partitioning, shareable in a multi-metric
    job), then an aggregate at event-type² grain whose totals side is
    a broadcast."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next_type").alias("dst"))
        .agg(F.count("*").alias("n"))
    )
    totals = trans.groupBy("src").agg(F.sum("n").alias("tot"))
    return (
        trans.join(F.broadcast(totals), "src")
        .select("src", "dst", "n", F.expr("(n * 1000000) div tot").alias("p_ppm"))
        .orderBy("src", "dst")
    )


@query(
    "q_observe_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS n_purchases,
           CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS value_cents,
           CAST(COUNT(*) FILTER (WHERE value < 0) AS BIGINT) AS n_negative
    FROM events
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.observe`` — Spark's in-flight metric surface: named
    aggregate expressions piggyback on a query's OWN pass over the
    data (no second scan), surfacing row counts, domain-violation
    counters and checksums to the driver when the action completes —
    the mechanism behind production data-quality circuit breakers
    (batch here; the same API feeds StreamingQueryListener in
    streaming). The pipeline is forced through the noop sink once and
    the observed values are returned as a one-row frame; the oracle
    recomputes them with plain SQL, proving observation == computation.
    At 100 TB this is the free way to count bad rows — the expensive
    way is the second full scan this operator exists to avoid."""
    from pyspark.sql import Observation

    from steaminganalysis_spark.registry import to_cents

    ev = load(spark, sf_dir, "events")
    obs = Observation("dq")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchases"),
        F.sum(to_cents(F.col("value"))).cast("long").alias("value_cents"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
    )
    observed.write.format("noop").mode("overwrite").save()  # the host action
    m = obs.get
    return spark.createDataFrame(
        [(int(m["n_rows"]), int(m["n_purchases"]), int(m["value_cents"]), int(m["n_negative"]))],
        "n_rows long, n_purchases long, value_cents long, n_negative long",
    )


@query(
    "q_merge_with_deletes",
    oracle="""
    WITH target AS (
      SELECT user_id, event_type AS status,
             strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS last_ts
      FROM (SELECT user_id, event_type, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts < TIMESTAMP '2024-01-16')
      WHERE rn = 1
    ),
    cdc AS (
      SELECT user_id, event_type, ts,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
      FROM (SELECT user_id, event_type, ts,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events WHERE ts >= TIMESTAMP '2024-01-16')
      WHERE rn = 1
    )
    SELECT COALESCE(t.user_id, c.user_id) AS user_id,
           COALESCE(c.event_type, t.status) AS status,
           COALESCE(strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f'), t.last_ts)
             AS last_ts,
           (CASE WHEN c.user_id IS NULL THEN 'kept'
                 WHEN t.user_id IS NULL THEN 'inserted'
                 ELSE 'updated' END) AS action
    FROM target t FULL OUTER JOIN cdc c ON t.user_id = c.user_id
    WHERE c.op IS NULL OR c.op <> 'D'
    ORDER BY user_id
    """,
)
def merge_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with the full three-way clause set — WHEN MATCHED [AND
    op='D'] THEN DELETE / WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
    [AND op<>'D'] THEN INSERT — the complete CDC-apply semantics
    ``q_merge_upsert`` (upsert-only) leaves out. Target = each user's
    latest profile before the cutover date; CDC batch = each user's
    latest post-cutover change, with 'error' events meaning
    tombstones. Expressed as ONE full-outer join on the merge key plus
    a delete filter — exactly how Delta/Iceberg execute MERGE
    internally (join target⋈source on the condition, then per-row
    clause dispatch), so the plan is a single co-partitioned shuffle
    join at any scale with both sides pre-collapsed to latest-per-key
    (WindowGroupLimit each). A deleted user vanishes; a tombstone for
    an unknown user inserts nothing."""
    ev = load(spark, sf_dir, "events")
    cut = F.lit("2024-01-16").cast("timestamp")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ts_s = F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    target = (
        ev.filter(F.col("ts") < cut)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            ts_s.alias("last_ts"),
        )
    )
    cdc = (
        ev.filter(F.col("ts") >= cut)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_type").alias("c_status"),
            ts_s.alias("c_ts"),
            F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
        )
    )
    merged = target.join(cdc, target.user_id == cdc.c_user, "full_outer")
    return (
        merged.filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce(F.col("user_id"), F.col("c_user")).alias("user_id"),
            F.coalesce(F.col("c_status"), F.col("status")).alias("status"),
            F.coalesce(F.col("c_ts"), F.col("last_ts")).alias("last_ts"),
            F.when(F.col("c_user").isNull(), "kept")
            .when(F.col("user_id").isNull(), "inserted")
            .otherwise("updated")
            .alias("action"),
        )
        .orderBy("user_id")
    )


_KANON_K = 8  # minimum group size for a quasi-identifier cell


@query(
    "q_anonymize_kanon",
    oracle=f"""
    WITH cells AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT c_nationkey, c_mktsegment, n,
           n < {_KANON_K} AS suppress,
           CAST(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END AS BIGINT)
             AS n_suppressed_rows
    FROM cells
    """,
)
def anonymize_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — the release gate for quasi-identifier
    combinations (here nation × market segment, k={8}): every cell's
    population, a suppress flag for cells an attacker could narrow to
    fewer than k people, and the row count suppression would redact.
    The COUNTING is the whole distributed cost — one partial+final
    aggregate at QI-cell grain — and the flag is a map-side predicate,
    so the audit is exactly as scalable as any rollup. Generalization
    (coarsening nation → region until every cell clears k) is the
    documented follow-up move; the audit output is precisely its input.
    Complements ``q_fn_mask``/``q_text_pii_scrub``: those hide direct
    identifiers, this bounds re-identification by combination."""
    c = load(spark, sf_dir, "customer")
    cells = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("n"))
    return cells.select(
        "c_nationkey",
        "c_mktsegment",
        "n",
        (F.col("n") < _KANON_K).alias("suppress"),
        F.when(F.col("n") < _KANON_K, F.col("n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_suppressed_rows"),
    )


# ------------------------------------- fuzzy decontamination (round 9)

DECON_FUZZY_PPM = 500_000  # flag a pair when ≥ 50% of the eval doc leaks


# Shared with q_stream_decon_guard (streaming/queries.py): the
# streaming guard's stream≡batch contract is "union of per-batch flags
# == this batch pass", so the two keys certify against the SAME SQL.
DECON_FUZZY_ORACLE = f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id,
                  t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                       || ' ' || t[i+4] AS g
           FROM toks, unnest(generate_series(1, len(t) - 4)) AS r(i)),
    ev AS (SELECT doc_id AS eval_doc, g FROM sh
           WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_EVAL_PREFIX}'),
    evsz AS (SELECT eval_doc, COUNT(*) AS eval_ngrams FROM ev GROUP BY 1),
    tr AS (SELECT doc_id AS train_doc, g FROM sh
           WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) >= '{_EVAL_PREFIX}'),
    pairs AS (SELECT t.train_doc, e.eval_doc, COUNT(*) AS shared
              FROM tr t JOIN ev e ON t.g = e.g GROUP BY 1, 2)
    SELECT p.train_doc, p.eval_doc, p.shared, s.eval_ngrams,
           (p.shared * 1000000) // s.eval_ngrams AS containment_ppm
    FROM pairs p JOIN evsz s ON s.eval_doc = p.eval_doc
    WHERE (p.shared * 1000000) // s.eval_ngrams >= {DECON_FUZZY_PPM}
    """


@query("q_decontaminate_fuzzy", oracle=DECON_FUZZY_ORACLE)
def decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY train/eval decontamination — the per-pair threshold rule
    production pipelines actually apply (GPT-3 App. C / Llama-style
    n-gram overlap): where ``q_decontaminate`` flags a training doc on
    ANY shared 5-gram, this key computes, for each (train, eval) pair,
    the CONTAINMENT of the eval document — shared distinct 5-grams
    over the eval doc's distinct 5-grams — and reports the pairs at
    ≥ 50%, i.e. "at least half of this benchmark item leaks through
    that training document". Rewritten eval items that no exact-match
    pass catches sit exactly here (the fixtures' planted near-dups
    measure 85-100% containment while the background tops out ~2%, so
    the 50% bar is decision-relevant at every SF). Containment is the
    right asymmetric metric for decontamination — a long training doc
    containing a whole eval item must flag even though its Jaccard is
    tiny. ``(shared · 1e6) DIV eval_ngrams`` keeps the ratio an exact
    BIGINT on both engines.

    Scale shape (one corpus pass + benchmark-sized everything else):
    the corpus is shingled ONCE into distinct (doc_id, xxhash64) rows
    (staged — the 8-byte-key discipline of q_decontaminate; shingle
    strings never shuffle) and both splits project from it. The eval
    side is benchmark-sized by construction, so the hash join's build
    side and the per-eval-doc size table both broadcast; the pair
    aggregate's key space is bounded by Σ_g train_df(g)·eval_df(g) —
    at corpus scale boilerplate shingles are the one blowup risk, and
    ``functions.text.cap_document_frequency`` is the standing guard
    (not applied here: the fixtures' eval split is clean and the
    uncapped metric stays exact). Reference parity: no curation
    surface in the reference (SURVEY §2 B.11 extension)."""
    docs = load(spark, sf_dir, "documents")
    sh_all = stage(shingle_hashes(docs, n=5), "deconf_shingles", bucket_col="h")
    ev = sh_all.filter(_is_eval("doc_id")).select(
        F.col("doc_id").alias("eval_doc"), "h"
    )
    evsz = ev.groupBy("eval_doc").agg(F.count("*").alias("eval_ngrams"))
    tr = sh_all.filter(~_is_eval("doc_id")).select(
        F.col("doc_id").alias("train_doc"), "h"
    )
    shared = (
        tr.join(ev, "h")
        .groupBy("train_doc", "eval_doc")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(F.broadcast(evsz), "eval_doc")
        .withColumn(
            "containment_ppm",
            F.expr("(shared * 1000000) DIV eval_ngrams"),
        )
        .filter(F.col("containment_ppm") >= DECON_FUZZY_PPM)
        .select(
            "train_doc", "eval_doc", "shared", "eval_ngrams", "containment_ppm"
        )
    )
