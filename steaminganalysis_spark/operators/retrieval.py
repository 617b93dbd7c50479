"""Full-text retrieval scoring (round 6): BM25 ranking over the
``documents`` corpus — the retrieval kernel a training-data pipeline
uses for decontamination lookups, quality-by-query probes, and
RAG-corpus selection.

Exactness discipline: classic BM25 multiplies a log-idf by a
tf-saturation ratio — both floats. Here every factor is carried as an
exact BIGINT rational instead, so the emitted score is bit-identical
on any engine, partitioning, or summation order:

- idf is the Robertson odds ratio ``(N - df + 0.5) / (df + 0.5)`` in
  ppm WITHOUT the log — a strictly monotone transform of the classic
  value, carried as ``((2N - 2df + 1) * 1e6) // (2df + 1)`` (the
  log-free "odds idf" variant; rankings per-term are identical, and
  the variant choice is pinned in the column name ``score_ppm``).
- the tf-saturation term ``tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))``
  with k1 = 6/5 and b = 3/4 clears denominators exactly:
  avgdl = L/N (L = corpus token count) gives
  ``tf·(11/5) · 20L / (20·tf·L + 6·L + 18·dl·N)``
  = ``(tf · 44 · L) // (20·tf·L + 6·L + 18·dl·N)`` after folding the
  idf ppm factor in — pure BIGINT multiply + truncating division,
  which Spark ``DIV`` and DuckDB ``//`` evaluate identically.

Scale shape (the 100 TB story): the corpus-sized work is ONE
projection pass (token explode filtered to the query terms before any
exchange, so only matching postings ever shuffle — the tf aggregate
is O(matching docs), not O(corpus)); document frequencies and the
(N, L) constants are vocabulary-sized aggregates broadcast back; the
final top-K compiles to TakeOrderedAndProject (per-task K-row heap),
never a global sort. Reference behaviour being generalized: the
reference's substring-classify + reduceByKey counting loop
(src/main/scala/com/kowhoy/App/StreamingAnalysisApp.scala:31-44) is a
fixed-term match-and-count; BM25 is the same match-and-count extended
with the standard relevance weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import query
from steaminganalysis_spark.sources import load

BM25_TERMS = ("spark", "hash", "window")  # the fixed probe query
BM25_TOPK = 50

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)

# idf_ppm * tf * 44 * L // (20·tf·L + 6·L + 18·dl·N); idf_ppm is the
# odds ratio (2N-2df+1)*1e6 // (2df+1). Fully parenthesized so both
# engines associate identically; all factors BIGINT.
_CONTRIB = (
    "((((2 * n_docs - 2 * df + 1) * 1000000) DIV (2 * df + 1))"
    " * tf * 44 * total_len)"
    " DIV (20 * tf * total_len + 6 * total_len + 18 * dl * n_docs)"
)


# The BM25 scoring chain as shareable CTE text: q_text_bm25 emits it
# directly; q_retrieval_hybrid_rrf fuses it with the embedding ranker.
_BM25_CTES = f"""
    dl AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      FROM documents
    ),
    consts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len
      FROM dl
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    tf AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE w IN ({_TERMS_SQL}) GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks WHERE w IN ({_TERMS_SQL}) GROUP BY 1
    ),
    scored AS (
      SELECT t.doc_id,
             CAST(SUM({_CONTRIB.replace("DIV", "//")}) AS BIGINT) AS score_ppm
      FROM tf t
      JOIN dfreq d USING (w)
      JOIN dl ON dl.doc_id = t.doc_id,
      consts
      GROUP BY t.doc_id
    )
"""


@query(
    "q_text_bm25",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT s.doc_id, dl.dl AS doc_len, s.score_ppm
    FROM scored s JOIN dl ON dl.doc_id = s.doc_id
    ORDER BY s.score_ppm DESC, s.doc_id
    LIMIT {BM25_TOPK}
    """,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring for the fixed probe query
    {terms}: top-{k} documents by the exact-integer BM25 variant
    described in the module docstring (odds-ratio idf in ppm, k1=1.2,
    b=0.75 cleared to BIGINT rationals). Ties break on doc_id, so the
    emitted set is a pure function of the corpus.

    Plan: token explode is filtered to the probe terms BEFORE any
    exchange (only matching postings shuffle — O(hits), not
    O(corpus)); df and the (N, L) constants are broadcast; top-K is
    TakeOrderedAndProject."""
    scored, dl = _bm25_scored(spark, sf_dir)
    return (
        scored.join(dl, "doc_id")
        .select("doc_id", F.col("dl").alias("doc_len"), "score_ppm")
        .orderBy(F.col("score_ppm").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


CHUNKED_TOPK = 20


def _chunked_bm25_oracle() -> str:
    from steaminganalysis_spark.operators.llm import CHUNK_LEN, CHUNK_STRIDE

    contrib = _CONTRIB.replace("DIV", "//")
    return f"""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
    ks AS (
      SELECT doc_id, text, n,
             unnest(generate_series(0, (n - 1) // {CHUNK_STRIDE})) AS k
      FROM d
    ),
    chunks AS MATERIALIZED (
      SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
             CAST(k * {CHUNK_STRIDE} + 1 AS BIGINT) AS start_char,
             substr(text, k * {CHUNK_STRIDE} + 1, {CHUNK_LEN}) AS chunk_text
      FROM ks
    ),
    dl AS (
      SELECT doc_id, chunk_id,
             CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS dl
      FROM chunks
    ),
    consts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_len
      FROM dl
    ),
    toks AS (
      SELECT doc_id, chunk_id, unnest(string_split(chunk_text, ' ')) AS w
      FROM chunks
    ),
    tf AS (
      SELECT doc_id, chunk_id, w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE w IN ({_TERMS_SQL}) GROUP BY 1, 2, 3
    ),
    dfreq AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM (
        SELECT DISTINCT doc_id, chunk_id, w
        FROM toks WHERE w IN ({_TERMS_SQL})
      ) GROUP BY w
    ),
    scored AS (
      SELECT t.doc_id, t.chunk_id,
             CAST(SUM({contrib}) AS BIGINT) AS score_ppm
      FROM tf t
      JOIN dfreq d USING (w)
      JOIN dl ON dl.doc_id = t.doc_id AND dl.chunk_id = t.chunk_id,
      consts
      GROUP BY 1, 2
    )
    SELECT s.doc_id, s.chunk_id, c.start_char, s.score_ppm
    FROM scored s
    JOIN chunks c ON c.doc_id = s.doc_id AND c.chunk_id = s.chunk_id
    ORDER BY s.score_ppm DESC, s.doc_id, s.chunk_id
    LIMIT {CHUNKED_TOPK}
    """


@query("q_retrieval_chunked", oracle=_chunked_bm25_oracle())
def retrieval_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHUNK-granular BM25 retrieval — what a RAG stack actually
    retrieves: the unit is the q_text_chunk window (120 chars every
    80), not the whole document, so a hit pinpoints the exact source
    span (doc_id, chunk_id, 1-based start_char) that will be stuffed
    into the prompt. Same exact-integer BM25 as q_text_bm25 with the
    chunk table as the corpus: N = chunk count, document frequency =
    chunks containing the term, lengths = chunk token counts — scoring
    shorter units is the standard precision lever (long documents no
    longer drown the term-dense span). Top-{K} by score, ties on
    (doc_id, chunk_id): a pure function of the corpus.

    Scale shape: the chunk explosion is the same pure-map fan-out as
    q_text_chunk (zero exchanges); tokens are filtered to the probe
    terms BEFORE any exchange so only matching postings shuffle
    (O(hits), not O(chunk corpus)); df and the (N, L) constants
    broadcast back; top-K is TakeOrderedAndProject per-task heaps.
    Composition evidence: the chunker and the ranker are certified
    separately (q_text_chunk, q_text_bm25) and this key certifies
    their composition end to end. Reference parity: no retrieval
    surface in the reference (SURVEY §2 B.9 extension)."""
    from steaminganalysis_spark.operators.llm import CHUNK_LEN, CHUNK_STRIDE

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "text", F.length("text").alias("n")
    )
    chunks = d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.expr(f"(n - 1) DIV {CHUNK_STRIDE}"))
        ).alias("k"),
        "text",
    ).select(
        "doc_id",
        F.col("k").cast("long").alias("chunk_id"),
        (F.col("k") * CHUNK_STRIDE + 1).cast("long").alias("start_char"),
        F.expr(f"substring(text, k * {CHUNK_STRIDE} + 1, {CHUNK_LEN})").alias(
            "chunk_text"
        ),
    )
    dl = chunks.select(
        "doc_id",
        "chunk_id",
        F.size(F.split("chunk_text", " ")).cast("long").alias("dl"),
    )
    consts = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    toks = chunks.select(
        "doc_id", "chunk_id", F.explode(F.split("chunk_text", " ")).alias("w")
    ).filter(F.col("w").isin(*BM25_TERMS))
    tf = toks.groupBy("doc_id", "chunk_id", "w").agg(
        F.count("*").cast("long").alias("tf")
    )
    dfreq = (
        toks.select("doc_id", "chunk_id", "w")
        .distinct()
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, ["doc_id", "chunk_id"])
        .crossJoin(F.broadcast(consts))
        .withColumn("contrib", F.expr(_CONTRIB))
        .groupBy("doc_id", "chunk_id")
        .agg(F.sum("contrib").cast("long").alias("score_ppm"))
    )
    return (
        scored.join(
            chunks.select("doc_id", "chunk_id", "start_char"),
            ["doc_id", "chunk_id"],
        )
        .select("doc_id", "chunk_id", "start_char", "score_ppm")
        .orderBy(F.col("score_ppm").desc(), "doc_id", "chunk_id")
        .limit(CHUNKED_TOPK)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str):
    """(scored, dl) for the fixed probe: per-matching-document exact
    BM25 ppm score and the document-length table — the shared chain
    behind ``q_text_bm25`` and the RRF hybrid ranker."""
    docs = load(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    consts = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w").isin(*BM25_TERMS))
    tf = toks.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("tf"))
    dfreq = toks.groupBy("w").agg(
        F.countDistinct("doc_id").cast("long").alias("df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .withColumn("contrib", F.expr(_CONTRIB))
        .groupBy("doc_id")
        .agg(F.sum("contrib").cast("long").alias("score_ppm"))
    )
    return scored, dl


text_bm25.__doc__ = text_bm25.__doc__.replace(
    "{terms}", repr(BM25_TERMS)
).replace("{k}", str(BM25_TOPK))


# --- ranker evaluation ------------------------------------------------

EVAL_K = 10
# floor(1000/log2(rank+1) + 0.5) for rank 1..10 — the nDCG discount as
# integer milli literals (no runtime log in hash-checked outputs)
_EVAL_DISC = {1: 1000, 2: 631, 3: 500, 4: 431, 5: 387,
              6: 356, 7: 333, 8: 315, 9: 301, 10: 289}
_DISC_CASE = "CASE rnk " + " ".join(
    f"WHEN {r} THEN {d}" for r, d in _EVAL_DISC.items()
) + " ELSE 0 END"


def _retrieval_eval_oracle() -> str:
    return f"""
    WITH {_BM25_CTES},
    ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS rnk
      FROM scored
    ),
    rel AS (
      SELECT doc_id FROM documents
      WHERE substr(text, 1, 80) LIKE '%spark%'
    ),
    n_rel AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM rel),
    hits AS (
      SELECT r.rnk, CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM ranked r LEFT JOIN rel ON rel.doc_id = r.doc_id
      WHERE r.rnk <= {EVAL_K}
    ),
    ideal AS (
      SELECT CAST(SUM(CASE WHEN i <= nr THEN disc ELSE 0 END) AS BIGINT)
               AS idcg
      FROM (SELECT unnest(generate_series(1, {EVAL_K})) AS i), n_rel,
           LATERAL (SELECT CASE i {" ".join(f"WHEN {r} THEN {d}" for r, d in _EVAL_DISC.items())} ELSE 0 END AS disc)
    ),
    m AS (
      SELECT
        CAST((SUM(hit) * 1000000) // {EVAL_K} AS BIGINT) AS precision_ppm,
        CAST((SUM(hit) * 1000000) // (SELECT nr FROM n_rel) AS BIGINT)
          AS recall_ppm,
        CAST(COALESCE((1000000 // MIN(CASE WHEN hit = 1 THEN rnk END)), 0)
          AS BIGINT) AS mrr_ppm,
        CAST((SUM(hit * ({_DISC_CASE})) * 1000000)
             // (SELECT idcg FROM ideal) AS BIGINT) AS ndcg_ppm
      FROM hits
    )
    SELECT metric, value_ppm FROM (
      SELECT 'precision_at_{EVAL_K}' AS metric, precision_ppm AS value_ppm FROM m
      UNION ALL SELECT 'recall_at_{EVAL_K}', recall_ppm FROM m
      UNION ALL SELECT 'mrr', mrr_ppm FROM m
      UNION ALL SELECT 'ndcg_at_{EVAL_K}', ndcg_ppm FROM m
    ) ORDER BY metric
    """


@query("q_retrieval_eval", oracle=_retrieval_eval_oracle())
def retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranker evaluation — the metrics loop every retrieval stack runs
    before shipping a ranker change: precision@{K}, recall@{K}, MRR
    and nDCG@{K} of the exact-integer BM25 ranking against a
    DETERMINISTIC relevance rule (a document is relevant iff its
    leading 80-char span contains 'spark' — a lead-paragraph topicality
    proxy derived from the corpus itself, no human qrels file, and
    deliberately NOT the ranker's own signal so the metrics
    discriminate: measured precision@10 is 0.4-0.5 at every shipped
    SF, never a saturated 1.0). Every metric is exact integer ppm: the nDCG discount
    1/log2(rank+1) is a precomputed milli literal table (the linear-
    counting-table discipline — no runtime log in hash-checked
    outputs), IDCG truncates the same table at the relevant-doc count,
    and all divisions are shared truncating integer ops — so the
    evaluation numbers themselves are driver-hash-checked.

    Scale shape: the ranking chain is q_text_bm25's (postings
    prefiltered to probe terms before any exchange); the relevance
    rule is one map-side substring predicate on the scan; the
    metric fold runs over {K} rows. At 100 TB the eval cost is the
    ranker cost — the metrics are free. Reference parity: no
    retrieval surface in the reference (SURVEY §2 B.9 extension)."""
    from pyspark.sql import Window as W

    scored, _dl = _bm25_scored(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    rel = docs.filter(
        F.expr("substring(text, 1, 80) LIKE '%spark%'")
    ).select("doc_id")
    n_rel = rel.agg(F.count("*").cast("long").alias("nr"))
    ranked = scored.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.col("score_ppm").desc(), "doc_id")),
    ).filter(F.col("rnk") <= EVAL_K)
    hits = ranked.join(
        rel.withColumn("hit_", F.lit(1)), "doc_id", "left"
    ).select("rnk", F.coalesce("hit_", F.lit(0)).alias("hit"))
    idcg_case = " ".join(
        f"WHEN {r} THEN {d}" for r, d in _EVAL_DISC.items()
    )
    ideal = (
        spark.range(1, EVAL_K + 1)
        .withColumnRenamed("id", "i")
        .crossJoin(F.broadcast(n_rel))
        .selectExpr(
            f"CASE WHEN i <= nr THEN (CASE i {idcg_case} ELSE 0 END)"
            " ELSE 0 END AS disc"
        )
        .agg(F.sum("disc").cast("long").alias("idcg"))
    )
    m = (
        hits.agg(
            F.sum("hit").alias("nhit"),
            F.min(F.when(F.col("hit") == 1, F.col("rnk"))).alias("first_hit"),
            F.sum(F.col("hit") * F.expr(_DISC_CASE)).alias("dcg"),
        )
        .crossJoin(F.broadcast(n_rel))
        .crossJoin(F.broadcast(ideal))
        .selectExpr(
            f"CAST((nhit * 1000000) DIV {EVAL_K} AS BIGINT) AS precision_ppm",
            "CAST((nhit * 1000000) DIV nr AS BIGINT) AS recall_ppm",
            "CAST(COALESCE(1000000 DIV first_hit, 0) AS BIGINT) AS mrr_ppm",
            "CAST((dcg * 1000000) DIV idcg AS BIGINT) AS ndcg_ppm",
        )
    )
    rowset = m.selectExpr(
        f"stack(4, 'precision_at_{EVAL_K}', precision_ppm,"
        f" 'recall_at_{EVAL_K}', recall_ppm,"
        f" 'mrr', mrr_ppm,"
        f" 'ndcg_at_{EVAL_K}', ndcg_ppm) AS (metric, value_ppm)"
    )
    return rowset.orderBy("metric")


retrieval_eval.__doc__ = retrieval_eval.__doc__.replace("{K}", str(EVAL_K))


# --- kNN majority-vote classification --------------------------------
# The label-transfer step of weak supervision: classify held-out
# vectors by the majority label of their k nearest labeled neighbors.
# Distances are computed over MILLI-QUANTIZED integer coordinates
# (floor(x·1000 + 0.5) after an explicit cast to double), so every
# distance, ranking, and vote is exact BIGINT arithmetic — the same
# discipline as q_emb_quantize.
KNN_K = 5
KNN_TEST_MOD = 10  # vec_id % 10 == 0 → the held-out "unlabeled" slice


@query(
    "q_emb_knn_classify",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT)) AS qv
      FROM embeddings
    ),
    test AS (SELECT * FROM q WHERE vec_id % {KNN_TEST_MOD} = 0),
    train AS (SELECT * FROM q WHERE vec_id % {KNN_TEST_MOD} <> 0),
    tel AS (SELECT vec_id, unnest(qv) AS v,
                   generate_subscripts(qv, 1) AS i FROM test),
    trl AS (SELECT vec_id, unnest(qv) AS v,
                   generate_subscripts(qv, 1) AS i FROM train),
    dist AS (
      SELECT te.vec_id AS tid, tr.vec_id AS rid,
             CAST(SUM((te.v - tr.v) * (te.v - tr.v)) AS BIGINT) AS d2
      FROM tel te JOIN trl tr ON te.i = tr.i
      GROUP BY 1, 2
    ),
    knn AS (
      SELECT tid, rid, d2,
             ROW_NUMBER() OVER (PARTITION BY tid ORDER BY d2, rid) AS rn
      FROM dist
    ),
    votes AS (
      SELECT k.tid, t.label, CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM knn k JOIN train t ON t.vec_id = k.rid
      WHERE k.rn <= {KNN_K}
      GROUP BY 1, 2
    ),
    pred AS (
      SELECT tid, label, n_votes,
             ROW_NUMBER() OVER (PARTITION BY tid
                                ORDER BY n_votes DESC, label) AS rn
      FROM votes
    )
    SELECT p.tid AS vec_id,
           CAST(te.label AS BIGINT) AS true_label,
           CAST(p.label AS BIGINT) AS pred_label,
           p.n_votes
    FROM pred p JOIN test te ON te.vec_id = p.tid
    WHERE p.rn = 1
    """,
)
def emb_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification (k={K}): every held-out
    vector (vec_id % {M} == 0) is labeled by the majority label of its
    {K} nearest labeled neighbors under squared L2 over
    milli-quantized integer coordinates. Neighbor ranking ties break
    on train vec_id and vote ties on the smaller label, so the
    prediction is a pure function of the table.

    Scale shape: the held-out slice is the SMALL side and is broadcast
    — the labeled corpus never shuffles for the distance pass (the
    q_sim_topk discipline); per-query top-{K} compiles to
    WindowGroupLimit (rank pushed into the shuffle); votes are a tiny
    aggregate over {K}·|test| rows. Brute force is the declared
    baseline here; the ANN family (q_sim_ann_ivf/_pq) is the
    documented route when the labeled corpus is web-scale."""
    emb = load(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000.0 + 0.5).cast("long"),
        ).alias("qv"),
    )
    test = q.filter(F.col("vec_id") % KNN_TEST_MOD == 0).select(
        F.col("vec_id").alias("tid"),
        F.col("label").alias("true_label"),
        F.col("qv").alias("tqv"),
    )
    train = q.filter(F.col("vec_id") % KNN_TEST_MOD != 0)
    d2 = F.aggregate(
        F.zip_with("tqv", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dist = train.crossJoin(F.broadcast(test)).select(
        "tid", "true_label", F.col("vec_id").alias("rid"), "label", d2.alias("d2")
    )
    from pyspark.sql import Window as W

    knn = dist.withColumn(
        "rn",
        F.row_number().over(W.partitionBy("tid").orderBy("d2", "rid")),
    ).filter(F.col("rn") <= KNN_K)
    votes = knn.groupBy("tid", "true_label", "label").agg(
        F.count("*").cast("long").alias("n_votes")
    )
    pred = votes.withColumn(
        "prn",
        F.row_number().over(
            W.partitionBy("tid").orderBy(F.col("n_votes").desc(), "label")
        ),
    ).filter(F.col("prn") == 1)
    return pred.select(
        F.col("tid").alias("vec_id"),
        F.col("true_label").cast("long").alias("true_label"),
        F.col("label").cast("long").alias("pred_label"),
        "n_votes",
    )


# --- hybrid retrieval: reciprocal rank fusion -------------------------
# The RAG retrieval stack's standard fusion step (Cormack et al.,
# SIGIR'09): combine a LEXICAL ranker (BM25 over the probe terms) with
# a SEMANTIC ranker (embedding distance to a query vector) by summing
# 1/(K + rank) over the systems each document appears in. Rank-based
# fusion needs no score calibration between systems — which is exactly
# why production RAG uses it — and in integer ppm form it is
# bit-identical on any engine: contribution = 1e6 DIV (K + rank).
RRF_K = 60  # the standard RRF damping constant
RRF_POOL = 100  # per-system candidate list depth
RRF_TOPK = 20
RRF_QUERY_VEC = 0  # vec_id of the fixture's pseudo query embedding

_MILLI = (
    "list_transform(embedding,"
    " x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0 + 0.5) AS BIGINT))"
)


@query(
    "q_retrieval_hybrid_rrf",
    oracle=f"""
    WITH {_BM25_CTES},
    lex AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score_ppm DESC, doc_id) AS r
      FROM scored QUALIFY r <= {RRF_POOL}
    ),
    q AS (SELECT {_MILLI} AS qv FROM embeddings WHERE vec_id = {RRF_QUERY_VEC}),
    ev AS (SELECT vec_id, {_MILLI} AS v FROM embeddings
           WHERE vec_id <> {RRF_QUERY_VEC}),
    dist AS (
      SELECT ev.vec_id,
             CAST(list_sum(list_transform(generate_series(1, len(ev.v)),
                    i -> (ev.v[i] - q.qv[i]) * (ev.v[i] - q.qv[i])))
                  AS BIGINT) AS d2
      FROM ev, q
    ),
    sem AS (
      SELECT vec_id AS doc_id,
             ROW_NUMBER() OVER (ORDER BY d2, vec_id) AS r
      FROM dist QUALIFY r <= {RRF_POOL}
    ),
    fused AS (
      SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
             CAST(l.r AS BIGINT) AS lex_rank,
             CAST(s.r AS BIGINT) AS sem_rank,
             CAST(COALESCE(1000000 // ({RRF_K} + l.r), 0)
                  + COALESCE(1000000 // ({RRF_K} + s.r), 0) AS BIGINT)
               AS rrf_ppm
      FROM lex l FULL OUTER JOIN sem s ON s.doc_id = l.doc_id
    )
    SELECT doc_id, lex_rank, sem_rank, rrf_ppm
    FROM fused ORDER BY rrf_ppm DESC, doc_id LIMIT {RRF_TOPK}
    """,
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused by RECIPROCAL RANK
    FUSION: BM25 over the fixed probe terms (the exact-integer chain
    shared with ``q_text_bm25``) and squared-L2 embedding distance to
    the fixture's pseudo query vector (vec_id {Q}, milli-quantized
    integer coordinates — the ``q_emb_knn_classify`` discipline) each
    produce a top-{P} list; a document's fused score is
    Σ 1e6 DIV ({K} + rank) over the lists it appears in (NULL rank
    contributes 0 — the standard partial-overlap rule). Rank ties
    break on doc_id in both systems, so the fused top-{T} is a pure
    function of the corpus. The doc_id ↔ vec_id correspondence is the
    fixture's (documents and embeddings are parallel tables at SF
    parity; at sf0.1 the embedding side is shorter — the fusion
    handles the asymmetric coverage exactly as RAG handles a partial
    vector index).

    Scale shape: each system ends in a TakeOrderedAndProject top-{P}
    (per-task heap, no global sort — the rank window then runs over
    {P} rows, not the corpus); the semantic side broadcasts ONE query
    vector so the embedding table never shuffles; fusion is a
    {P}-vs-{P} row join. At 100 TB the corpus-sized work is one
    filtered posting pass + one map-side distance pass."""
    scored, _ = _bm25_scored(spark, sf_dir)
    from pyspark.sql import Window as W

    lex_pool = scored.orderBy(F.col("score_ppm").desc(), "doc_id").limit(RRF_POOL)
    lex = lex_pool.withColumn(
        "lex_rank",
        F.row_number()
        .over(W.orderBy(F.col("score_ppm").desc(), "doc_id"))
        .cast("long"),
    ).select("doc_id", "lex_rank")

    emb = load(spark, sf_dir, "embeddings")
    milli = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000.0 + 0.5).cast("long"),
    )
    q = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(milli.alias("qv"))
    ev = emb.filter(F.col("vec_id") != RRF_QUERY_VEC).select(
        "vec_id", milli.alias("v")
    )
    d2 = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dist = ev.crossJoin(F.broadcast(q)).select("vec_id", d2.alias("d2"))
    sem_pool = dist.orderBy("d2", "vec_id").limit(RRF_POOL)
    sem = sem_pool.withColumn(
        "sem_rank",
        F.row_number().over(W.orderBy("d2", "vec_id")).cast("long"),
    ).select(F.col("vec_id").alias("doc_id"), "sem_rank")

    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        F.expr(
            f"CAST(COALESCE(1000000 DIV ({RRF_K} + lex_rank), 0)"
            f" + COALESCE(1000000 DIV ({RRF_K} + sem_rank), 0) AS BIGINT)"
        ).alias("rrf_ppm"),
    )
    return fused.orderBy(F.col("rrf_ppm").desc(), "doc_id").limit(RRF_TOPK)


retrieval_hybrid_rrf.__doc__ = (
    retrieval_hybrid_rrf.__doc__.replace("{Q}", str(RRF_QUERY_VEC))
    .replace("{P}", str(RRF_POOL))
    .replace("{K}", str(RRF_K))
    .replace("{T}", str(RRF_TOPK))
)


# ---------------------------------------- MMR diversified retrieval

MMR_QUERY_VEC = 1  # a different probe than RRF's vec 0 so pools differ
MMR_POOL = 50  # relevance candidate pool depth
MMR_TOPK = 10  # diversified result size
MMR_REL_W = 7  # λ = 0.7 carried as integer tenths: 7·rel − 3·diversity
MMR_DIV_W = 3


def _mmr_oracle() -> str:
    """Unrolled greedy MMR as chained MATERIALIZED CTEs (the
    q_graph_wcc inlining lesson): pool = top-POOL by squared-L2 to the
    query over milli-quantized integer vectors, pairwise integer d²
    materialized once, then TOPK−1 unrolled selection steps each
    picking argmax(DIV_W·min d² to selected − REL_W·d² to query) with
    a vec_id tiebreak — pure BIGINT arithmetic end to end."""
    ctes = [
        f"e AS (SELECT vec_id, {_MILLI} AS v FROM embeddings)",
        f"q AS (SELECT v AS qv FROM e WHERE vec_id = {MMR_QUERY_VEC})",
        f"""dq AS MATERIALIZED (
          SELECT e.vec_id,
                 CAST(list_sum(list_transform(generate_series(1, len(e.v)),
                        i -> (e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i])))
                      AS BIGINT) AS d2q
          FROM e, q WHERE e.vec_id <> {MMR_QUERY_VEC})""",
        f"""pool AS MATERIALIZED (
          SELECT vec_id, d2q FROM dq ORDER BY d2q, vec_id LIMIT {MMR_POOL})""",
        """pv AS MATERIALIZED (
          SELECT p.vec_id, p.d2q, e.v FROM pool p JOIN e ON e.vec_id = p.vec_id)""",
        """pd AS MATERIALIZED (
          SELECT a.vec_id AS da, b.vec_id AS db,
                 CAST(list_sum(list_transform(generate_series(1, len(a.v)),
                        i -> (a.v[i] - b.v[i]) * (a.v[i] - b.v[i])))
                      AS BIGINT) AS d2
          FROM pv a JOIN pv b ON a.vec_id <> b.vec_id)""",
        """s1 AS MATERIALIZED (
          SELECT vec_id, d2q, 1 AS rank FROM pool ORDER BY d2q, vec_id LIMIT 1)""",
    ]
    for k in range(2, MMR_TOPK + 1):
        prev = f"s{k - 1}"
        ctes.append(
            f"""c{k} AS MATERIALIZED (
              SELECT p.vec_id, p.d2q, MIN(pd.d2) AS mind2
              FROM pool p
              JOIN pd ON pd.da = p.vec_id
              JOIN {prev} s ON s.vec_id = pd.db
              WHERE p.vec_id NOT IN (SELECT vec_id FROM {prev})
              GROUP BY p.vec_id, p.d2q)"""
        )
        ctes.append(
            f"""p{k} AS MATERIALIZED (
              SELECT vec_id, d2q, {k} AS rank FROM c{k}
              ORDER BY ({MMR_DIV_W} * mind2 - {MMR_REL_W} * d2q) DESC, vec_id
              LIMIT 1)"""
        )
        ctes.append(
            f"s{k} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL SELECT * FROM p{k})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        SELECT CAST(rank AS INT) AS rank, vec_id AS doc_id, d2q
        FROM s{MMR_TOPK} ORDER BY rank
        """
    )


def _mmr_greedy(pdf):
    """Exact integer MMR greedy over the pooled pairwise matrix —
    Python ints only, so the selection is engine-independent."""
    import pandas as pd

    d2q = {
        int(r.da): int(r.d2q_a) for r in pdf[["da", "d2q_a"]].itertuples()
    }
    d2 = {
        (int(r.da), int(r.db)): int(r.d2)
        for r in pdf[["da", "db", "d2"]].itertuples()
    }
    remaining = set(d2q)
    first = min(remaining, key=lambda i: (d2q[i], i))
    selected = [first]
    remaining.discard(first)
    while remaining and len(selected) < MMR_TOPK:
        best = max(
            remaining,
            key=lambda i: (
                MMR_DIV_W * min(d2[(i, s)] for s in selected)
                - MMR_REL_W * d2q[i],
                -i,
            ),
        )
        selected.append(best)
        remaining.discard(best)
    return pd.DataFrame(
        {
            "rank": range(1, len(selected) + 1),
            "doc_id": selected,
            "d2q": [d2q[i] for i in selected],
        }
    )


@query("q_retrieval_mmr", oracle=_mmr_oracle())
def retrieval_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE diversified retrieval (Carbonell &
    Goldstein '98) — the re-rank RAG pipelines apply so a top-k isn't
    {K} near-copies of the same passage: greedily pick
    argmax[λ·Rel(d) − (1−λ)·max_{s∈S} Sim(d, s)] until {K} documents
    are selected. Both measures are squared-L2 over the
    milli-quantized INTEGER vectors (the q_emb_knn_classify /
    q_retrieval_hybrid_rrf discipline) and λ = 0.7 is carried as
    integer tenths, so every score is a BIGINT, ties break on vec_id,
    and the whole selection is a pure function of the corpus — the
    DuckDB oracle unrolls the same {K1} greedy steps over the same
    integers.

    Scale shape: the corpus-sized work is ONE map-side distance pass
    against the broadcast query vector ending in TakeOrderedAndProject
    top-{P} (per-task heap, corpus never shuffles — the q_sim_topk
    plan); everything after operates on the {P}-row pool: a {P}×{P}
    pairwise join and a single-group applyInPandas greedy whose input
    is bounded at {P}² tiny integer rows regardless of corpus size.
    The greedy is inherently sequential (each pick conditions the
    next), so the right distributed shape IS pool-then-small-kernel —
    at 100 TB only the pool pass touches the data. Reference parity:
    no retrieval surface in the reference (SURVEY §2 B.9 extension)."""
    emb = load(spark, sf_dir, "embeddings")
    milli = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000.0 + 0.5).cast("long"),
    )
    q = emb.filter(F.col("vec_id") == MMR_QUERY_VEC).select(milli.alias("qv"))
    ev = emb.filter(F.col("vec_id") != MMR_QUERY_VEC).select(
        "vec_id", milli.alias("v")
    )
    d2 = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pool = (
        ev.crossJoin(F.broadcast(q))
        .select("vec_id", "v", d2.alias("d2q"))
        .orderBy("d2q", "vec_id")
        .limit(MMR_POOL)
    )
    a, b = pool.alias("a"), pool.alias("b")
    pair_d2 = F.aggregate(
        F.zip_with("a.v", "b.v", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("da"),
        F.col("a.d2q").alias("d2q_a"),
        F.col("b.vec_id").alias("db"),
        pair_d2.alias("d2"),
    )
    return (
        pairs.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            lambda _key, pdf: _mmr_greedy(pdf),
            "rank int, doc_id long, d2q long",
        )
        .orderBy("rank")
    )


retrieval_mmr.__doc__ = (
    retrieval_mmr.__doc__.replace("{K1}", str(MMR_TOPK - 1))
    .replace("{K}", str(MMR_TOPK))
    .replace("{P}", str(MMR_POOL))
)
