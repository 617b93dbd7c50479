"""Corpus-preparation operators (round 4): the remaining steps a
large-scale pre-training data pipeline runs between "cleaned corpus"
and "training shards" — chunking, deterministic global shuffling,
inverted-index construction, incremental dedup of a new crawl against
the existing corpus, and key-skew profiling. All are registered with
exact DuckDB oracles (registration order puts them AFTER the round-4
correctness window; they are the first members of the round-5 window).

Scale notes (the 100 TB contract each operator is designed against):

- ``q_chunk_documents`` is a pure map: tokenize → window starts →
  slice → posexplode, all inside one projection with ZERO exchanges —
  chunking 100 TB is embarrassingly parallel and the plan must say so.
- ``q_shuffle_deterministic`` assigns every document its position in a
  seeded global permutation as a PURE FUNCTION of (seed, doc_id) —
  md5 is uniform, so lexicographic (shard, shuffle_key) order is a
  balanced total order. The assignment itself is map-side (zero
  exchanges); materializing the shuffled order is one
  ``repartitionByRange(shard, shuffle_key)`` whose ranges are
  uniform by construction — no skew, no single-partition global sort,
  and re-running with the same seed reproduces the exact permutation
  (the property training-data reshuffles need for resumability).
- ``q_index_inverted`` caps document frequency BEFORE collecting
  postings (the ``cap_document_frequency`` pattern, functions/text.py):
  a stopword token's posting set is O(corpus) — collecting it is the
  same k² class of blow-up as the hot-shingle join, so hot tokens are
  dropped first and per-token state is bounded by the cap. The cap is
  replicated in the oracle (HAVING df <= cap), so exactness holds at
  every SF, not just ones where the cap is inert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from steaminganalysis_spark.functions import tokens
from steaminganalysis_spark.registry import SQL_ROUND, query, round_half_up
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage

CHUNK_TOKENS = 50  # tokens per chunk
CHUNK_STRIDE = 40  # start-to-start distance (=> 10-token overlap)

_INDEX_DF_CAP = 1000  # max docs a token may appear in before it is
# dropped as a stopword (bounds per-token posting state — same guard
# class as the shingle DF cap)
_POSTINGS_K = 20  # postings kept per token (smallest doc_ids)


@query(
    "q_chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), idx AS (
      SELECT doc_id, t, r.i
      FROM toks,
           unnest(generate_series(0,
             CAST(floor((len(t) - 1) / {CHUNK_STRIDE}.0) AS BIGINT))) AS r(i)
      WHERE len(t) >= 1
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           array_to_string(
             t[i * {CHUNK_STRIDE} + 1 : least(i * {CHUNK_STRIDE} + {CHUNK_TOKENS}, len(t))],
             ' ') AS chunk_text,
           CAST(least(i * {CHUNK_STRIDE} + {CHUNK_TOKENS}, len(t))
                - i * {CHUNK_STRIDE} AS BIGINT) AS n_tokens
    FROM idx
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking ({CHUNK}-token windows every
    {STRIDE} tokens) — the standard pre-training / retrieval prep step
    that turns documents into model-sized pieces. Every document yields
    ceil(n/stride) chunks (the last one short); a chunk knows its
    ordinal so downstream packing/shuffling can cite provenance.

    Plan shape: tokenize → sequence of window starts → slice per start
    → posexplode — ONE projection, zero exchanges (verified in
    tests/test_corpus_ops.py): chunking is embarrassingly parallel and
    the physical plan must not say otherwise."""
    d = load(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    starts = F.sequence(
        F.lit(0), F.floor((n - F.lit(1)) / F.lit(CHUNK_STRIDE)).cast("int")
    )
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            F.concat_ws(
                " ", F.slice(toks, i * CHUNK_STRIDE + 1, CHUNK_TOKENS)
            ).alias("chunk_text"),
            (F.least(i * CHUNK_STRIDE + CHUNK_TOKENS, n) - i * CHUNK_STRIDE)
            .cast("long")
            .alias("n_tokens"),
        ),
    )
    return (
        d.filter(n >= 1)
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


chunk_documents.__doc__ = chunk_documents.__doc__.replace(
    "{CHUNK}", str(CHUNK_TOKENS)
).replace("{STRIDE}", str(CHUNK_STRIDE))

_SHUFFLE_SEED = "epoch-0"


@query(
    "q_shuffle_deterministic",
    oracle=f"""
    SELECT doc_id,
           substr(md5('{_SHUFFLE_SEED}' || ':' || CAST(doc_id AS VARCHAR)), 1, 2)
             AS shard,
           md5('{_SHUFFLE_SEED}' || ':' || CAST(doc_id AS VARCHAR)) AS shuffle_key
    FROM documents
    """,
)
def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle assignment: every document's
    position in the epoch's permutation is ``md5(seed:doc_id)`` — a
    pure map-side function, ZERO exchanges in this plan. Sorting by
    (shard, shuffle_key) IS the permutation: md5 is uniform, so the 256
    two-hex-digit shards are balanced by construction and a consumer
    materializes the shuffled corpus with one
    ``repartitionByRange("shard", "shuffle_key")`` +
    ``sortWithinPartitions`` — balanced ranges, no global single-
    partition sort, and the same seed reproduces the identical
    permutation (resumable training epochs). A new epoch is a new seed,
    never a re-read of random() state."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(
        F.concat_ws(":", F.lit(_SHUFFLE_SEED), F.col("doc_id").cast("string"))
    )
    return d.select(
        "doc_id",
        F.substring(key, 1, 2).alias("shard"),
        key.alias("shuffle_key"),
    )


def materialize_epoch_shuffle(
    df: DataFrame,
    seed: str,
    key_col: str = "doc_id",
    num_shards: int = 256,
) -> DataFrame:
    """Materialize the shuffled order ``q_shuffle_deterministic``
    assigns: tag every row with its md5 permutation key, then
    ``repartitionByRange`` + ``sortWithinPartitions`` on it. Reading
    the output shards in shard order IS the seeded global permutation.

    Scale shape: md5 keys are uniform, so the range split is balanced
    with NO skew sampling surprises and no single-partition global
    sort (the plan audit asserts rangepartitioning and the absence of
    SinglePartition). One shuffle — the unavoidable one: rows must
    physically move to their epoch positions. Same seed → identical
    shard contents and order, which is what makes a training run
    resumable mid-epoch."""
    key = F.md5(
        F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string"))
    )
    return (
        df.withColumn("_shuffle_key", key)
        .repartitionByRange(num_shards, "_shuffle_key")
        .sortWithinPartitions("_shuffle_key")
    )


@query(
    "q_index_inverted",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT doc_id, u.token
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents) u
    ), hot AS (
      SELECT token FROM pairs GROUP BY token
      HAVING COUNT(*) > {_INDEX_DF_CAP}
    )
    SELECT p.token, CAST(COUNT(*) AS BIGINT) AS doc_freq,
           array_to_string((list(p.doc_id ORDER BY p.doc_id))[1:{_POSTINGS_K}], ',')
             AS postings
    FROM pairs p
    WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.token = p.token)
    GROUP BY p.token
    """,
)
def index_inverted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the corpus: token → document frequency +
    the first {K} postings (smallest doc_ids — deterministic). The
    retrieval-side artifact of every search/dedup system.

    Scale order matters: document frequency is aggregated FIRST and
    tokens above the DF cap are dropped BEFORE any posting list is
    collected — a stopword's posting set is O(corpus), so collecting
    it then filtering is the same single-key blow-up the shingle DF
    cap exists for. The cap is part of the operator's semantics and is
    replicated in the oracle (HAVING <= cap), so the key stays exact
    at any SF. Post-cap, per-token state is bounded by cap ids.

    The broadcast side is the HOT set (tokens ABOVE the cap — a
    bounded stopword list), anti-joined away, never the kept
    vocabulary: at corpus scale the kept side is the long tail of rare
    tokens (potentially billions of typos/numbers) and broadcasting it
    would be a driver OOM. Document frequency is then just COUNT(*)
    inside the same posting aggregate (pairs are distinct), so no
    join-back is needed at all. The distinct (doc_id, token) pair
    table is STAGED once (staging.stage — Catalyst does not
    canonicalize across the two aliased uses), so the
    tokenize+distinct pass runs once, not once per branch."""
    from steaminganalysis_spark.staging import stage

    d = load(spark, sf_dir, "documents")
    pairs = stage(
        d.select("doc_id", F.explode(tokens("text")).alias("token")).distinct(),
        "inverted_pairs",
    )
    hot = (
        pairs.groupBy("token")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") > _INDEX_DF_CAP)
        .select("token")
    )
    return (
        pairs.join(F.broadcast(hot), "token", "left_anti")
        .groupBy("token")
        .agg(
            F.count("*").alias("doc_freq"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.sort_array(F.collect_set("doc_id")), 1, _POSTINGS_K),
                    lambda x: x.cast("string"),
                ),
            ).alias("postings"),
        )
    )


index_inverted.__doc__ = index_inverted.__doc__.replace("{K}", str(_POSTINGS_K))


@query(
    "q_dedup_incremental",
    oracle="""
    SELECT d.doc_id, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id % 5 = 0
      AND NOT EXISTS (
        SELECT 1 FROM documents r
        WHERE r.doc_id % 5 <> 0 AND md5(r.text) = md5(d.text)
      )
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: keep only the NEW-batch documents whose
    content hash does not already exist in the reference corpus — the
    steady-state shape of production dedup, where each crawl snapshot
    is deduped against petabytes of already-accepted corpus rather
    than re-deduping the world. (The fixture split is deterministic:
    ``doc_id % 5 == 0`` is the new batch, the rest is the corpus.)

    Plan shape: the corpus side reduces to DISTINCT 16-byte content
    hashes BEFORE the shuffle — the anti-join never moves corpus text,
    only hashes, so the shuffled bytes are O(|corpus|·16B) regardless
    of document size. At 100 TB the standing corpus-hash table is a
    bucketed table on the hash (build once, append per batch), making
    each incremental run a zero-exchange bucket-local anti-join on the
    corpus side; Spark's runtime row-level Bloom pruning
    (spark.sql.optimizer.runtime.bloomFilter, enabled in session.py)
    additionally prunes new-batch rows before the shuffle when the
    batch is far larger than the corpus delta."""
    d = load(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0).withColumn("h", F.md5("text"))
    corpus_hashes = (
        d.filter(F.col("doc_id") % 5 != 0).select(F.md5("text").alias("h")).distinct()
    )
    return batch.join(corpus_hashes, "h", "left_anti").select(
        "doc_id", "source", "n_chars"
    )


_SKEW_TOP_K = 5


@query(
    "q_skew_profile",
    oracle=f"""
    WITH pk AS (
      SELECT l_suppkey AS suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total_rows,
             COUNT(*) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_cnt
      FROM pk
    ), ranked AS (
      SELECT suppkey, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, suppkey) AS rnk
      FROM pk
    )
    SELECT CAST(r.rnk AS BIGINT) AS rnk, r.suppkey, r.cnt,
           {SQL_ROUND("r.cnt * 100.0 / t.total_rows")} AS share_pct,
           t.n_keys, t.total_rows,
           {SQL_ROUND("t.max_cnt * 1.0 * t.n_keys / t.total_rows")} AS skew_ratio
    FROM ranked r, tot t
    WHERE r.rnk <= {_SKEW_TOP_K}
    """,
)
def skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew profiler: per-key counts for a join/shuffle key, the
    top-{K} heaviest keys with their share of all rows, and the global
    skew ratio (max key count / mean key count) — the diagnostic every
    100 TB shuffle plan should be checked against BEFORE it runs,
    since a skew ratio ≫ 1 is exactly the straggler condition that
    motivates salting (``q_join_salted``/``q_agg_salted``) and AQE
    skew-split.

    Plan shape: ONE shuffle (the per-key count, with map-side partial
    combine); the summary is a single-row aggregate over the key
    domain, the top-{K} is TakeOrderedAndProject (never a global
    sort), and the 5-row ranked slice cross-joins the broadcast 1-row
    summary — the same bounded 1×N pattern as the DQ summary in
    operators/pipeline.py."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    pk = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(F.count("*").alias("cnt"))
    tot = pk.agg(
        F.sum("cnt").alias("total_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    top = pk.orderBy(F.desc("cnt"), F.asc("suppkey")).limit(_SKEW_TOP_K)
    w = Window.orderBy(F.desc("cnt"), F.asc("suppkey"))
    ranked = top.withColumn("rnk", F.row_number().over(w).cast("long"))
    return ranked.crossJoin(F.broadcast(tot)).select(
        "rnk",
        "suppkey",
        "cnt",
        round_half_up(F.col("cnt") * 100.0 / F.col("total_rows")).alias("share_pct"),
        "n_keys",
        "total_rows",
        round_half_up(F.col("max_cnt") * 1.0 * F.col("n_keys") / F.col("total_rows")).alias(
            "skew_ratio"
        ),
    )


skew_profile.__doc__ = skew_profile.__doc__.replace("{K}", str(_SKEW_TOP_K))


_LM_TOP_K = 50


@query(
    "q_ngram_lm",
    oracle=f"""
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
    ), big AS (
      SELECT t[r.i] AS w1, t[r.i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS r(i)
      WHERE len(t) >= 2
    ), uni AS (
      SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1
    ), bg AS (
      SELECT w1, w2, COUNT(*) AS cnt FROM big GROUP BY w1, w2
    )
    SELECT b.w1, b.w2, b.cnt,
           {SQL_ROUND("b.cnt * 1.0 / u.c1")} AS cond_p
    FROM bg b JOIN uni u USING (w1)
    ORDER BY b.cnt DESC, b.w1, b.w2
    LIMIT {_LM_TOP_K}
    """,
)
def ngram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model statistics over the corpus: bigram counts
    and conditional probabilities P(w2|w1) = c(w1,w2) / c(w1,·) — the
    KenLM-style count step behind perplexity-based quality filtering
    and contamination heuristics. Emits the top-{K} bigrams (count
    desc, then lexicographic — deterministic).

    Scale shape: the bigram stream is a pure map (slice+zip+explode, no
    exchange); both count aggregates have map-side partial combine, and
    the context-total denominator c(w1,·) joins back to the bigram
    counts on an EQUI-join keyed by w1 — never a STATIC broadcast hint
    on the unigram table, whose size is the full vocabulary (unbounded
    at corpus scale: typos, numbers, code; AQE may still pick a runtime
    broadcast when the measured size is small, which is the right
    adaptive call). The top-{K} is
    TakeOrderedAndProject. Hot contexts (stopwords start millions of
    bigrams) skew the w1 shuffle: AQE skew-split handles the join; the
    aggregates are fine because partial combine collapses each
    partition to its distinct keys first."""
    d = load(spark, sf_dir, "documents")
    toks = tokens("text")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"), F.slice(toks, 2, n - 1).alias("w2")
    )
    big = (
        d.filter(n >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    uni = big.groupBy("w1").agg(F.count("*").alias("c1"))
    bg = big.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    return (
        bg.join(uni, "w1")
        .select(
            "w1",
            "w2",
            "cnt",
            round_half_up(F.col("cnt") * 1.0 / F.col("c1")).alias("cond_p"),
        )
        .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(_LM_TOP_K)
    )


ngram_lm.__doc__ = ngram_lm.__doc__.replace("{K}", str(_LM_TOP_K))


@query(
    "q_quality_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), big AS (
      SELECT doc_id, t[r.i] AS w1, t[r.i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS r(i)
      WHERE len(t) >= 2
    ), uni AS (
      SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1
    ), bg AS (
      SELECT w1, w2, COUNT(*) AS cnt FROM big GROUP BY w1, w2
    ), scored AS (
      SELECT b.doc_id, (g.cnt * 1000000) // u.c1 AS ppm
      FROM big b
      JOIN bg g ON b.w1 = g.w1 AND b.w2 = g.w2
      JOIN uni u ON b.w1 = u.w1
    )
    SELECT doc_id, COUNT(*) AS n_bigrams,
           CAST(SUM(ppm) AS BIGINT) // COUNT(*) AS score_ppm
    FROM scored GROUP BY doc_id
    """,
)
def quality_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model quality scoring (the CCNet / Gopher "perplexity
    filter" step): score every document by how predictable its text is
    under a bigram LM trained on the corpus itself. Per bigram the
    model probability is P(w2|w1) = c(w1,w2)/c(w1,·); the document
    score is the mean bigram probability. Low scores mark the
    high-perplexity tail (garbled text, boilerplate soup) that
    pre-training pipelines drop; a real deployment thresholds on the
    two tails of this column.

    Determinism contract: true perplexity exponentiates a mean of
    logs, but ``ln`` is not bit-identical across engines (JVM StrictMath
    vs libm — the same class of divergence ``round_half_up`` exists to
    kill), so the pinned score is a pure-rational proxy: each bigram's
    probability in parts-per-million by INTEGER division
    (``cnt * 1e6 div c1``), then the integer mean per document. Both
    engines do exact int64 arithmetic — no float enters the plan — and
    the ranking is monotone in mean probability, which is what the
    filter thresholds on. (The DuckDB twin casts its HUGEINT sum back
    to BIGINT — the q_tpch_q12 type-class rule.)

    Scale shape (100 TB): the hashed bigram stream
    (doc_id, xxhash64(w1), xxhash64(w1,w2)) is STAGED ONCE
    (``staging.stage``, bucketed on the bigram hash) and feeds all
    three consumers — the context totals, the bigram counts, and the
    per-occurrence score join — so the corpus is tokenized exactly
    once and every downstream shuffle moves 8-byte keys, never words
    (the `_shingle_hashes` convention; 64-bit collisions are
    negligible and only merge counts, they cannot drop rows). Both
    count aggregates have map-side partial combine; the score join is
    an EQUI-join on the staged bucket key (hot stopword contexts skew
    the h1 side — AQE skew-split handles it, and no posting/list state
    is ever collected, so there is no k² blow-up mode); the final
    per-document mean is one partial+final hash aggregate on doc_id."""
    return _lm_scores(load(spark, sf_dir, "documents"))


def _lm_scores(d: DataFrame, tag: str = "lm_bigrams") -> DataFrame:
    """Core of ``q_quality_lm_score`` over an arbitrary documents
    frame (doc_id, text) — reused by the composed selection pipeline,
    which trains the LM on the DEDUPED corpus."""
    toks = tokens("text")
    n = F.size(toks)
    pairs = F.arrays_zip(
        F.slice(toks, 1, n - 1).alias("w1"), F.slice(toks, 2, n - 1).alias("w2")
    )
    big = (
        d.filter(n >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            F.xxhash64(F.col("p.w1")).alias("h1"),
            F.xxhash64(F.col("p.w1"), F.col("p.w2")).alias("h2"),
        )
    )
    big = stage(big, tag, bucket_col="h2")
    uni = big.groupBy("h1").agg(F.count("*").alias("c1"))
    bg = big.groupBy("h2").agg(F.count("*").alias("cnt"))
    scored = (
        big.join(bg, "h2")
        .join(uni, "h1")
        .select("doc_id", F.expr("cnt * 1000000 DIV c1").alias("ppm"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.expr("sum(ppm) DIV count(*)").alias("score_ppm"),
    )


_BPE_MERGES = 5  # merge rounds learned by q_bpe_train


def _bpe_merge_step(left: str, right: str):
    """Fold step merging non-overlapping left-to-right occurrences of
    the symbol pair (left, right): if the accumulator ends with `left`
    and the incoming symbol is `right`, replace the tail with the
    merged symbol — because the merged symbol is a NEW string, a
    just-merged tail can't immediately merge again, which is exactly
    BPE's left-to-right non-overlap rule."""

    def step(acc, s):
        tail = F.try_element_at(acc, F.lit(-1))
        hit = (F.size(acc) > 0) & (tail == F.lit(left)) & (s == F.lit(right))
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return step


def bpe_train(spark: SparkSession, sf_dir: str, n_merges: int = _BPE_MERGES):
    """Distributed BPE tokenizer training (Sennrich'16), Spark-first:

    1. ONE pass over the corpus builds the word-count vocabulary —
       after that, every merge round iterates on the DISTINCT-WORD
       table (|V| rows), never the corpus. This is the property that
       makes BPE trainable at 100 TB: the corpus contributes exactly
       one shuffle (the word count, map-side combined), and the
       iteration cost is O(|V|) per round regardless of corpus size.
    2. Each round: explode adjacent symbol pairs weighted by word
       count → hash-aggregate pair counts (partial+final) → the single
       best pair comes to the driver (O(1) rows — the Lloyd-iteration
       convention of operators/ann.py) → a pure-map fold rewrites each
       word's symbol array, merging that pair left-to-right. The vocab
       frame is re-staged (localCheckpoint / durable table via
       ``staging.stage``) every round so the iterative plan's lineage
       stays flat.
    3. Ties on pair count break lexicographically (count desc, left,
       right) — fully deterministic, pinned against a driver-side
       Python reimplementation in tests/test_corpus_ops.py.

    Returns (merges, vocab): the learned merge table
    [(rank, left, right, merged, pair_count)] and the final segmented
    vocabulary DataFrame (word, n, symbols)."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    return bpe_train_on_words(words, n_merges)


def bpe_train_on_words(words: DataFrame, n_merges: int = _BPE_MERGES):
    """The trainer's core loop over an arbitrary (word, n) count table
    — split out so edge-case tests can drive it with adversarial
    vocabularies (repeated characters, ties, merge exhaustion) without
    a corpus fixture."""
    vocab = stage(
        words.select(
            "word",
            "n",
            F.expr(
                "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
            ).alias("symbols"),
        ),
        "bpe_vocab",
        bucket_col="word",
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pairs = vocab.select(
            "n",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("symbols"), 1, F.size("symbols") - 1).alias("a"),
                    F.slice(F.col("symbols"), 2, F.size("symbols") - 1).alias("b"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
        merges.append((rank, a, b, a + b, cnt))
        vocab = stage(
            vocab.select(
                "word",
                "n",
                F.aggregate(
                    "symbols",
                    F.array().cast("array<string>"),
                    _bpe_merge_step(a, b),
                ).alias("symbols"),
            ),
            "bpe_vocab",
            bucket_col="word",
        )
    return merges, vocab


@query("q_bpe_train")
def bpe_train_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered surface of the BPE trainer (rows-only: the merge
    loop is iterative and driver-coordinated, the same non-SQL class
    as q_dedup_clusters; exactness is pinned by the Python-BPE
    equivalence test instead). Emits the final segmented vocabulary —
    each distinct word with its count and its post-merge symbol
    sequence joined by '·' — plus the number of merges applied, so a
    wrong merge order, a missed occurrence, or an overlap bug all
    change the output."""
    merges, vocab = bpe_train(spark, sf_dir)
    return vocab.select(
        "word",
        "n",
        F.concat_ws("·", "symbols").alias("segmentation"),
        F.lit(len(merges)).cast("long").alias("n_merges"),
    )


@query(
    "q_dsir_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
      FROM documents
    ), tgt AS (
      SELECT w, COUNT(*) AS t_cnt FROM tok WHERE lang = 'en' GROUP BY w
    ), raw AS (
      SELECT w, COUNT(*) AS r_cnt FROM tok GROUP BY w
    ), totals AS (
      SELECT (SELECT COUNT(*) FROM tok WHERE lang = 'en') AS t_total,
             (SELECT COUNT(*) FROM tok) AS r_total
    ), scored AS (
      SELECT tok.doc_id, tok.lang,
             (COALESCE(tgt.t_cnt, 0) * 1000000) // totals.t_total
               - (raw.r_cnt * 1000000) // totals.r_total AS diff_ppm
      FROM tok
      JOIN raw ON tok.w = raw.w
      LEFT JOIN tgt ON tok.w = tgt.w
      CROSS JOIN totals
    )
    SELECT doc_id, lang, COUNT(*) AS n_tokens,
           CAST(CAST(SUM(diff_ppm) AS BIGINT)
                // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS dsir_ppm
    FROM scored GROUP BY doc_id, lang
    """,
)
def dsir_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scoring for domain-targeted data selection
    (Xie'23 "Data Selection via Importance Resampling", reduced to a
    cross-engine-exact form): with the English subset as the target
    domain, each document is scored by the mean over its tokens of
    (target token frequency − corpus token frequency), both in integer
    parts-per-million. Documents whose unigram distribution resembles
    the target score high and are what importance resampling keeps;
    the real DSIR uses a log-ratio of hashed-n-gram probabilities —
    the log is replaced by the frequency DIFFERENCE here for the same
    reason as ``q_quality_lm_score``: ``ln`` is not bit-identical
    across engines, while the difference is pure int64 arithmetic and
    preserves the resemble-the-target ordering the selection needs
    (monotone in the per-token comparison; the English-docs-score-
    higher invariant is pinned in tests/test_corpus_ops.py). The final
    mean divides a possibly NEGATIVE sum: Spark ``DIV`` and DuckDB
    ``//`` both truncate toward zero on integers (probed: -7/2 → -3
    on both), so the rounding direction cannot diverge.

    Scale shape: the hashed token stream (doc_id, lang, xxhash64(w))
    is STAGED ONCE and feeds the target counts, the corpus counts and
    the per-occurrence score join — one corpus tokenization, all
    shuffles on 8-byte keys. The two scalar totals ride in as
    single-row broadcast cross-joins (the scalar-subquery shape, never
    a collect); the frequency tables join the token stream on the
    staged bucket key with AQE skew-split for stopword heat; the
    per-document mean is one partial+final hash aggregate."""
    return _dsir_scores(load(spark, sf_dir, "documents"))


def _dsir_scores(d: DataFrame, tag: str = "dsir_tokens") -> DataFrame:
    """Core of ``q_dsir_score`` over an arbitrary documents frame
    (doc_id, lang, text) — reused by the composed selection
    pipeline."""
    tok = stage(
        d.select(
            "doc_id", "lang", F.explode(tokens("text")).alias("w")
        ).select("doc_id", "lang", F.xxhash64("w").alias("h")),
        tag,
        bucket_col="h",
    )
    tgt = tok.filter(F.col("lang") == "en").groupBy("h").agg(
        F.count("*").alias("t_cnt")
    )
    raw = tok.groupBy("h").agg(F.count("*").alias("r_cnt"))
    totals = tok.agg(
        F.count(F.when(F.col("lang") == "en", 1)).alias("t_total"),
        F.count("*").alias("r_total"),
    )
    scored = (
        tok.join(raw, "h")
        .join(tgt, "h", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "lang",
            F.expr(
                "coalesce(t_cnt, 0) * 1000000 DIV t_total"
                " - r_cnt * 1000000 DIV r_total"
            ).alias("diff_ppm"),
        )
    )
    return scored.groupBy("doc_id", "lang").agg(
        F.count("*").alias("n_tokens"),
        F.expr("sum(diff_ppm) DIV count(*)").alias("dsir_ppm"),
    )


@query("q_bpe_encode")
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained BPE merges to the corpus (rows-only: the
    merge table comes from the iterative trainer, same non-SQL class
    as ``q_bpe_train``): every document's token stream joins the
    segmented vocabulary and reduces to its BPE token count — the
    tokenizer-application pass that turns "trained tokenizer" into
    "token-counted corpus" for packing/billing/mixture decisions.

    Scale shape: the vocabulary segmentation (|V| rows — the
    distinct-word table, already orders of magnitude smaller than the
    corpus) joins the exploded word stream on an EQUI-join keyed by
    the word; AQE broadcasts it when measured-small and skew-splits
    the stopword heat otherwise — a STATIC broadcast hint is avoided
    for the same unbounded-vocabulary reason as ``q_ngram_lm``. The
    per-document reduction is one partial+final hash aggregate.
    Exactness is pinned by the Python-BPE equivalence test
    (tests/test_corpus_ops.py): counts must equal encoding every
    document with the reference merges."""
    _, vocab = bpe_train(spark, sf_dir)
    seg = vocab.select("word", F.size("symbols").alias("n_sym"))
    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(tokens("text")).alias("word"))
    return (
        words.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
    )


_SELECT_LM_MIN = 34_000  # mean bigram probability gate (ppm)
_SELECT_DSIR_MIN = -150  # domain-importance gate (ppm diff)


@query(
    "q_corpus_select",
    oracle=f"""
    WITH kept0 AS (
      SELECT doc_id, text, lang, source FROM (
        SELECT doc_id, text, lang, source,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    ), toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM kept0
    ), big AS (
      SELECT doc_id, t[r.i] AS w1, t[r.i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(t) - 1)) AS r(i)
      WHERE len(t) >= 2
    ), uni AS (
      SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1
    ), bg AS (
      SELECT w1, w2, COUNT(*) AS cnt FROM big GROUP BY w1, w2
    ), lm AS (
      SELECT doc_id,
             CAST(SUM((g.cnt * 1000000) // u.c1) AS BIGINT) // COUNT(*) AS score_ppm
      FROM big b
      JOIN bg g ON b.w1 = g.w1 AND b.w2 = g.w2
      JOIN uni u ON b.w1 = u.w1
      GROUP BY doc_id
    ), tok AS (
      SELECT doc_id, lang, unnest(t) AS w FROM toks
    ), tgt AS (
      SELECT w, COUNT(*) AS t_cnt FROM tok WHERE lang = 'en' GROUP BY w
    ), raw AS (
      SELECT w, COUNT(*) AS r_cnt FROM tok GROUP BY w
    ), totals AS (
      SELECT (SELECT COUNT(*) FROM tok WHERE lang = 'en') AS t_total,
             (SELECT COUNT(*) FROM tok) AS r_total
    ), dsir AS (
      SELECT tok.doc_id,
             CAST(SUM((COALESCE(tgt.t_cnt, 0) * 1000000) // totals.t_total
                      - (raw.r_cnt * 1000000) // totals.r_total) AS BIGINT)
               // CAST(COUNT(*) AS BIGINT) AS dsir_ppm
      FROM tok
      JOIN raw ON tok.w = raw.w
      LEFT JOIN tgt ON tok.w = tgt.w
      CROSS JOIN totals
      GROUP BY tok.doc_id
    )
    SELECT k.source, k.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(k.text, ' '))) AS BIGINT) AS n_tokens
    FROM kept0 k
    JOIN lm ON k.doc_id = lm.doc_id
    JOIN dsir ON k.doc_id = dsir.doc_id
    WHERE lm.score_ppm >= {_SELECT_LM_MIN}
      AND dsir.dsir_ppm >= {_SELECT_DSIR_MIN}
    GROUP BY k.source, k.lang
    """,
)
def corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED modern data-selection job — what a 2024-era
    pre-training pipeline actually chains: exact dedup (keep-lowest
    doc_id per content hash) → CCNet-style LM-quality gate (mean
    bigram probability ≥ {LM} ppm) → DSIR-style domain gate
    (importance score ≥ {DS} ppm) → per-(source, lang) accounting of
    the surviving corpus. Methodologically correct composition: the
    bigram LM and the importance distributions are trained on the
    DEDUPED corpus (training them pre-dedup would let boilerplate
    copies inflate their own probability), which is exactly what the
    shared ``_lm_scores``/``_dsir_scores`` builders make natural.

    Scale shape: the deduped frame is staged once and feeds the LM
    builder, the DSIR builder and the final accounting; each builder
    stages its own hashed stream (one tokenization each, all
    8-byte-key shuffles, same plan shapes as the standalone keys); the
    two per-doc score tables join back on doc_id and the final rollup
    is one tiny aggregate. The oracle restates the ENTIRE chain as one
    CTE pipeline, so a drift anywhere — dedup rule, LM arithmetic,
    gate constants, accounting — is a hash mismatch."""
    d = load(spark, sf_dir, "documents")
    wdup = W.partitionBy(F.md5("text")).orderBy("doc_id")
    kept0 = stage(
        d.withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text", "lang", "source"),
        "select_kept0",
    )
    lm = _lm_scores(kept0, tag="select_lm")
    ds = _dsir_scores(kept0, tag="select_dsir")
    sel = (
        kept0.select(
            "doc_id", "source", "lang", F.size(tokens("text")).alias("n_tok")
        )
        .join(lm, "doc_id")
        .join(ds.select("doc_id", "dsir_ppm"), "doc_id")
        .filter(
            (F.col("score_ppm") >= _SELECT_LM_MIN)
            & (F.col("dsir_ppm") >= _SELECT_DSIR_MIN)
        )
    )
    return sel.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )


corpus_select.__doc__ = corpus_select.__doc__.replace(
    "{LM}", str(_SELECT_LM_MIN)
).replace("{DS}", str(_SELECT_DSIR_MIN))


@query(
    "q_text_readability",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS words,
           CAST(GREATEST(len(regexp_extract_all(text, '[.!?]')), 1) AS BIGINT)
             AS sentences,
           CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)
             AS syllables,
           CAST(206835000
                - (1015000 * len(regexp_extract_all(text, '[a-z]+')))
                  // GREATEST(len(regexp_extract_all(text, '[.!?]')), 1)
                - (84600000 * len(regexp_extract_all(text, '[aeiouy]+')))
                  // GREATEST(len(regexp_extract_all(text, '[a-z]+')), 1)
                AS BIGINT) AS flesch_ppm
    FROM documents
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document as an EXACT ppm integer:
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
    words = lowercase-letter runs, sentences = terminal-punctuation
    count clamped ≥ 1 (the fixture corpus has none — the clamp path is
    what gets certified), and syllables approximated by vowel-group
    runs (the standard cheap proxy; a dictionary syllabifier is a
    drop-in for the one regexp). Both ratios are integer ``div``s in
    ppm space so the score is bit-identical across engines and
    partitionings — the reason NOT to ship the float formula. Pure
    map-side regexp_count expressions over the document scan; at
    100 TB this is a zero-shuffle pass that pipelines with the other
    per-doc quality scores (Gopher, LM, DSIR) in one scan."""
    d = load(spark, sf_dir, "documents")
    words = F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), F.lit(0)))
    sentences = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]"), F.lit(0))), F.lit(1)
    )
    syllables = F.size(F.regexp_extract_all("text", F.lit("[aeiouy]+"), F.lit(0)))
    return d.select(
        "doc_id",
        words.cast("long").alias("words"),
        sentences.cast("long").alias("sentences"),
        syllables.cast("long").alias("syllables"),
    ).select(
        "doc_id",
        "words",
        "sentences",
        "syllables",
        F.expr(
            "CAST(206835000 - (1015000 * words) div sentences"
            " - (84600000 * syllables) div greatest(words, 1) AS BIGINT)"
        ).alias("flesch_ppm"),
    )


# --- PMI collocations -------------------------------------------------
COLLOC_MIN_SUPPORT = 5
COLLOC_TOPK = 100

# lift(a,b) = P(ab) / (P(a)·P(b)) in ppm, computed as a fixed
# BIGINT-division pipeline (identical association both engines; one
# mid-pipeline truncation at relative error ~1e-7):
#   ((c_ab·1e6·N_uni) DIV (c_a·c_b)) · N_uni DIV N_bi
_COLLOC_SCORE = (
    "(((c_ab * 1000000 * n_uni) DIV (c_a * c_b)) * n_uni) DIV n_bi"
)


@query(
    "q_text_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
    n_uni AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_uni FROM toks),
    bi AS (
      SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM toks a JOIN toks b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      GROUP BY 1, 2
    ),
    n_bi AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_bi FROM bi),
    joined AS (
      SELECT bi.w1, bi.w2, bi.c_ab, ua.c AS c_a, ub.c AS c_b,
             n_uni.n_uni, n_bi.n_bi
      FROM bi
      JOIN uni ua ON ua.w = bi.w1
      JOIN uni ub ON ub.w = bi.w2,
      n_uni, n_bi
      WHERE bi.c_ab >= {COLLOC_MIN_SUPPORT}
    ),
    scored AS (
      SELECT w1, w2, c_ab,
             CAST({_COLLOC_SCORE.replace("DIV", "//")} AS BIGINT) AS lift_ppm
      FROM joined
    )
    SELECT w1, w2, c_ab, lift_ppm
    FROM scored
    ORDER BY lift_ppm DESC, w1, w2
    LIMIT {COLLOC_TOPK}
    """,
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI-style collocation mining: the top-{K} adjacent token pairs
    by lift = P(bigram) / (P(w1)·P(w2)) — the log-free monotone core
    of pointwise mutual information, carried in exact BIGINT ppm (the
    q_text_bm25 discipline: same division pipeline on both engines, so
    the one truncation is shared). Min support {S} filters the
    hapax-pair noise PMI is notorious for.

    Scale shape: bigrams come from LEAD over (doc_id, pos) — ONE
    corpus shuffle on doc_id (documents are the natural parallel unit;
    no token self-join); unigram and bigram counts aggregate with
    map-side partials; the unigram table is vocabulary-sized and
    broadcast onto the scored bigrams; corpus totals enter as 1-row
    broadcast joins; top-{K} is TakeOrderedAndProject."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    nxt = F.lead("w").over(W.partitionBy("doc_id").orderBy("pos"))
    bigrams = (
        toks.withColumn("w2", nxt)
        .filter(F.col("w2").isNotNull())
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= COLLOC_MIN_SUPPORT)
    )
    uni = toks.groupBy("w").agg(F.count("*").cast("long").alias("c"))
    n_uni = toks.agg(F.count("*").cast("long").alias("n_uni"))
    # total bigram count BEFORE the support filter (the probability
    # denominator must not depend on the reporting threshold)
    all_bi = (
        toks.withColumn("w2", nxt)
        .filter(F.col("w2").isNotNull())
        .agg(F.count("*").cast("long").alias("n_bi"))
    )
    scored = (
        bigrams.join(
            F.broadcast(uni.selectExpr("w AS w1", "c AS c_a")), "w1"
        )
        .join(F.broadcast(uni.selectExpr("w AS w2", "c AS c_b")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(all_bi))
        .withColumn("lift_ppm", F.expr(_COLLOC_SCORE).cast("long"))
    )
    return (
        scored.select("w1", "w2", "c_ab", "lift_ppm")
        .orderBy(F.col("lift_ppm").desc(), "w1", "w2")
        .limit(COLLOC_TOPK)
    )


text_collocations.__doc__ = text_collocations.__doc__.replace(
    "{K}", str(COLLOC_TOPK)
).replace("{S}", str(COLLOC_MIN_SUPPORT))
