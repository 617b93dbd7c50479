"""Corpus-preparation operators (round 4): the remaining steps a
large-scale pre-training data pipeline runs between "cleaned corpus"
and "training shards" — chunking, deterministic global shuffling, and
inverted-index construction. All three are registered with exact
DuckDB oracles (registration order puts them AFTER the round-4
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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.functions import tokens
from steaminganalysis_spark.registry import query
from steaminganalysis_spark.sources import load

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
