"""Entity resolution / record linkage (round 5): blocked fuzzy
matching and match-graph clustering into canonical entities.

The classic dedup problem where keys DON'T agree bit-for-bit — name
variants, typos, re-spellings — solved with the industrial two-stage
shape: (1) BLOCKING cuts the O(N²) comparison space to within-block
pairs via an equi-join on a cheap deterministic key; (2) pairwise
similarity scoring runs only inside blocks; (3) matched pairs form a
graph whose connected components are the entities, each canonicalized
to its minimum member.

Fixture mapping: part names ("cold widget", "old widget", …) are the
entity strings; the block key is the head noun, the matcher is
levenshtein ≤ 2 over the full name. The lev-2 chain cold→old→red→new
makes the transitive-closure step non-trivial (a pair-only view would
split that entity).

Scale posture:
- The match space is deduplicated BEFORE comparison: distinct names
  (+ their occurrence counts) per block, never raw rows — the
  dedupe-before-compare rule that took q_fn_string_distance from 84 s
  to 2 s at sf0.1. Pairwise cost is Σ_b |distinct(b)|², bounded by the
  block key's selectivity, and the levenshtein scan is JVM codegen.
- Clustering is the same fixed-round HashMin label propagation as
  ``q_graph_wcc``, run on the NAME graph (vocabulary-sized, like the
  BPE vocab table — orders of magnitude smaller than the fact table).
  The label vector broadcasts; rounds cost O(matched names) each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import query
from steaminganalysis_spark.sources import load

LEV_MAX = 2
ER_ROUNDS = 8  # ≥ max component diameter within a block (≤8 names)

# Shared oracle CTEs: distinct names with counts, noun blocks, matched
# pairs (name_a < name_b).
_ER_BASE = f"""
    names AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS block,
             CAST(COUNT(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    ),
    matches AS MATERIALIZED (
      SELECT a.p_name AS name_a, b.p_name AS name_b, a.block,
             CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev,
             a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
      FROM names a JOIN names b
        ON a.block = b.block AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= {LEV_MAX}
    )
"""


def _distinct_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count("*").alias("n_parts"))
        .select(
            "p_name",
            F.element_at(F.split("p_name", " "), 2).alias("block"),
            "n_parts",
        )
    )


def _matches(names: DataFrame) -> DataFrame:
    a = names.selectExpr("p_name AS name_a", "block", "n_parts AS n_parts_a")
    b = names.selectExpr("p_name AS name_b", "block", "n_parts AS n_parts_b")
    return (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("lev", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("lev") <= LEV_MAX)
    )


@query(
    "q_er_blocked_pairs",
    oracle=f"""
    WITH {_ER_BASE}
    SELECT name_a, name_b, block, lev, n_parts_a, n_parts_b
    FROM matches
    """,
)
def er_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 1+2 of entity resolution: block part names on the head
    noun, compare DISTINCT names pairwise within each block (never raw
    rows — occurrence counts ride along instead), and keep pairs with
    levenshtein ≤ {2}. The block join is an equi-join on the block key;
    at 100 TB the block key's job is bounding Σ|block|², and a skewed
    block would be split by a second-level key (name length) — the
    same guard as MAX_BASKET in the co-purchase family."""
    names = _distinct_names(spark, sf_dir)
    return _matches(names).select(
        "name_a", "name_b", "block", "lev", "n_parts_a", "n_parts_b"
    )


def _er_clusters_oracle() -> str:
    ctes = [
        _ER_BASE,
        "l0 AS (SELECT p_name AS node, p_name AS lbl FROM names)",
        """edges AS MATERIALIZED (
          SELECT name_a AS src, name_b AS dst FROM matches
          UNION ALL SELECT name_b, name_a FROM matches
        )""",
    ]
    for k in range(1, ER_ROUNDS + 1):
        ctes.append(
            f"""m{k} AS MATERIALIZED (SELECT e.dst AS node, MIN(l.lbl) AS nl
                 FROM edges e JOIN l{k - 1} l ON l.node = e.src
                 GROUP BY e.dst)"""
        )
        ctes.append(
            f"""l{k} AS MATERIALIZED (
                 SELECT l.node, LEAST(l.lbl, COALESCE(m.nl, l.lbl)) AS lbl
                 FROM l{k - 1} l LEFT JOIN m{k} m ON m.node = l.node)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
        , sizes AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS entity_size
                    FROM l{ER_ROUNDS} GROUP BY 1)
        SELECT l.node AS p_name, l.lbl AS entity, n.n_parts, s.entity_size
        FROM l{ER_ROUNDS} l
        JOIN names n ON n.p_name = l.node
        JOIN sizes s ON s.lbl = l.lbl
        """
    )


@query("q_er_clusters", oracle=_er_clusters_oracle())
def er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage 3: transitive closure of the match graph — every name
    labeled with its entity's canonical (minimum) member via fixed
    {8}-round HashMin label propagation, singletons included (a name
    with no match is its own entity). Emits name → entity plus the
    name's part count and the entity's member count. The label vector
    is vocabulary-sized and broadcasts per round; the oracle unrolls
    the identical rounds as MATERIALIZED CTEs (same convention as
    ``q_graph_wcc``) so both engines agree even if a component's
    diameter exceeded the budget."""
    from steaminganalysis_spark.staging import stage

    names = _distinct_names(spark, sf_dir)
    pairs = _matches(names).select("name_a", "name_b")
    # Staged once: every propagation round re-references the edge set,
    # and without materialization each round would replan (and at fact
    # scale re-execute) the blocking join — the same reason
    # q_graph_wcc stages its co-purchase edges.
    from steaminganalysis_spark.operators.graph import _sym_edges

    edges = stage(
        _sym_edges(pairs, "name_a", "name_b"),
        "er_edges",
        bucket_col="src",
    )
    labels = names.select(F.col("p_name").alias("node")).withColumn(
        "lbl", F.col("node")
    )
    for i in range(ER_ROUNDS):
        contrib = (
            edges.join(F.broadcast(labels), edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("lbl").alias("nl"))
        )
        labels = labels.join(
            F.broadcast(contrib), labels.node == contrib.dst, "left"
        ).select(
            "node",
            F.least(F.col("lbl"), F.coalesce(F.col("nl"), F.col("lbl"))).alias("lbl"),
        )
        if i % 2 == 1:
            # Truncate lineage every other round: without it the label
            # plan nests two joins per round and Catalyst re-analysis
            # dominates wall-clock long before data size matters (the
            # checkpoint cadence ann.py uses for Lloyd iterations).
            labels = labels.localCheckpoint(eager=True)
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("entity_size"))
    return (
        labels.join(F.broadcast(sizes), "lbl")
        .join(names, labels.node == names.p_name)
        .select(
            "p_name",
            F.col("lbl").alias("entity"),
            "n_parts",
            "entity_size",
        )
    )
