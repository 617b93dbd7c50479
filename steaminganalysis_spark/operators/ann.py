"""IVF approximate nearest neighbors (SURVEY.md §2 B.9 scale path,
alongside the hyperplane-LSH variant in llm.py).

Classic IVF: a coarse k-means quantizer partitions the corpus into K
inverted lists; a query probes only the P nearest lists, so the scanned
fraction is ≈ P/K of the corpus instead of all of it.

Distributed shape: Lloyd iterations are DataFrame jobs (assignment =
broadcast-centroid argmin, update = per-dimension mean); ONLY the K×dim
centroid matrix ever reaches the driver (model parameters, a few KB) —
the corpus never does. At 100 TB the same loop runs unchanged; the
centroid collect stays K×dim.

Everything is deterministic: init = first K vectors by vec_id, fixed
iteration count, ties broken on ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from steaminganalysis_spark.functions import dot
from steaminganalysis_spark.operators.llm import _emb_double
from steaminganalysis_spark.registry import query

IVF_K = 16  # coarse clusters
IVF_ITERS = 3  # Lloyd iterations (fixed → deterministic)
IVF_PROBES = 4  # clusters scanned per query


def _centroids_df(spark: SparkSession, cents: list[list[float]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cid int, cv array<double>"
    )


def _assign(base: DataFrame, cdf: DataFrame, keep: int = 1) -> DataFrame:
    """Nearest-centroid assignment by cosine (argmax dot/|c|; vector
    norm is constant per row so it cannot change the argmax). keep>1
    returns the `keep` nearest lists (query probing)."""
    cnorm = F.sqrt(dot(F.col("cv"), F.col("cv")))
    scored = base.crossJoin(F.broadcast(cdf)).withColumn(
        "sim", dot(F.col("v"), F.col("cv")) / cnorm
    )
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= keep)
        .drop("cv", "sim", "rk")
    )


def train_ivf(
    spark: SparkSession, base: DataFrame, k: int = IVF_K, iters: int = IVF_ITERS
) -> list[list[float]]:
    """Deterministic distributed Lloyd: returns the K×dim centroid
    matrix (the only driver-side data)."""
    cents = [
        list(r.v) for r in base.orderBy("vec_id").limit(k).select("v").collect()
    ]
    for _ in range(iters):
        assigned = _assign(base, _centroids_df(spark, cents), keep=1)
        # per-dimension mean: posexplode → groupBy (cid, pos) → avg;
        # result is K×dim rows — tiny — collected as the new matrix
        dims = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = {}
        for r in dims:
            new.setdefault(r.cid, {})[r.pos] = r.m
        cents = [
            [new[c][p] for p in sorted(new[c])] if c in new else cents[c]
            for c in range(k)
        ]
    return cents


@query("q_sim_ann_ivf")  # rows-only: ANN recall is approximate by design
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: top-5 cosine neighbors for the first 50 query vectors,
    scanning only the IVF_PROBES nearest inverted lists per query
    (≈ P/K = 1/4 of the corpus). Same output shape as the brute-force
    q_sim_topk; recall vs exact is pinned in tests."""
    base = _emb_double(spark, sf_dir)
    cents = train_ivf(spark, base)
    cdf = _centroids_df(spark, cents)

    corpus = _assign(base, cdf, keep=1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"),
        F.col("cid").alias("list_id"),
    )
    queries = _assign(base.filter(F.col("vec_id") < 50), cdf, keep=IVF_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("cid").alias("list_id"),
    )
    # probe join: only same-list pairs are scored (the IVF pruning)
    pairs = queries.join(corpus, "list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = dot(F.col("qv"), F.col("nv")) / (F.col("qnorm") * F.col("nnorm"))
    w = W.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rn")
    )


# ------------------------------------------------ persisted IVF index

def build_ivf_index(
    spark: SparkSession,
    base: DataFrame,
    index_dir: str,
    k: int = IVF_K,
    iters: int = IVF_ITERS,
) -> None:
    """Train and PERSIST the IVF index: centroids as a tiny parquet
    model file, corpus rows partitioned by inverted list
    (`list_id=<cid>/` dirs). Probing then touches only the P probed
    partitions — the same partition pruning that serves day-ranged
    scans, applied to vector search. Build once, query many times: the
    train cost amortizes the way a real feature store's does."""
    cents = train_ivf(spark, base, k=k, iters=iters)
    _centroids_df(spark, cents).write.mode("overwrite").parquet(
        f"{index_dir}/centroids"
    )
    corpus = _assign(base, _centroids_df(spark, cents), keep=1).select(
        F.col("vec_id"), F.col("v"), F.col("norm"), F.col("cid").alias("list_id")
    )
    corpus.write.mode("overwrite").partitionBy("list_id").parquet(
        f"{index_dir}/corpus"
    )


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    topk: int = 5,
    probes: int = IVF_PROBES,
) -> DataFrame:
    """Query a persisted IVF index: assign each query vector to its
    `probes` nearest centroids (centroid model is a broadcast-sized
    read), then scan ONLY those corpus partitions (partition filter on
    list_id) and rank exact cosine within them."""
    cdf = spark.read.parquet(f"{index_dir}/centroids")
    q = _assign(queries, cdf, keep=probes).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.col("cid").alias("list_id"),
    )
    corpus = spark.read.parquet(f"{index_dir}/corpus").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"),
        "list_id",
    )
    pairs = q.join(corpus, "list_id").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cos = dot(F.col("qv"), F.col("nv")) / (F.col("qnorm") * F.col("nnorm"))
    w = W.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc(), F.col("neighbor_id")
    )
    return (
        pairs.select("query_id", "neighbor_id", cos.alias("cosine"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rn")
    )
