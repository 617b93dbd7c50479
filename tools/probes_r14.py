"""Round-14 scale probes (measured, not asserted).

Four questions this round's features must answer at 100 TB, probed at
fixture scale with the dimension of interest swept while everything
else is pinned:

1. DV-AWARE COUNT PUSHDOWN: does COUNT(*) on a deletion-vector-
   carrying table stay metadata-cheap while the table's ROW count
   grows, where the merge-on-read scan inherits the growth?  (The
   pushdown reads footers + O(deleted keys) DV parquet driver-side.)
2. METADATA RELATIONS: does the files-relation build stay O(files)
   (flat per file) while file count grows — the planner arithmetic,
   exposed as a frame?
3. REF-COUNTED VACUUM: does snap_expire stay O(manifests + refs)
   while the number of named refs grows?
4. ANN INDEX MAINTENANCE: after one corpus append, does the
   incremental index update cost track the APPENDED slice (flat as
   the PRE-EXISTING corpus grows), where the full rebuild tracks the
   whole corpus?

Run drained, best-of-3 per cell:  python tools/probes_r14.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best3(fn):
    ts = []
    out = None
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from steaminganalysis_spark.operators.ann import (
        _assign,
        _centroids_df,
        snap_ann_index_update,
        train_ivf,
    )
    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_add_files_with_stats,
        _snap_commit,
        _snap_commit_cas,
        _snap_read,
        snap_agg_pushdown_dv,
        snap_append_optimistic,
        snap_delete_optimistic,
        snap_expire,
        snap_metadata_files,
        snap_read_mor,
        snap_ref_create,
    )
    from steaminganalysis_spark.scratch import scratch_dir

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probes-r14")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- probe 1: DV-aware COUNT pushdown vs MoR scan, rows swept
    print("== probe 1: DV-aware COUNT pushdown vs merge-on-read scan ==")
    for n in (100_000, 1_000_000, 4_000_000):
        t = f"{scratch_dir('p14dv')}/t"
        df = spark.range(n).select(
            F.col("id").alias("event_id"), (F.col("id") % 97).alias("g")
        )
        fs, st = _snap_add_files_with_stats(
            df.repartitionByRange(8, "event_id"), t, "p1", ["event_id"]
        )
        _snap_commit(t, fs, 0, stats=st)
        keys = spark.range(0, n, 211).select(F.col("id").alias("event_id"))
        snap_delete_optimistic(spark, t, keys, "event_id")
        t_push, pushed = best3(lambda: snap_agg_pushdown_dv(t, ["event_id"]))
        t_scan, scanned = best3(
            lambda: snap_read_mor(spark, t, "event_id").count()
        )
        assert pushed["n_rows"] == scanned
        print(
            f"rows={n:>9,}  pushdown={t_push * 1e3:7.1f} ms  "
            f"mor-scan={t_scan * 1e3:7.1f} ms  count={scanned:,}"
        )

    # ---- probe 2: files metadata relation vs file count
    print("== probe 2: files relation build vs file count ==")
    for nf in (8, 64, 256):
        t = f"{scratch_dir('p14meta')}/t"
        df = spark.range(200_000).select(F.col("id").alias("event_id"))
        fs, st = _snap_add_files_with_stats(
            df.repartition(nf), t, "p2", ["event_id"]
        )
        _snap_commit(t, fs, 0, stats=st)
        t_rel, n_rows = best3(
            lambda: snap_metadata_files(
                spark, t, span_col="event_id"
            ).count()
        )
        print(
            f"files={nf:>4}  files-relation={t_rel * 1e3:7.1f} ms  "
            f"({t_rel / nf * 1e3:5.2f} ms/file)  rows={n_rows}"
        )

    # ---- probe 3: ref-counted VACUUM vs ref count
    print("== probe 3: snap_expire vs number of named refs ==")
    for nrefs in (2, 64, 512):
        t = f"{scratch_dir('p14refs')}/t"
        df = spark.range(50_000).select(F.col("id").alias("event_id"))
        fs = _snap_add_files(df.coalesce(2), t, "p3")
        _snap_commit(t, fs, 0)
        for i in range(9):
            snap_append_optimistic(
                t, _snap_add_files(df.limit(100).coalesce(1), t, f"p3a{i}")
            )
        for i in range(nrefs):
            snap_ref_create(t, f"tag{i}", "tag", version=i % 10)
        t_vac, rec = best3(
            lambda: snap_expire(t, [9], orphan_grace_seconds=600.0)
        )
        print(
            f"refs={nrefs:>4}  vacuum={t_vac * 1e3:7.1f} ms  "
            f"manifests_removed={len(rec['manifests_removed'])}"
        )

    # ---- probe 4: incremental ANN index update vs pre-existing corpus
    print("== probe 4: ANN index update — incremental vs full rebuild ==")
    dim = 16
    for n0 in (20_000, 100_000, 400_000):
        tmp = scratch_dir("p14ann")
        ct, it, md = f"{tmp}/c", f"{tmp}/i", f"{tmp}/m"
        base = spark.range(n0).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: ((F.col("id") * 37 + d) % 1000).cast("double"),
            ).alias("v"),
        ).withColumn(
            "norm",
            F.sqrt(
                F.aggregate(
                    F.col("v"), F.lit(0.0), lambda a, x: a + x * x
                )
            ),
        )
        f0 = _snap_add_files(base.repartition(4), ct, "p4c")
        _snap_commit_cas(ct, f0, 0)
        cents = train_ivf(spark, _snap_read(spark, ct, 0), k=8, iters=1)
        _centroids_df(spark, cents).write.mode("overwrite").parquet(
            f"{md}/centroids"
        )
        cdf = spark.read.parquet(f"{md}/centroids")
        seed = _assign(_snap_read(spark, ct, 0), cdf, keep=1).select(
            "vec_id", F.col("cid").alias("list_id")
        )
        s0 = _snap_add_files(seed.coalesce(2), it, "p4s")
        _snap_commit_cas(it, s0, 0, extra={"covers_corpus_version": 0})
        # fixed-size append (10k rows) regardless of n0
        delta = (
            spark.range(n0, n0 + 10_000)
            .select(
                F.col("id").alias("vec_id"),
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda d: ((F.col("id") * 37 + d) % 1000).cast(
                        "double"
                    ),
                ).alias("v"),
            )
            .withColumn(
                "norm",
                F.sqrt(
                    F.aggregate(
                        F.col("v"), F.lit(0.0), lambda a, x: a + x * x
                    )
                ),
            )
        )
        fd = _snap_add_files(delta.coalesce(1), ct, "p4d")
        snap_append_optimistic(ct, fd)
        t0 = time.perf_counter()
        rec = snap_ann_index_update(spark, ct, it, md)
        t_inc = time.perf_counter() - t0
        assert rec["strategy"] == "appends-fast-path"
        t_full, _ = best3(
            lambda: _assign(_snap_read(spark, ct), cdf, keep=1)
            .select("vec_id")
            .count()
        )
        print(
            f"corpus={n0:>8,} (+10k append)  incremental={t_inc * 1e3:7.1f} ms"
            f"  full-rebuild-assign={t_full * 1e3:7.1f} ms"
        )

    spark.stop()


if __name__ == "__main__":
    main()
