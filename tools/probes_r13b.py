"""Round-13b scale probes for the second table-format wave (measured,
not asserted).

Three questions the new features must answer at 100 TB, probed at
fixture scale with the dimension of interest swept while everything
else is pinned:

1. BLOOM SKIPPING: does a point lookup on a high-entropy column stay
   flat while the table's file count grows?  (Probing is O(files)
   integer arithmetic on JSON the planner already read; the scan is
   O(planned files) — both must decouple from table size, while the
   full-scan lookup inherits it.)
2. MANIFEST NDV: does the ANALYZE-backed estimate cost stay flat
   (metadata arithmetic) while the table's ROW count grows, where the
   direct recompute scans and grows?
3. OPTIMIZE ZORDER: what fraction of files does a single-column
   predicate on the SECOND dimension plan before vs after the
   rewrite, and what does that do to the read?

Run drained, best-of-3 per cell:  python tools/probes_r13b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def best3(fn):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files_with_stats,
        _snap_commit,
        _snap_read,
        snap_analyze_ndv,
        snap_bloom_build,
        snap_ndv_estimates,
        snap_optimize_zorder,
        snap_read_bloom_pruned,
        snap_read_pruned_multi,
    )
    from steaminganalysis_spark.scratch import scratch_dir

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probes-r13b")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- probe 1: bloom skipping vs file count (200k rows re-sliced)
    print("== bloom point-lookup vs file count (200k rows) ==")
    base = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc-"), F.md5(F.col("id").cast("string"))).alias(
            "text"
        ),
    )
    for n_files in (8, 64, 256):
        table = f"{scratch_dir('pb_bloom')}/t{n_files}"
        files, stats = _snap_add_files_with_stats(
            base.repartitionByRange(n_files, "doc_id"),
            table,
            f"pb{n_files}",
            ["doc_id"],
        )
        _snap_commit(table, files, 0, stats=stats)
        t_build, _ = best3(lambda: snap_bloom_build(spark, table, "text"))
        probe = base.filter("doc_id = 123456").first()["text"]

        def bloom_lookup():
            scan, planned, total = snap_read_bloom_pruned(spark, table, probe)
            return (
                scan.filter(F.col("text") == probe).count(),
                len(planned),
                total,
            )

        def full_lookup():
            return _snap_read(spark, table).filter(
                F.col("text") == probe
            ).count()

        t_bloom, (n, planned, total) = best3(bloom_lookup)
        t_full, n2 = best3(full_lookup)
        assert n == n2 == 1
        print(
            f"files={total:4d} bloom_build={t_build*1000:7.1f}ms "
            f"lookup(bloom)={t_bloom*1000:7.1f}ms planned={planned} "
            f"lookup(full)={t_full*1000:7.1f}ms"
        )

    # ---- probe 2: manifest NDV vs row count (8 files pinned)
    print("== manifest NDV vs row count (8 files) ==")
    for rows in (100_000, 1_000_000, 10_000_000):
        table = f"{scratch_dir('pb_ndv')}/t{rows}"
        ev = spark.range(rows).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 5).cast("string").alias("event_type"),
            (F.pmod(F.hash(F.col("id")), F.lit(10_000))).alias("user_id"),
        )
        files, stats = _snap_add_files_with_stats(
            ev.repartitionByRange(8, "event_id"), table, f"pn{rows}", ["event_id"]
        )
        _snap_commit(table, files, 0, stats=stats)
        t_analyze, _ = best3(
            lambda: snap_analyze_ndv(spark, table, "event_type", "user_id + 1")
        )
        t_manifest, est = best3(lambda: snap_ndv_estimates(table))
        t_exact, _ = best3(
            lambda: _snap_read(spark, table)
            .groupBy("event_type")
            .agg(F.countDistinct("user_id"))
            .collect()
        )
        print(
            f"rows={rows:9,d} analyze={t_analyze*1000:8.1f}ms "
            f"ndv_from_manifest={t_manifest*1000:6.2f}ms "
            f"exact_recompute={t_exact*1000:8.1f}ms "
            f"est_types={len(est)}"
        )

    # ---- probe 3: zorder second-dimension pruning (1M rows, 32 files)
    print("== zorder second-dimension pruning (1M rows, 32 files) ==")
    ev = spark.range(1_000_000).select(
        F.col("id").alias("event_id"),
        (F.pmod(F.hash(F.col("id")), F.lit(10_000))).alias("user_id"),
        (F.col("id") % 5).cast("string").alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    table = f"{scratch_dir('pb_zo')}/t"
    files, stats = _snap_add_files_with_stats(
        ev.repartitionByRange(32, "event_id"),
        table,
        "pz",
        ["event_id", "user_id"],
    )
    _snap_commit(table, files, 0, stats=stats)
    pred = {"user_id": (0, 2499)}  # the quarter slice on dim 2

    def read_at(version):
        scan, planned, total = snap_read_pruned_multi(
            spark, table, pred, version=version
        )
        return (
            scan.filter(F.col("user_id") <= 2499).count(),
            len(planned),
            total,
        )

    t_before, (n_b, p_b, tot) = best3(lambda: read_at(0))
    v1 = snap_optimize_zorder(spark, table, "event_id", "user_id", n_files=32)
    t_after, (n_a, p_a, tot_a) = best3(lambda: read_at(v1))
    assert n_b == n_a
    print(
        f"before: planned={p_b}/{tot} read={t_before*1000:7.1f}ms | "
        f"after zorder: planned={p_a}/{tot_a} read={t_after*1000:7.1f}ms "
        f"(rows identical {n_b:,d})"
    )

    # ---- probe 4: manifest-list planning vs monolithic (metadata
    # only — synthetic file entries, no data files; what is measured
    # is exactly the planner's JSON I/O + parse + match work)
    print("== planning: monolithic manifest vs manifest list ==")
    import json

    for n_parts in (256, 1024, 4096):
        tdir = f"{scratch_dir('pb_ml')}/t{n_parts}"
        parts = {
            f"2024-{1 + i // 31:02d}-{1 + i % 31:02d}x{i}": [
                f"f{i}-{j}.parquet" for j in range(4)
            ]
            for i in range(n_parts)
        }
        # monolithic: one doc, every file entry with its tuple
        mono = {
            "files": [f for fs in parts.values() for f in fs],
            "partitions": {
                f: {"day": p} for p, fs in parts.items() for f in fs
            },
        }
        mdir = os.path.join(tdir, "mono")
        os.makedirs(mdir)
        with open(os.path.join(mdir, "v0.json"), "w") as fh:
            json.dump(mono, fh)
        # sharded: one doc per partition + the list
        sdir = os.path.join(tdir, "shards")
        os.makedirs(sdir)
        shard_names = {}
        for p, fs in parts.items():
            name = f"s-{p}.json"
            with open(os.path.join(sdir, name), "w") as fh:
                json.dump({"part": p, "files": fs}, fh)
            shard_names[p] = name
        with open(os.path.join(tdir, "list.json"), "w") as fh:
            json.dump({"shards": shard_names}, fh)

        want = set(list(parts)[:3])

        def plan_mono():
            doc = json.load(open(os.path.join(mdir, "v0.json")))
            return [
                f
                for f in doc["files"]
                if doc["partitions"][f]["day"] in want
            ]

        def plan_sharded():
            doc = json.load(open(os.path.join(tdir, "list.json")))
            out = []
            for p in want:
                shard = json.load(
                    open(os.path.join(sdir, doc["shards"][p]))
                )
                out.extend(shard["files"])
            return out

        t_mono, a = best3(plan_mono)
        t_shard, b = best3(plan_sharded)
        assert sorted(a) == sorted(b) and len(a) == 12
        print(
            f"parts={n_parts:5d} plan(monolithic)={t_mono*1000:8.3f}ms "
            f"plan(list+3 shards)={t_shard*1000:8.3f}ms"
        )

    spark.stop()


if __name__ == "__main__":
    main()
