"""Round-13 table-format scale probes (measured, not asserted).

Three questions the round-13 features must answer at 100 TB, probed at
fixture scale with the dimension of interest swept while everything
else is pinned:

1. PARTITION PRUNING: does a fixed 3-partition read stay flat while
   the table's partition count grows?  (Planning is manifest tuple
   arithmetic — it must not inherit the table's history.)
2. DELETION VECTORS: what is the write-amplification ratio of the DV
   path vs COW for a scattered sub-percent delete, and what read
   overhead does the MoR anti-join add?
3. SNAPSHOT DIFF: does CDF cost scale with the CHANGED fraction, not
   the table size?

Run drained, best-of-3 per cell:  python tools/probes_r13.py
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
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_add_files_partitioned,
        _snap_add_files_with_stats,
        _snap_commit,
        _snap_commit_cas,
        _snap_commit_partitioned,
        snap_delete_optimistic,
        snap_diff,
        snap_read_mor,
        snap_read_partition_pruned,
    )
    from steaminganalysis_spark.scratch import scratch_dir

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("probes-r13")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    N = 1_000_000

    # ---- probe 1: partition pruning vs partition count ----
    print("# probe 1: fixed 3-partition read while partitions grow")
    for nparts in (32, 128, 512):
        table = f"{scratch_dir(f'p1_{nparts}')}/t"
        df = spark.range(N).selectExpr(
            "id", f"CAST(id % {nparts} AS STRING) AS pk", "CAST(id AS DOUBLE) AS v"
        )
        files, parts = _snap_add_files_partitioned(df, table, f"p1w{nparts}", ["pk"])
        _snap_commit_partitioned(table, files, 0, ["pk"], parts)
        sel = {"1", "2", "3"}

        def pruned():
            got, planned, total = snap_read_partition_pruned(spark, table, "pk", sel)
            assert len(planned) < total
            got.agg(F.sum("v")).collect()

        def full():
            import glob

            all_files = [os.path.join(table, "data", f) for f in files]
            spark.read.parquet(*all_files).agg(F.sum("v")).collect()

        t_plan_only = best3(
            lambda: snap_read_partition_pruned(spark, table, "pk", sel)
        )
        print(
            f"partitions={nparts:4d} pruned_read={best3(pruned)*1000:7.1f} ms "
            f"(planning {t_plan_only*1000:6.2f} ms) "
            f"full_scan={best3(full)*1000:7.1f} ms"
        )

    # ---- probe 2: DV vs COW write amplification + read overhead ----
    print("# probe 2: scattered 0.2% delete — DV vs COW")
    for mode in ("dv", "cow"):
        table = f"{scratch_dir(f'p2_{mode}')}/t"
        df = spark.range(N).selectExpr(
            "id AS event_id", "'view' AS event_type", "CAST(id AS DOUBLE) AS value"
        )
        files, stats = _snap_add_files_with_stats(
            df.repartitionByRange(8, "event_id").sortWithinPartitions("event_id"),
            table,
            f"p2w{mode}",
            ["event_id"],
        )
        _snap_commit(table, files, 0, stats=stats)
        ddir = os.path.join(table, "data")
        size0 = sum(
            os.path.getsize(os.path.join(ddir, f)) for f in os.listdir(ddir)
        )
        keys = spark.range(N).filter("id % 499 = 0").selectExpr("id AS event_id")
        t0 = time.perf_counter()
        if mode == "dv":
            snap_delete_optimistic(spark, table, keys, "event_id", dv_threshold=0.5)
        else:
            snap_delete_optimistic(
                spark, table, keys, "event_id", dv_threshold=0.0
            )  # force COW everywhere
        t_delete = time.perf_counter() - t0
        size1 = sum(
            os.path.getsize(os.path.join(ddir, f)) for f in os.listdir(ddir)
        )
        t_read = best3(
            lambda: snap_read_mor(spark, table, "event_id")
            .agg(F.sum("value"))
            .collect()
        )
        print(
            f"mode={mode}: delete={t_delete*1000:7.1f} ms "
            f"bytes_written={(size1-size0)/1024:9.1f} KiB "
            f"mor_read={t_read*1000:7.1f} ms"
        )

    # ---- probe 3: snapshot diff vs changed fraction ----
    print("# probe 3: CDF cost vs changed-file fraction (32-file table)")
    for touched in (2, 8, 32):
        table = f"{scratch_dir(f'p3_{touched}')}/t"
        df = spark.range(N).selectExpr(
            "id AS event_id", "'view' AS event_type", "CAST(id AS DOUBLE) AS value"
        )
        files, stats = _snap_add_files_with_stats(
            df.repartitionByRange(32, "event_id").sortWithinPartitions("event_id"),
            table,
            f"p3w{touched}",
            ["event_id"],
        )
        _snap_commit(table, files, 0, stats=stats)
        ddir = os.path.join(table, "data")
        ordered = sorted(files, key=lambda f: stats[f]["event_id"][0])
        victims = ordered[:touched]
        rewritten = (
            spark.read.parquet(*[os.path.join(ddir, f) for f in victims])
            .withColumn("value", F.col("value") + F.lit(1.0))
        )
        rw, rw_stats = _snap_add_files_with_stats(
            rewritten, table, f"p3rw{touched}", ["event_id"]
        )
        keep = [f for f in files if f not in victims]
        st = {f: stats[f] for f in keep}
        st.update(rw_stats)
        assert _snap_commit_cas(table, keep + rw, 1, stats=st)
        t_diff = best3(
            lambda: snap_diff(spark, table, 0, 1, "event_id")
            .groupBy("_change_type")
            .count()
            .collect()
        )
        print(f"changed_files={touched:2d}/32 diff={t_diff*1000:7.1f} ms")

    spark.stop()


if __name__ == "__main__":
    main()
