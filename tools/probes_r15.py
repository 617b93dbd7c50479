"""Round-15 scale probes (measured, not asserted).

The round's headline claim is VERDICT r14 order #4's: bitmap-encoded
deletion vectors make COUNT pushdown O(files) — FLAT in deleted-row
count — where the r13 pair-rows encoding pays an O(deleted rows)
driver-side parquet read that grows with every DELETE. Probe both
encodings on the SAME table shape with the DELETED-ROW COUNT swept
and everything else pinned (fixed 200k-row table, 16 files):

1. PAIR-ROWS pushdown (snap_agg_pushdown_dv): expected to grow with
   deleted rows (it reads every DV pair driver-side).
2. BITMAP pushdown (snap_agg_pushdown_bitmap): expected flat (footer
   rows + stored cardinalities; zero delete-data reads, zero bitmap
   decodes).
3. BITMAP WRITE cost rides along for honesty: the write IS
   O(deleted rows) (any delete must observe its rows once) — the
   asymmetry, not free lunch, is the claim.
4. Rate-limited CDF drain (order #6): per-batch latency with
   max_files pinned while the BACKFILL size grows — each batch
   should cost O(max_files), so the drain parallelogram is
   (files/max_files) × flat, never one batch sized like the backfill.

Run drained, best-of-3 per cell:  python tools/probes_r15.py
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
    from pyspark.sql import functions as F

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_add_files_with_stats,
        _snap_commit,
        snap_agg_pushdown_bitmap,
        snap_agg_pushdown_dv,
        snap_delete_bitmap,
        snap_delete_optimistic,
    )
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    N = 200_000
    rows = spark.range(N).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("grp")
    )

    print("== probe 1+2+3: pushdown cost vs deleted-row count "
          f"(fixed {N}-row table, 16 files) ==")
    print(f"{'deleted':>9} {'pair_write_s':>12} {'pair_push_s':>11} "
          f"{'bm_write_s':>10} {'bm_push_s':>9}")
    for frac_mod in (100, 20, 5, 2):  # ~1%, 5%, 20%, 50% deleted
        keys = rows.filter(F.col("k") % frac_mod == 1).select("k")
        n_del = keys.count()

        pair_t = scratch_dir(f"p15_pair_{frac_mod}") + "/t"
        fs, st = _snap_add_files_with_stats(
            rows.repartitionByRange(16, "k").sortWithinPartitions("k"),
            pair_t, "p15pb", ["k"],
        )
        _snap_commit(pair_t, fs, 0, stats=st)
        t0 = time.perf_counter()
        snap_delete_optimistic(spark, pair_t, keys, "k", dv_threshold=1.0)
        tw_pair = time.perf_counter() - t0
        tp_pair, _ = best3(lambda: snap_agg_pushdown_dv(pair_t, ["k"]))

        bm_t = scratch_dir(f"p15_bm_{frac_mod}") + "/t"
        fs2, st2 = _snap_add_files_with_stats(
            rows.repartitionByRange(16, "k").sortWithinPartitions("k"),
            bm_t, "p15bb", ["k"],
        )
        _snap_commit(bm_t, fs2, 0, stats=st2)
        t0 = time.perf_counter()
        snap_delete_bitmap(spark, bm_t, keys, "k")
        tw_bm = time.perf_counter() - t0
        tp_bm, pushed = best3(lambda: snap_agg_pushdown_bitmap(bm_t, ["k"]))
        assert pushed["n_rows"] == N - n_del, (pushed, n_del)

        print(f"{n_del:>9} {tw_pair:>12.3f} {tp_pair:>11.4f} "
              f"{tw_bm:>10.3f} {tp_bm:>9.4f}")

    print()
    print("== probe 4: rate-limited CDF drain, per-batch cost vs "
          "backfill size (max_files=4) ==")
    from steaminganalysis_spark.operators.storage import _snap_read
    from steaminganalysis_spark.registry import to_cents
    from steaminganalysis_spark.streaming.queries import (
        table_cdf_backfill_step,
    )
    from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

    ev = rows.select(
        F.col("k").alias("event_id"),
        (F.col("grp") % 7).cast("string").alias("event_type"),
        (F.col("k") % 997 / 100.0).alias("value"),
    )
    print(f"{'backfill_files':>14} {'batches':>8} {'per_batch_s':>11}")
    for nfiles in (8, 16, 32):
        tdir = scratch_dir(f"p15_rl_{nfiles}") + "/src"
        mvdir = scratch_dir(f"p15_rlmv_{nfiles}") + "/mv"
        base = _snap_add_files(ev.filter(F.col("event_id") % 10 == 0), tdir, "p15rb")
        _snap_commit(tdir, base, 0)
        bf = _snap_add_files(
            ev.filter(F.col("event_id") % 10 != 0).repartition(nfiles),
            tdir, "p15rf",
        )
        from steaminganalysis_spark.operators.storage import (
            snap_append_optimistic,
        )
        snap_append_optimistic(tdir, bf)
        marker = f"{KEY_PREFIX}p15rl:{nfiles}"
        store = f"p15rl_{nfiles}"
        mv0 = (
            _snap_read(spark, tdir, 0).groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.sum(to_cents(F.col("value"))).cast("long").alias("cents"))
            .coalesce(1)
        )
        _snap_commit(mvdir, _snap_add_files(mv0, mvdir, "p15rm"), 0,
                     txn={marker: 0})
        KVStore.instance(store).apply_batch(0, [], marker)
        ts = []
        nb = 0
        while True:
            t0 = time.perf_counter()
            rec = table_cdf_backfill_step(spark, tdir, mvdir, 4, store, marker)
            dt = time.perf_counter() - t0
            if rec["arm"] == "idle":
                break
            ts.append(dt)
            nb += 1
        KVStore.reset(store)
        print(f"{len(bf):>14} {nb:>8} {sum(ts)/len(ts):>11.3f}")


if __name__ == "__main__":
    main()
