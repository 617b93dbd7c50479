"""Round-16 scale probes (measured, not asserted).

The round's headline storage claim is VERDICT r15 order #3's: moving
bitmap-DV encode EXECUTOR-side with content-addressed sidecar files
removes the driver from the delete's data path. The r15 write path
collected every matched (file, position-list) row driver-side and
OR'd bitmaps in Python — honest O(deleted rows), but *in the driver*:
a 1% curation delete on 100 TB is ~10⁹ positions of driver memory,
and the inline-base64 manifest grew with every deleted row. Probe
both claims with the DELETED-ROW COUNT swept and everything else
pinned (fixed 200k-row table, 16 files):

1. DRIVER PYTHON ALLOCATION during snap_delete_bitmap (tracemalloc
   peak): expected FLAT in deleted rows — the driver now collects
   only {file, sidecar ref, cardinality} rows. (The executor-side
   encode still pays O(deleted rows) once — the asymmetry, not a
   free lunch, is the claim.)
2. MANIFEST SIZE after the delete: expected FLAT (refs + cards, no
   inline bitmap payload); sidecar bytes ride along for honesty —
   they hold the same compressed bitsets the manifest used to inline,
   just off the metadata hot path.
3. AS-OF-TIMESTAMP resolution cost vs history depth (order #5): the
   first resolution after out-of-band commits pays a one-time
   self-heal catch-up (O(uncovered versions)); the steady-state
   resolution reads ONE log file — expected flat as versions grow
   64 → 256.

Run drained, best-of-3 per cell:  python tools/probes_r16.py
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
    import json
    import tracemalloc

    from pyspark.sql import functions as F

    from steaminganalysis_spark.operators.storage import (
        _snap_add_files,
        _snap_add_files_with_stats,
        _snap_commit,
        _snap_latest_doc,
        _snap_versions,
        snap_commit_ts_append,
        snap_delete_bitmap,
        snap_resolve_as_of,
    )
    from steaminganalysis_spark.scratch import scratch_dir
    from steaminganalysis_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    N = 200_000
    rows = spark.range(N).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("grp")
    )

    print("== probe 1+2: driver allocation + manifest size vs deleted "
          f"rows (fixed {N}-row table, 16 files, sidecar DVs) ==")
    print(f"{'deleted':>9} {'write_s':>8} {'drv_py_peak_kb':>14} "
          f"{'manifest_kb':>11} {'sidecar_kb':>10}")
    for frac_mod in (100, 20, 5, 2):  # ~1%, 5%, 20%, 50% deleted
        keys = rows.filter(F.col("k") % frac_mod == 1).select("k")
        n_del = keys.count()
        t = scratch_dir(f"p16_dvb_{frac_mod}") + "/t"
        fs, st = _snap_add_files_with_stats(
            rows.repartitionByRange(16, "k").sortWithinPartitions("k"),
            t, "p16b", ["k"],
        )
        _snap_commit(t, fs, 0, stats=st)

        tracemalloc.start()
        t0 = time.perf_counter()
        snap_delete_bitmap(spark, t, keys, "k")
        wt = time.perf_counter() - t0
        _cur, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()

        v, doc = _snap_latest_doc(t)
        man_kb = len(json.dumps(doc)) / 1024
        dv_dir = os.path.join(t, "dv")
        sc_kb = sum(
            os.path.getsize(os.path.join(dv_dir, f))
            for f in os.listdir(dv_dir)
        ) / 1024
        print(f"{n_del:>9} {wt:>8.3f} {peak / 1024:>14.0f} "
              f"{man_kb:>11.2f} {sc_kb:>10.1f}")

    print()
    print("== probe 3: AS-OF resolution vs history depth "
          "(catch-up once, then one log read) ==")
    print(f"{'versions':>9} {'selfheal_s':>10} {'steady_s':>9}")
    for n_commits in (64, 256):
        t = scratch_dir(f"p16_tts_{n_commits}") + "/t"
        f0 = _snap_add_files(rows.limit(10), t, "p16t0")
        _snap_commit(t, f0, 0)
        for i in range(1, n_commits):
            fi = _snap_add_files(rows.limit(1), t, f"p16t{i}")
            snap_commit_ts_append(t, fi, 1000 + i)
        # strip the log: every resolution state a legacy/pre-log or
        # crash-interrupted table can be in
        os.remove(os.path.join(t, "manifests", "_snapshot_log.jsonl"))
        t0 = time.perf_counter()
        snap_resolve_as_of(t, 1000 + n_commits)
        heal = time.perf_counter() - t0
        steady, _ = best3(lambda: snap_resolve_as_of(t, 1000 + n_commits // 2))
        assert len(_snap_versions(t)) == n_commits
        print(f"{n_commits:>9} {heal:>10.4f} {steady:>9.5f}")

    spark.stop()


if __name__ == "__main__":
    main()
