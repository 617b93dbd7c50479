#!/usr/bin/env python
"""Canonical full-registry sweep harness (driver-sim): run every
registered query against its DuckDB oracle at one SF, in ONE
local-mode JVM, with heap growth bounded BY DESIGN.

Why this exists (round-10 lesson, VERDICT r10 order #3): a 300+-key
sweep in a single JVM accumulates one localCheckpoint block set per
staged frame per key. Those blocks are only released when the JVM-side
RDD reference is garbage-collected — which the Python-side DataFrame
going out of scope does NOT deterministically trigger (py4j finalizers
+ Spark's ContextCleaner run "eventually"). At the 1 g default driver
heap the round-10 sweep OOM'd nondeterministically around the ~110th
key at sf0.1. Provisioning (spark.driver.memory=8g) hides the growth;
this harness REMOVES it:

- After EVERY key, all persistent RDDs are explicitly unpersisted
  (``_release_blocks``). This is safe exactly at key boundaries: each
  query call stages its own frames (no operator memoizes a
  checkpointed DataFrame across calls — plain ``.cache()`` sites can
  always recompute from lineage), and a key's result is fully
  collected by the comparison before the next key starts.
- The JVM heap watermark is sampled per key and the peak printed in
  the TOTAL line; ``--assert-heap-mb`` turns boundedness into a hard
  exit code for CI-style use.

Usage:
    python tools/sweep.py [--sf-dir /root/testdata/sf0.01]
        [--keys q_a q_b ...] [--threads 8] [--shuffle-partitions 8]
        [--driver-memory 8g] [--assert-heap-mb N]

Prints one line per key (OK / OK(rows-only) / FAIL / ERR) and a final
``TOTAL <n> FAILS <k> [...] PEAK_HEAP_MB <m>`` line; exit code 0 iff
zero fails (and the heap assertion, if given, holds).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _release_blocks(spark) -> None:
    """Unpersist every persistent RDD (staged localCheckpoint blocks,
    caches). Only call at key boundaries — a localCheckpointed frame
    is unrecoverable after this."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd_id in list(jmap.keySet().toArray()):
        jmap.get(rdd_id).unpersist(False)


def _heap_used_mb(spark) -> int:
    """Live heap after a GC — without the System.gc() the watermark
    counts uncollected garbage and says nothing about boundedness."""
    spark.sparkContext._jvm.java.lang.System.gc()
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    return int((rt.totalMemory() - rt.freeMemory()) // (1024 * 1024))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--keys", nargs="*", default=None,
                    help="subset of query keys (default: all registered)")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--shuffle-partitions", type=int, default=8)
    ap.add_argument("--driver-memory", default="8g",
                    help="belt AND suspenders; the per-key release is "
                         "what bounds growth")
    ap.add_argument("--assert-heap-mb", type=int, default=None,
                    help="fail if the per-key heap watermark ever "
                         "exceeds this")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.threads}]")
        .appName("sweep-harness")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.driver.memory", args.driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E
    from tests.oracle_harness import compare_query

    Q, O = E.queries(), E.oracle_sql()
    keys = args.keys if args.keys else sorted(Q)
    unknown = [k for k in keys if k not in Q]
    if unknown:
        print("UNKNOWN KEYS:", unknown)
        return 2

    fails: list[str] = []
    peak_mb = 0
    for name in keys:
        try:
            if name not in O:
                n = Q[name](spark, args.sf_dir).count()
                print(f"OK(rows-only) {name} rows={n}" if n > 0
                      else f"FAIL {name} :: 0 rows")
                if n == 0:
                    fails.append(name)
            else:
                probs = compare_query(spark, name, args.sf_dir, Q, O)
                print(f"FAIL {name} :: {probs[0][:200]}" if probs
                      else f"OK {name}")
                if probs:
                    fails.append(name)
        except Exception as ex:  # noqa: BLE001 — sweep must finish
            fails.append(name)
            print(f"ERR {name} :: {str(ex)[:200]}")
        # bounded-by-design: release this key's staged blocks NOW,
        # then sample the watermark the next key starts from
        _release_blocks(spark)
        peak_mb = max(peak_mb, _heap_used_mb(spark))
        sys.stdout.flush()

    print(f"TOTAL {len(keys)} FAILS {len(fails)} {fails} "
          f"PEAK_HEAP_MB {peak_mb}")
    if args.assert_heap_mb is not None and peak_mb > args.assert_heap_mb:
        print(f"HEAP ASSERTION FAILED: {peak_mb} > {args.assert_heap_mb}")
        return 3
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
