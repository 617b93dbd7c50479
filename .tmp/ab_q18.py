"""Interleaved A/B probe for one query: time best-of-3 noop-forced
runs of q_tpch_q18 at sf0.1 in the tree given as argv[1] (BENCH_NOTES
standing protocol step 2). Prints one line: <label> <min> <runs>."""
import json
import sys
import time

tree = sys.argv[1]
label = sys.argv[2]
sys.path.insert(0, tree)

from steaminganalysis_spark.registry import collect_queries  # noqa: E402
from steaminganalysis_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"ab-q18-{label}")
spark.sparkContext.setLogLevel("ERROR")
queries, _ = collect_queries()


def force(name):
    t0 = time.perf_counter()
    queries[name](spark, "/root/testdata/sf0.1").write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


force("q_daily_rollup")  # warmup, untimed
force("q_tpch_q18")  # codegen warmup for the probed plan shape
runs = sorted(round(force("q_tpch_q18"), 3) for _ in range(3))
print("ABRES", label, runs[0], json.dumps(runs), flush=True)
