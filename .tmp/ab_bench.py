"""Interleaved A/B: time the r17-changed bench queries (+ an unchanged
control) on one tree. Usage: python ab_bench.py <repo_root> <tag>"""
import os, sys, time

root, tag = sys.argv[1], sys.argv[2]
sys.path.insert(0, root)
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.registry import collect_queries

spark = get_spark(app_name=f"ab-{tag}")
q, _ = collect_queries()
sf_dir = "/root/testdata/sf0.1"
NAMES = [
    "q_graph_butterfly",
    "q_table_merge_dv_bitmap",
    "q_table_two_level_pruning",
    "q_table_agg_pushdown_dv",
    "q_graph_pagerank",  # control: untouched this round
]
q["q_daily_rollup"](spark, sf_dir).write.format("noop").mode("overwrite").save()
out = {}
for name in NAMES:
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    out[name] = round(min(runs), 3)
print(tag, out, flush=True)
