import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage
from pyspark.sql import functions as F

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="probe-bf")

t0 = time.perf_counter()
orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
inc_df = (orders.join(li, orders.o_orderkey == li.l_orderkey)
    .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
    .repartition(F.col("c"))
    .dropDuplicates())
inc = stage(inc_df, "butterfly_inc")
t1 = time.perf_counter(); print(f"stage inc: {t1-t0:.3f}s", flush=True)

wedge_cost = {}
for side in ("c", "p"):
    wedge_cost[side] = (inc.groupBy(side).agg(F.count("*").alias("n"))
        .select(F.sum(F.expr("(n * (n - 1)) DIV 2")).alias("w")).collect()[0]["w"] or 0)
t2 = time.perf_counter(); print(f"wedge costs: {t2-t1:.3f}s  {wedge_cost}", flush=True)
center = "p" if 2 * wedge_cost["p"] < wedge_cost["c"] else "c"
print("center:", center, flush=True)

from steaminganalysis_spark.operators.graph import _butterfly_counts, BUTTERFLY_HUB_DEGREE_CAP
res = _butterfly_counts(inc, center, BUTTERFLY_HUB_DEGREE_CAP)
t3 = time.perf_counter(); print(f"plan counts: {t3-t2:.3f}s", flush=True)
res.write.format("noop").mode("overwrite").save()
t4 = time.perf_counter(); print(f"execute: {t4-t3:.3f}s  TOTAL {t4-t0:.3f}s", flush=True)

# second run end-to-end (warm)
from steaminganalysis_spark.registry import collect_queries
q, _ = collect_queries()
for i in range(3):
    t5 = time.perf_counter()
    q["q_graph_butterfly"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"full run {i}: {time.perf_counter()-t5:.3f}s", flush=True)
