import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage
from pyspark.sql import functions as F

spark = get_spark(app_name="probe-bf5")
sf_dir = "/root/testdata/sf0.1"

orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
inc = stage(orders.join(li, orders.o_orderkey == li.l_orderkey)
    .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
    .repartition(F.col("c")).dropDuplicates(), "butterfly_inc")

# one-job probe: per-side wedge volume + max degree
t0 = time.perf_counter()
probe = (
    inc.select(F.lit("c").alias("side"), F.col("c").alias("k"))
    .unionAll(inc.select(F.lit("p").alias("side"), F.col("p").alias("k")))
    .groupBy("side", "k").agg(F.count("*").alias("n"))
    .groupBy("side").agg(
        F.sum(F.expr("(n * (n - 1)) DIV 2")).alias("w"),
        F.max("n").alias("max_deg"))
).collect()
print("probe one-job:", {r["side"]: (r["w"], r["max_deg"]) for r in probe},
      f"{time.perf_counter()-t0:.2f}s", flush=True)

# array-based wedge generation (no self-join): groupBy c, sorted parts array, pair explode
def array_counts():
    arrs = inc.groupBy("c").agg(F.sort_array(F.collect_list("p")).alias("ps"))
    pairs = arrs.select(F.explode(F.expr(
        "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS e1, y AS e2))))"
    )).alias("w")).select("w.e1", "w.e2")
    pc = pairs.groupBy("e1", "e2").agg(F.count("*").alias("cnt")).filter(F.col("cnt") >= 2)
    bf = pc.select("e1", "e2", F.expr("(cnt * (cnt - 1)) DIV 2").alias("b"))
    return (bf.select(F.explode(F.array("e1", "e2")).alias("part"), "b")
            .groupBy("part").agg(F.sum("b").cast("long").alias("butterflies")).orderBy("part"))

for trial in range(6):
    t0 = time.perf_counter()
    array_counts().write.format("noop").mode("overwrite").save()
    print(f"  array trial {trial}: {time.perf_counter()-t0:.2f}s", flush=True)
