import os, sys, time
sys.path.insert(0, "/root/repo")
heap = sys.argv[1]; parts = sys.argv[2]
os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage
from pyspark.sql import functions as F

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="probe-bf3", shuffle_partitions=int(parts),
                  extra_conf={"spark.eventLog.enabled": "false"})
print("heap", heap, "parts", parts, flush=True)

orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
inc = stage(orders.join(li, orders.o_orderkey == li.l_orderkey)
    .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
    .repartition(F.col("c")).dropDuplicates(), "butterfly_inc")

a, b = inc.alias("a"), inc.alias("b")
wedges = a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p"))).select(
    F.col("a.p").alias("e1"), F.col("b.p").alias("e2"))
pair = wedges.groupBy("e1", "e2").agg(F.count("*").alias("cnt")).filter(F.col("cnt") >= 2)
out = (pair.select(F.expr("(cnt * (cnt - 1)) DIV 2").alias("b2"), "e1", "e2")
       .select(F.explode(F.array("e1", "e2")).alias("part"), "b2")
       .groupBy("part").agg(F.sum("b2").cast("long").alias("bf")).orderBy("part"))
for trial in range(5):
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    print(f"  trial {trial}: {time.perf_counter()-t0:.2f}s", flush=True)
