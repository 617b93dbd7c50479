import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage
from pyspark.sql import functions as F
spark = get_spark(app_name="probe-bf9")
sf_dir = "/root/testdata/sf0.1"
orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
inc0 = stage(orders.join(li, orders.o_orderkey == li.l_orderkey)
    .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
    .repartition(F.col("c")).dropDuplicates(), "butterfly_inc")

def pipeline(inc):
    a, b = inc.alias("a"), inc.alias("b")
    wedges = a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p"))).select(
        (F.shiftleft(F.col("a.p"), 32) + F.col("b.p")).alias("pk"))
    pc = wedges.groupBy("pk").agg(F.count("*").alias("cnt")).filter(F.col("cnt") >= 2)
    bf = pc.select(F.shiftrightunsigned(F.col("pk"), 32).alias("e1"),
                   F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("e2"),
                   F.expr("(cnt * (cnt - 1)) DIV 2").alias("b"))
    return (bf.select(F.explode(F.array("e1", "e2")).alias("part"), "b")
            .groupBy("part").agg(F.sum("b").cast("long").alias("bf")).orderBy("part"))

cur = lambda: pipeline(inc0)
rep = lambda: pipeline(inc0.repartition(F.col("c")))
r1 = {tuple(r) for r in cur().collect()}; r2 = {tuple(r) for r in rep().collect()}
print("identical:", r1 == r2, flush=True)
import re
for tag, fn in (("cur", cur), ("rep", rep)):
    plan = fn()._jdf.queryExecution().executedPlan().toString()
    print(tag, "exchanges:", len(re.findall(r"Exchange hashpartitioning", plan)), flush=True)
for rnd in range(3):
    for tag, fn in (("cur", cur), ("rep", rep)):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        print(f"  round {rnd} {tag}: {time.perf_counter()-t0:.2f}s", flush=True)
