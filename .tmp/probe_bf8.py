import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage
from pyspark.sql import functions as F

spark = get_spark(app_name="probe-bf8", extra_conf={"spark.ui.enabled": "false"})
sf_dir = "/root/testdata/sf0.1"
orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
inc = stage(orders.join(li, orders.o_orderkey == li.l_orderkey)
    .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
    .repartition(F.col("c")).dropDuplicates(), "butterfly_inc")
a, b = inc.alias("a"), inc.alias("b")
wedges = a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p"))).select(
    F.col("a.p").alias("e1"), F.col("b.p").alias("e2"))

def plain():
    pc = wedges.groupBy("e1", "e2").agg(F.count("*").alias("cnt")).filter(F.col("cnt") >= 2)
    bf = pc.select("e1", "e2", F.expr("(cnt * (cnt - 1)) DIV 2").alias("b"))
    return (bf.select(F.explode(F.array("e1", "e2")).alias("part"), "b")
            .groupBy("part").agg(F.sum("b").cast("long").alias("bf")).orderBy("part"))

def packed():
    pk = wedges.select((F.shiftleft(F.col("e1"), 32) + F.col("e2")).alias("pk"))
    pc = pk.groupBy("pk").agg(F.count("*").alias("cnt")).filter(F.col("cnt") >= 2)
    bf = pc.select(
        F.shiftrightunsigned(F.col("pk"), 32).alias("e1"),
        F.col("pk").bitwiseAND(F.lit((1 << 32) - 1)).alias("e2"),
        F.expr("(cnt * (cnt - 1)) DIV 2").alias("b"))
    return (bf.select(F.explode(F.array("e1", "e2")).alias("part"), "b")
            .groupBy("part").agg(F.sum("b").cast("long").alias("bf")).orderBy("part"))

# correctness check first
p1 = {tuple(r) for r in plain().collect()}
p2 = {tuple(r) for r in packed().collect()}
print("identical:", p1 == p2, len(p1), flush=True)
for rnd in range(3):
    for tag, fn in (("plain", plain), ("packed", packed)):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        print(f"  round {rnd} {tag}: {time.perf_counter()-t0:.2f}s", flush=True)
