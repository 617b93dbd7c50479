import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage
from pyspark.sql import functions as F

sf_dir = "/root/testdata/sf0.1"
spark = get_spark(app_name="probe-bf2")
sc = spark.sparkContext

orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
inc_df = (orders.join(li, orders.o_orderkey == li.l_orderkey)
    .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
    .repartition(F.col("c"))
    .dropDuplicates())

for trial in range(6):
    t0 = time.perf_counter()
    inc = stage(inc_df, "butterfly_inc")
    t1 = time.perf_counter()
    lo = inc  # no hubs at sf0.1 (cap 256, max deg 60) -> skip degree plumbing for probe
    deg = inc.groupBy("c").agg(F.count("*").alias("deg"))
    flagged = inc.join(deg, "c")
    low = flagged.filter(F.col("deg") <= 256).select("c", "p")
    a, b = low.alias("a"), low.alias("b")
    wedges = a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.p") < F.col("b.p"))).select(
        F.col("a.p").alias("e1"), F.col("b.p").alias("e2"))
    # stage 1: force wedges only
    wedges.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    pair_counts = wedges.groupBy("e1", "e2").agg(F.count("*").alias("cnt")).filter(F.col("cnt") >= 2)
    bf = pair_counts.select("e1", "e2", F.expr("(cnt * (cnt - 1)) DIV 2").alias("b"))
    out = (bf.select(F.explode(F.array("e1", "e2")).alias("part"), "b")
             .groupBy("part").agg(F.sum("b").cast("long").alias("butterflies")).orderBy("part"))
    out.write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(f"trial {trial}: stage_inc {t1-t0:.2f}  wedges_only {t2-t1:.2f}  full_counts {t3-t2:.2f}", flush=True)
