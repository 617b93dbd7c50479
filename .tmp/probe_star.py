import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.registry import dsum
from pyspark.sql import functions as F

spark = get_spark(app_name="probe-star")
sf_dir = "/root/testdata/sf0.1"

def cur(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem"); s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation"); r = load(spark, sf_dir, "region")
    return (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_lines"),
             dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")))

def pre(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem"); s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation"); r = load(spark, sf_dir, "region")
    dim = (s.join(n, s.s_nationkey == n.n_nationkey)
             .join(r, n.n_regionkey == r.r_regionkey)
             .select("s_suppkey", "r_name"))
    return (li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_lines"),
             dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")))

for tag, fn in (("cur", cur), ("pre", pre), ("cur", cur), ("pre", pre)):
    runs = []
    for _ in range(4):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    print(tag, [f"{x:.3f}" for x in runs], flush=True)
