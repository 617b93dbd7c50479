import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage
from pyspark.sql import functions as F
spark = get_spark(app_name="probe-jac2")
sf_dir = "/root/testdata/sf0.1"
from steaminganalysis_spark.operators.llm import _shingle_hashes
from steaminganalysis_spark.registry import round_half_up

sh = _shingle_hashes(spark, sf_dir)
sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
shn = stage(sh.join(F.broadcast(sizes), "doc_id"), "jaccard_annotated", bucket_col="h")
a, b = shn.alias("a"), shn.alias("b")
joined = a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (F.col("a.n") * F.lit(0.8) <= F.col("b.n"))
                & (F.col("b.n") * F.lit(0.8) <= F.col("a.n")))

def cur():
    inter = joined.groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
                           F.col("a.n").alias("na"), F.col("b.n").alias("nb")).agg(F.count("*").alias("n_common"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return inter.filter(jac >= 0.8).select("doc_a", "doc_b", round_half_up(jac, 6).alias("jaccard"))

def anyv():
    inter = joined.groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")).agg(
        F.count("*").alias("n_common"), F.any_value(F.col("a.n")).alias("na"), F.any_value(F.col("b.n")).alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return inter.filter(jac >= 0.8).select("doc_a", "doc_b", round_half_up(jac, 6).alias("jaccard"))

r1 = {tuple(r) for r in cur().collect()}; r2 = {tuple(r) for r in anyv().collect()}
print("identical:", r1 == r2, len(r1), flush=True)
for rnd in range(3):
    for tag, fn in (("cur", cur), ("anyv", anyv)):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        print(f"  round {rnd} {tag}: {time.perf_counter()-t0:.2f}s", flush=True)
