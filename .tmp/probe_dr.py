import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.registry import collect_queries
from steaminganalysis_spark.sources import load
from pyspark.sql import functions as F
spark = get_spark(app_name="probe-dr")
q, _ = collect_queries()
sf_dir = "/root/testdata/sf0.1"

def t(tag, fn, n=5):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    print(tag, [f"{x:.3f}" for x in runs], flush=True)

t("daily_rollup", lambda: q["q_daily_rollup"](spark, sf_dir))
ev = load(spark, sf_dir, "events")
t("scan_only", lambda: ev.select("ts","event_type","value"))
t("group_nofee", lambda: ev.groupBy(F.date_format("ts","yyyy-MM-dd").alias("day")).agg(F.count("*").alias("n")))
from steaminganalysis_spark.registry import dsum
t("group_fee", lambda: ev.groupBy(F.date_format("ts","yyyy-MM-dd").alias("day")).agg(
    F.count("*").alias("total"),
    F.count(F.when(F.col("event_type")=="purchase",1)).alias("success"),
    dsum(F.when(F.col("event_type")=="purchase", F.col("value")).otherwise(0.0)).alias("fee")))
t("daily_rollup2", lambda: q["q_daily_rollup"](spark, sf_dir))
