import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage
from pyspark.sql import functions as F

extra = {}
if len(sys.argv) > 1 and sys.argv[1] == "shm":
    extra["spark.local.dir"] = "/dev/shm/sa_spark_local"
spark = get_spark(app_name="probe-bf4", extra_conf=extra)
sf_dir = "/root/testdata/sf0.1"
print("local.dir:", spark.conf.get("spark.local.dir", "<default>"), flush=True)

from steaminganalysis_spark.registry import collect_queries
q, _ = collect_queries()
for trial in range(6):
    t0 = time.perf_counter()
    q["q_graph_butterfly"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"  butterfly trial {trial}: {time.perf_counter()-t0:.2f}s", flush=True)
