import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.registry import collect_queries
spark = get_spark(app_name="probe-bf6")
q, _ = collect_queries()
sf_dir = "/root/testdata/sf0.1"
for trial in range(6):
    t0 = time.perf_counter()
    q["q_graph_butterfly"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"  butterfly trial {trial}: {time.perf_counter()-t0:.2f}s", flush=True)
