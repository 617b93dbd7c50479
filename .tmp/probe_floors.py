import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.registry import collect_queries
spark = get_spark(app_name="probe-floors")
q, _ = collect_queries()
sf_dir = "/root/testdata/sf0.1"
names = sys.argv[1:]
for name in names:
    runs = []
    for _ in range(6):
        t0 = time.perf_counter()
        q[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
    print(f"{name}: min {min(runs):.3f}  runs {[f'{x:.2f}' for x in runs]}", flush=True)
