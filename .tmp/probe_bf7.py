import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.registry import collect_queries
spark = get_spark(app_name="probe-bf7", extra_conf={
    "spark.driver.extraJavaOptions": "-Xlog:gc*:file=/root/repo/.tmp/gc_bf.log:time,uptime -XX:+UnlockDiagnosticVMOptions -Xlog:jit+compilation=debug:file=/root/repo/.tmp/jit_bf.log:none"})
q, _ = collect_queries()
sf_dir = "/root/testdata/sf0.1"
for trial in range(4):
    t0 = time.perf_counter()
    q["q_graph_butterfly"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"trial {trial}: {time.perf_counter()-t0:.2f}s", flush=True)
