import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from steaminganalysis_spark.staging import stage
from steaminganalysis_spark.registry import collect_queries
from pyspark.sql import functions as F
spark = get_spark(app_name="probe-jac")
sf_dir = "/root/testdata/sf0.1"
q, _ = collect_queries()
from steaminganalysis_spark.operators.llm import _shingle_hashes, _SHINGLE_DF_CAP
for trial in range(4):
    t0 = time.perf_counter()
    sh = _shingle_hashes(spark, sf_dir)
    t1 = time.perf_counter()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    shn = stage(sh.join(F.broadcast(sizes), "doc_id"), "jaccard_annotated", bucket_col="h")
    t2 = time.perf_counter()
    # full query
    q["q_dedup_ngram_jaccard"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    t3 = time.perf_counter()
    print(f"trial {trial}: shingles {t1-t0:.2f}  annotate {t2-t1:.2f}  FULL {t3-t0:.2f} (join+agg {t3-t2:.2f})", flush=True)
