import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]").appName("sweep-sf01-final")
         .config("spark.sql.shuffle.partitions","16")
         .config("spark.driver.memory","16g")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from steaminganalysis_spark.registry import collect_queries
from tests.oracle_harness import compare_query
Q, O = collect_queries()
fails = []
for i, name in enumerate(sorted(Q)):
    try:
        probs = compare_query(spark, name, "/root/testdata/sf0.1", Q, O)
        if probs:
            fails.append(name); print("FAIL", name, "::", probs[0][:200], flush=True)
        else:
            print("OK", name, flush=True)
    except Exception as ex:
        fails.append(name); print("ERR", name, "::", str(ex)[:200], flush=True)
print("TOTAL", len(Q), "FAILS", len(fails), fails, flush=True)
