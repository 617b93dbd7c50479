import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]").appName("sweep-post311")
         .config("spark.sql.shuffle.partitions","16")
         .config("spark.driver.memory","16g")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from steaminganalysis_spark.registry import collect_queries
from tests.oracle_harness import compare_query
Q, O = collect_queries()
KEYS = ["q_graph_butterfly", "q_retrieval_mmr", "q_decontaminate_fuzzy", "q_stream_decon_guard"]
fails = []
for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
    for name in KEYS:
        try:
            probs = compare_query(spark, name, sf, Q, O)
            if probs:
                fails.append((sf, name)); print("FAIL", sf, name, "::", probs[0][:200], flush=True)
            else:
                print("OK", sf, name, flush=True)
        except Exception as ex:
            fails.append((sf, name)); print("ERR", sf, name, "::", str(ex)[:200], flush=True)
print("TOTAL", len(KEYS)*2, "FAILS", len(fails), fails, flush=True)
