import sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("judge-r9")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.driver.memory","12g")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from steaminganalysis_spark.registry import collect_queries
from tests.oracle_harness import compare_query
Q, O = collect_queries()
keys = ["q_graph_scc","q_graph_anf","q_graph_butterfly","q_graph_k_truss",
        "q_dedup_keep_best","q_retrieval_mmr","q_decontaminate_fuzzy",
        "q_stream_decon_guard","q_stream_mv_time_travel","q_stream_ann_index"]
for sf in ["sf0.01"]:
    for name in keys:
        t0=time.time()
        try:
            if name not in O:
                n = Q[name](spark, f"/root/testdata/{sf}").count()
                print(f"{sf} {name}: rows-only, rows={n} ({time.time()-t0:.1f}s)", flush=True)
                continue
            probs = compare_query(spark, name, f"/root/testdata/{sf}", Q, O)
            print(f"{sf} {name}: {'OK' if not probs else 'FAIL '+probs[0][:200]} ({time.time()-t0:.1f}s)", flush=True)
        except Exception as ex:
            print(f"{sf} {name}: ERR {str(ex)[:200]}", flush=True)
print("DONE", flush=True)
