import sys, time; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("judge-r10")
         .config("spark.sql.shuffle.partitions","8")
         .config("spark.driver.memory","12g")
         .config("spark.sql.session.timeZone","UTC")
         .config("spark.ui.enabled","false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from steaminganalysis_spark.registry import collect_queries
from tests.oracle_harness import compare_query
Q, O = collect_queries()
keys = ["q_agg_cms_portable","q_agg_hll_portable","q_graph_harmonic","q_graph_ppr",
        "q_graph_scc_condensation","q_merge_deletion_vector","q_multimodal_resize",
        "q_retrieval_chunked","q_retrieval_eval","q_stream_mv_backfill",
        "q_stream_weighted_sample","q_text_chunk"]
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
