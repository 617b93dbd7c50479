import sys; sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="dbg-clamp")
from steaminganalysis_spark.operators.storage import _snap_add_files, _snap_commit, _snap_read, _snap_latest_doc
from steaminganalysis_spark.registry import to_cents
from steaminganalysis_spark.scratch import scratch_dir
from steaminganalysis_spark.streaming.queries import table_cdf_backfill_step
from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

tag = "dbgclamp"
src = f"{scratch_dir(tag)}/src"; mv = f"{scratch_dir(tag)}/mv"
v0 = spark.createDataFrame([(1, "a", 1.0)], "event_id long, event_type string, value double")
_snap_commit(src, _snap_add_files(v0, src, "c0"), 0)
rows = [(2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)]
for i, row in enumerate(rows):
    inc = spark.createDataFrame([row], "event_id long, event_type string, value double")
    v, doc = _snap_latest_doc(src)
    added = _snap_add_files(inc, src, f"c{i+1}")
    print("commit", i+1, "adds", added)
    _snap_commit(src, doc["files"] + added, v + 1)
marker = f"{KEY_PREFIX}{tag}:x"; store_name = f"{tag}_store"
mv0 = v0.groupBy("event_type").agg(F.count("*").cast("long").alias("n_rows"), F.sum(to_cents(F.col("value"))).cast("long").alias("cents"))
_snap_commit(mv, _snap_add_files(mv0, mv, "m0"), 0, txn={marker: 0})
KVStore.instance(store_name).apply_batch(0, [], marker)
print("r1", table_cdf_backfill_step(spark, src, mv, 1, store_name, marker, crash_before_watermark=True))
print("r2", table_cdf_backfill_step(spark, src, mv, 3, store_name, marker))
print("r3", table_cdf_backfill_step(spark, src, mv, 3, store_name, marker))
print({r.event_type: (r.n_rows, r.cents) for r in _snap_read(spark, mv).collect()})
