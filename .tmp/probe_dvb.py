import os, sys, time
sys.path.insert(0, "/root/repo")
from steaminganalysis_spark.session import get_spark
from steaminganalysis_spark.sources import load
from pyspark.sql import functions as F
from steaminganalysis_spark.operators import storage as S

spark = get_spark(app_name="probe-dvb")
sf_dir = "/root/testdata/sf0.1"

for trial in range(3):
    from steaminganalysis_spark.scratch import scratch_dir
    table = f"{scratch_dir('snapdvb_probe')}/table"
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.floor(F.col("value") * 100).cast("long").alias("value_cents"))
    t0 = time.perf_counter()
    files, stats = S._snap_add_files_with_stats(
        ev.repartitionByRange(8, "event_id").sortWithinPartitions("event_id"),
        table, "dvb_base", ["event_id"])
    S._snap_commit(table, files, 0, stats=stats)
    t1 = time.perf_counter()
    rec1 = S.snap_delete_bitmap(spark, table, ev.filter(F.col("event_id") % 7 == 3), "event_id")
    t2 = time.perf_counter()
    rec2 = S.snap_delete_bitmap(spark, table, ev.filter(F.col("event_id") % 5 == 2), "event_id")
    t3 = time.perf_counter()
    _, doc = S._snap_latest_doc(table)
    true_deleted = ev.filter((F.col("event_id") % 7 == 3) | (F.col("event_id") % 5 == 2)).count()
    t4 = time.perf_counter()
    pushed = S.snap_agg_pushdown_bitmap(table, ["event_id"])
    mor = S.snap_read_mor_bitmap(spark, table)
    c = mor.count()
    t5 = time.perf_counter()
    out = (mor.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_rows"), F.min("event_id").cast("long").alias("lo_id"),
        F.max("event_id").cast("long").alias("hi_id"), F.sum("value_cents").cast("long").alias("value_cents"))
        .orderBy("event_type"))
    out.write.format("noop").mode("overwrite").save()
    t6 = time.perf_counter()
    print(f"trial {trial}: base_write {t1-t0:.2f}  del1 {t2-t1:.2f}  del2 {t3-t2:.2f}  "
          f"true_cnt {t4-t3:.2f}  mor_cnt {t5-t4:.2f}  final {t6-t5:.2f}  TOTAL {t6-t0:.2f}", flush=True)
