"""Streaming materialized-view maintenance (round 8).

``q_mv_incremental`` (operators/storage.py:733) proves the maintenance
ALGEBRA — merge(agg(history), agg(delta)) ≡ agg(all) for monoid
measures — as one batch operation. Production rollup MVs are
maintained the other way: deltas arrive continuously and each
micro-batch must fold into the stored view transactionally. This
module is that operator: ``foreachBatch`` aggregates the batch to MV
grain and merges it into the stored view by monoid addition, writing
a new table version and committing the batch watermark through the
same atomic ``KVStore.apply_batch`` step as the KV sink and the SCD2
merge (streaming/scd2.py — the shared exactly-once discipline).

Scale shape (100 TB contract):

- Per refresh, only the BATCH is scanned and shuffled (its rollup is
  micro-batch-sized); the stored MV joins in at AGGREGATE cardinality
  (days × types) via a full-outer equi-join on the group key. History
  is never re-read after the one-time base materialization.
- The merged view is written as a NEW VERSION per batch (full-version
  parquet dirs — filesystem-atomic in the sandbox; a lakehouse MERGE
  on a real deployment), and the watermark commits AFTER the version
  write: a crash between the two replays the batch, which rewrites the
  identical version (the merge is a pure function of (previous
  version, batch)) — idempotent by construction.
- Replayed batch ids at or below the watermark return without
  touching the table (the idempotent-sink guard), so at-least-once
  delivery never double-counts a delta.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.streaming.sinks import KEY_PREFIX, KVStore

MV_SCHEMA = "day string, event_type string, n_events long, total_cents long"


def daily_rollup_mv(df: DataFrame) -> DataFrame:
    """The MV definition: per-(day, type) event count + exact cent sum
    — every measure a commutative monoid, the property that makes the
    view incrementally maintainable at all. Identical arithmetic to
    ``q_mv_incremental``'s rollup (operators/storage.py:769)."""
    return (
        df.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


def merge_mv(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Monoid merge of two MV frames at aggregate cardinality: counts
    add, cent sums add, absent groups coalesce to 0."""
    b = base.selectExpr("day", "event_type", "n_events AS bn", "total_cents AS bc")
    d = delta.selectExpr("day", "event_type", "n_events AS dn", "total_cents AS dc")
    return b.join(d, ["day", "event_type"], "full_outer").select(
        "day",
        "event_type",
        (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("long")
        .alias("n_events"),
        (F.coalesce("bc", F.lit(0)) + F.coalesce("dc", F.lit(0)))
        .cast("long")
        .alias("total_cents"),
    )


def _version_dir(table_dir: str, batch_id: int) -> str:
    return os.path.join(table_dir, f"v{batch_id}")


def read_mv(
    spark: SparkSession, table_dir: str, store_name: str, scope: str
) -> DataFrame:
    """The committed state of the view: the version directory named by
    the last-applied watermark, or the pre-materialized base (written
    once at ``table_dir/base``) before any streaming commit."""
    store = KVStore.instance(store_name)
    cur = store.last_applied(f"{KEY_PREFIX}mv-last-applied:{scope}")
    d = (
        os.path.join(table_dir, "base")
        if cur < 0
        else _version_dir(table_dir, cur)
    )
    return spark.read.schema(MV_SCHEMA).parquet(d)


def read_mv_at(spark: SparkSession, table_dir: str, batch_id: int) -> DataFrame:
    """TIME TRAVEL: the view as of an earlier committed batch — every
    merge writes a full self-contained version before advancing the
    watermark, so any version at or below it is a consistent snapshot
    (same contract as ``scd2.read_changes_at``; a retention sweep
    would prune old versions on a real deployment). Versions above the
    committed watermark may be torn writes from a crashed batch, so an
    absent directory is an error, not an empty frame."""
    d = _version_dir(table_dir, batch_id)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no committed version {batch_id} at {table_dir}")
    return spark.read.schema(MV_SCHEMA).parquet(d)


def merge_mv_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_dir: str,
    store_name: str,
    scope: str,
) -> None:
    """foreachBatch body: aggregate the micro-batch to MV grain, merge
    into the committed view, write version ``v{batch_id}``, then
    advance the watermark (see module docstring for the crash story)."""
    spark = batch_df.sparkSession
    store = KVStore.instance(store_name)
    marker = f"{KEY_PREFIX}mv-last-applied:{scope}"
    if batch_id <= store.last_applied(marker):
        return  # replayed committed batch — version dir already final
    prior = read_mv(spark, table_dir, store_name, scope)
    merged = merge_mv(prior, daily_rollup_mv(batch_df))
    merged.write.mode("overwrite").parquet(_version_dir(table_dir, batch_id))
    store.apply_batch(batch_id, [], marker)


def merge_mv_backfill_batch(
    batch_df: DataFrame,
    batch_id: int,
    table_dir: str,
    store_name: str,
    scope: str,
) -> None:
    """foreachBatch body for streams that carry BOTH ordinary deltas
    and RESTATEMENT BACKFILLS (rows flagged ``backfill = 1``): the
    delta subset monoid-adds as usual; the backfill subset REPLACES —
    every day present in it has its stored rows dropped and the
    batch's corrected rollup inserted, the merge a platform runs when
    an audit restates history (late corrections that must not
    double-count against what is already stored). Restated days are
    micro-batch-sized by contract (the backfill carries the full
    corrected day), so the replacement is a broadcast anti-join at
    aggregate cardinality + a union — history is still never re-read.
    Same crash story as ``merge_mv_batch``: version write, then
    watermark."""
    spark = batch_df.sparkSession
    store = KVStore.instance(store_name)
    marker = f"{KEY_PREFIX}mv-last-applied:{scope}"
    if batch_id <= store.last_applied(marker):
        return  # replayed committed batch — version dir already final
    prior = read_mv(spark, table_dir, store_name, scope)
    normal = batch_df.filter(F.col("backfill") == 0).drop("backfill")
    bf = batch_df.filter(F.col("backfill") == 1).drop("backfill")
    merged = merge_mv(prior, daily_rollup_mv(normal))
    corrected = daily_rollup_mv(bf).localCheckpoint(eager=True)
    days = corrected.select("day").distinct()
    merged = merged.join(F.broadcast(days), "day", "anti").unionByName(
        corrected
    )
    merged.write.mode("overwrite").parquet(_version_dir(table_dir, batch_id))
    store.apply_batch(batch_id, [], marker)


def mv_backfill_sink(
    event_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    store_name: str,
):
    """Attach the delta+backfill merge to an event stream whose rows
    carry the ``backfill`` flag column."""
    from steaminganalysis_spark.streaming.sinks import checkpoint_scope

    scope = checkpoint_scope(checkpoint_dir)
    return (
        event_stream.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: merge_mv_backfill_batch(
                df, bid, table_dir, store_name, scope
            )
        )
        .option("checkpointLocation", checkpoint_dir)
    ), scope


def mv_sink(
    event_stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    store_name: str,
):
    """Attach the incremental MV merge to an event stream."""
    from steaminganalysis_spark.streaming.sinks import checkpoint_scope

    scope = checkpoint_scope(checkpoint_dir)
    return (
        event_stream.writeStream.outputMode("append")
        .foreachBatch(
            lambda df, bid: merge_mv_batch(df, bid, table_dir, store_name, scope)
        )
        .option("checkpointLocation", checkpoint_dir)
    ), scope
