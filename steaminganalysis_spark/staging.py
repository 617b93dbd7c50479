"""Intermediate-result staging: materialize a frame ONCE so aliased
self-join branches read a stored artifact instead of re-planning (and
re-executing) the producing lineage per branch — Catalyst's exchange
reuse does not canonicalize across differently-aliased subtrees, so an
unstaged shingle table is generated FOUR times in the exact-Jaccard
self-join (a/b sides × rows/sizes).

Two interchangeable modes, selected by ``SPARK_GRAFT_STAGING`` at
plan-build time (output is identical — pinned by
tests/test_storage.py::test_table_staging_matches_local):

- ``local`` (default): ``localCheckpoint(eager=True)``. Blocks live in
  executor storage — the cheapest possible staging on a single-JVM
  ``local[*]`` (this harness, a notebook), but executor loss on a real
  cluster kills the cached blocks and the job with them.
- ``table``: write a scratch parquet table and read it back — the
  cluster-grade path. Durable across executor loss, readable by other
  jobs, and when a bucket column is given the table is bucketed on it
  (``storage.write_bucketed``) so every downstream self-join/aggregate
  keyed on that column runs with ZERO exchanges. At 100 TB this is the
  "persistent bucketed shingle table" the near-dedup pipeline stages
  once and every dedup operator (Jaccard, MinHash bands, SimHash
  blocks, LSH buckets, containment) reuses.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

__all__ = ["stage", "staging_mode"]

# Tags whose stale tables were already dropped by THIS process. The
# wipe-previous hygiene runs once per tag per process (clearing
# leftovers from earlier runs); within a process each stage() call
# creates a fresh uuid-suffixed table WITHOUT dropping its
# predecessors, so a frame returned by an earlier stage() of the same
# tag (e.g. two dedup queries both staging 'shingles') stays readable
# until the process exits — building query B's plan can no longer
# invalidate query A's still-unforced frame (ADVICE r3).
_CLEANED_TAGS: set[str] = set()


def staging_mode() -> str:
    mode = os.environ.get("SPARK_GRAFT_STAGING", "local")
    if mode not in ("local", "table"):
        raise ValueError(
            f"SPARK_GRAFT_STAGING={mode!r}: expected 'local' or 'table'"
        )
    return mode


def stage(df: DataFrame, tag: str, bucket_col: str | None = None) -> DataFrame:
    """Materialize ``df`` once and return a frame that reads the
    materialization. ``tag`` names the artifact (scratch hygiene —
    one live dir per tag per process); ``bucket_col`` opts the table
    mode into a bucketed layout keyed for the caller's self-join."""
    if staging_mode() == "local":
        return df.localCheckpoint(eager=True)

    spark = df.sparkSession
    if bucket_col is not None:
        from steaminganalysis_spark.operators.storage import write_bucketed

        # scratch hygiene: drop this tag's previous staging tables —
        # but only ONCE per process (first use of the tag), clearing
        # leftovers from prior runs. Dropping on every call would
        # invalidate frames returned by earlier stage() calls of the
        # same tag that the caller has not forced yet.
        prefix = f"sa_stage_{tag}_"
        if tag not in _CLEANED_TAGS:
            for t in spark.catalog.listTables():
                if t.name.startswith(prefix):
                    spark.sql(f"DROP TABLE IF EXISTS {t.name}")
            _CLEANED_TAGS.add(tag)
        table = f"{prefix}{uuid.uuid4().hex[:8]}"
        write_bucketed(spark, df, table, bucket_col)
        return spark.table(table)

    from steaminganalysis_spark.scratch import scratch_dir

    path = os.path.join(scratch_dir(f"stage_{tag}"), "data")
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)
