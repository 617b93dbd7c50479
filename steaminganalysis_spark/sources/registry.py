"""Batch table registry over a scale-factor directory of parquet files.

Batch reads take the parquet footer schema (no inference cost, full
predicate pushdown + column pruning through the native reader). At
cluster scale the same call works over an object-store prefix; nothing
here assumes local disk.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from steaminganalysis_spark.schemas import TABLE_NAMES, TABLE_SCHEMAS

__all__ = ["load", "load_all", "DEFAULT_SF_DIR"]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _enable_nanos(spark: SparkSession) -> None:
    """The driver fixtures store some timestamps as parquet
    TIMESTAMP(NANOS), which Spark's reader rejects unless the legacy
    conf maps them to long (runtime-settable)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (``region nation customer supplier part
    orders lineitem events documents embeddings``) as a DataFrame.

    Nanosecond-precision timestamp columns (events.ts) arrive as
    nanos-since-epoch longs and are converted to TimestampType via
    integer division (ns → µs, truncating exactly like DuckDB's µs
    timestamps — double division would lose precision above 2^53)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    _enable_nanos(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    actual = dict(df.dtypes)
    for field in TABLE_SCHEMAS[name].fields:
        if isinstance(field.dataType, T.TimestampType) and actual.get(field.name) == "bigint":
            df = df.withColumn(
                field.name, F.timestamp_micros(F.expr(f"{field.name} div 1000"))
            )
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file-source STREAM (the batch fixture
    replayed through Structured Streaming — SURVEY.md §5.2's
    stream-batch equivalence harness). Declared schema, no inference;
    nanos ts handled as in ``load``."""
    _enable_nanos(spark)
    schema = T.StructType(
        [
            T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
            for f in TABLE_SCHEMAS["events"].fields
        ]
    )
    # the file stream source requires a directory; expose the single
    # fixture file through a symlinked dir (a real deployment points at
    # an arriving-files prefix)
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    stream_dir = os.path.join(tempfile.gettempdir(), f"sa_spark_events_dir_{tag}")
    os.makedirs(stream_dir, exist_ok=True)
    link = os.path.join(stream_dir, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    raw = spark.readStream.schema(schema).parquet(stream_dir)
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
