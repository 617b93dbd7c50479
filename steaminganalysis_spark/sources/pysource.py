"""Custom Python data source (Spark 4 DataSource API) — the extension
point a proprietary store's connector plugs into, demonstrated with a
deterministic synthetic order ledger.

The connector implements the full batch-read contract:
- ``schema()`` — declared schema, no inference pass;
- ``partitions()`` — split planning: N ranges, each read independently
  by an executor (the parallelism contract a real connector maps to
  its shards/segments);
- ``read(partition)`` — per-partition row generation, a pure function
  of order_id, so the source is reproducible on any engine and the
  DuckDB oracle can regenerate the identical table with
  ``generate_series`` arithmetic.

Reference lineage: the reference's MockData/KafkaProducer feeder
(Producer:16-62) is exactly this — a synthetic deterministic feed; here
it is a first-class pluggable source instead of a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

LEDGER_ROWS = 10_000
LEDGER_PARTITIONS = 8
_MULT = 2654435761  # Knuth multiplicative hash constant


def ledger_row(oid: int) -> tuple[int, str, int, str]:
    """The ledger's generator — one pure function shared by the Spark
    reader and (re-expressed in SQL) the DuckDB oracle."""
    amount = (oid * _MULT) % 100_000
    status = "paid" if amount % 10 < 7 else "refund"
    day = f"2024-01-{oid % 30 + 1:02d}"
    return oid, day, amount, status


class LedgerReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n_rows", LEDGER_ROWS))
        self.p = int(options.get("n_partitions", LEDGER_PARTITIONS))

    def partitions(self):
        step = (self.n + self.p - 1) // self.p
        return [
            InputPartition((lo, min(self.n, lo + step)))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for oid in range(lo, hi):
            yield ledger_row(oid)


class LedgerDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sa_ledger"

    def schema(self) -> str:
        return "order_id long, day string, amount_cents long, status string"

    def reader(self, schema):
        return LedgerReader(self.options)

    def simpleStreamReader(self, schema):
        return LedgerStreamReader(self.options)

    def writer(self, schema, overwrite):
        return LedgerWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return LedgerStreamWriter(self.options)


def register_ledger_source(spark) -> None:
    """Idempotent registration (latest registration wins in Spark)."""
    spark.dataSource.register(LedgerDataSource)


class LedgerStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the connector: offsets are row positions;
    each micro-batch emits the next chunk of the deterministic ledger,
    and `readBetweenOffsets` regenerates any committed range exactly —
    the replayability contract checkpoint recovery depends on. When
    the ledger is exhausted, `read` returns an empty batch at the same
    offset, so run-to-completion harnesses terminate."""

    def __init__(self, options: dict) -> None:
        self.n = int(options.get("n_rows", LEDGER_ROWS))
        self.batch = int(options.get("rows_per_batch", 2500))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        # a LIST ITERATOR, not a generator and not a bare list: the
        # prefetch cache copy.copy()s the iterator (generators are not
        # copyable) and probes exhaustion with next() (lists are not
        # iterators)
        pos = int(start["pos"])
        end = min(self.n, pos + self.batch)
        return iter([ledger_row(i) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [ledger_row(i) for i in range(int(start["pos"]), int(end["pos"]))]
        )


class LedgerPushdownReader(LedgerReader):
    """`LedgerReader` + filter pushdown INTO the connector: equality
    filters on `status` are absorbed (`pushFilters` keeps them and
    returns the rest to Spark), and `read` skips non-matching rows at
    generation time — rows Spark never sees, the way a real connector
    turns a predicate into an index/range read.

    Lives on a SEPARATE source name (`sa_ledger_pd`): a reader that
    implements `pushFilters` hard-errors when
    ``spark.sql.python.filterPushdown.enabled`` is false (the
    default), and the registered oracle queries must run under any
    plain session."""

    def __init__(self, options: dict) -> None:
        super().__init__(options)
        self.status_filters: list[str] = []

    def pushFilters(self, filters):
        from pyspark.sql.datasource import EqualTo

        remaining = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("status",):
                self.status_filters.append(f.value)
            else:
                remaining.append(f)
        return iter(remaining)

    def read(self, partition: InputPartition):
        lo, hi = partition.value
        for oid in range(lo, hi):
            row = ledger_row(oid)
            if self.status_filters and row[3] not in self.status_filters:
                continue
            yield row


class LedgerPushdownDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sa_ledger_pd"

    def schema(self) -> str:
        return "order_id long, day string, amount_cents long, status string"

    def reader(self, schema):
        return LedgerPushdownReader(self.options)


def register_ledger_pushdown_source(spark) -> None:
    spark.dataSource.register(LedgerPushdownDataSource)


# ------------------------------------------------------ writer path
#
# The write half of the DataSource API: executors write task files,
# the driver commits by writing a MANIFEST naming exactly the files of
# successful tasks (commit/abort protocol). Readers honor the manifest
# and ignore stray files from failed/aborted tasks — the same
# two-phase-commit shape every production table format uses.


class _LedgerCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int) -> None:
        self.filename = filename
        self.n_rows = n_rows


class LedgerWriter(DataSourceWriter):
    """Executor-side JSON-lines task writer. Each task writes ONE
    uniquely-named file and reports it in its commit message; nothing
    becomes visible until the driver-side ``commit`` writes the
    manifest. ``abort`` removes whatever half-written files the failed
    tasks reported — no torn output either way."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("sa_ledger writer requires a 'path' option")
        self.path = path

    def write(self, iterator):
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        fname = f"part-{uuid.uuid4().hex}.json"
        n = 0
        with open(os.path.join(self.path, fname), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _LedgerCommit(fname, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(m.filename for m in messages),
            "rows": sum(m.n_rows for m in messages),
        }
        tmp = os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST"))  # atomic publish

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(os.path.join(self.path, m.filename))
            except FileNotFoundError:
                pass


class LedgerStreamWriter(DataSourceStreamWriter):
    """Streaming half of the sink: the SAME two-phase protocol as the
    batch writer, applied per MICRO-BATCH. Executor tasks write
    uniquely-named files; the driver-side ``commit(messages, batchId)``
    atomically publishes ``_MANIFEST-<batchId>`` naming exactly that
    batch's successful task files. A REPLAYED batch id (restart after
    a crash between sink write and checkpoint commit — the reference's
    at-least-once hazard) atomically REPLACES its own manifest, and the
    orphaned first-attempt files are never referenced by any manifest,
    so manifest-honoring readers count each batch exactly once — the
    same batch-id idempotence contract as the Redis KV sink
    (streaming/sinks.py)."""

    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("sa_ledger stream writer requires a 'path' option")
        self.path = path

    # executor-side task write is identical to the batch writer's
    write = LedgerWriter.write

    def commit(self, messages, batchId: int) -> None:
        import json
        import os

        manifest = {
            "files": sorted(m.filename for m in messages if m is not None),
            "rows": sum(m.n_rows for m in messages if m is not None),
            "batch_id": batchId,
        }
        tmp = os.path.join(self.path, f"_MANIFEST-{batchId}.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, f"_MANIFEST-{batchId}"))

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.filename))
            except FileNotFoundError:
                pass


def read_ledger_stream_output(spark, path: str, schema: str):
    """Manifest-honoring read of a committed STREAMING write: the
    visible table is the union of every ``_MANIFEST-<batchId>``'s file
    list — one manifest per committed micro-batch, latest replay wins
    per batch id, stray uncommitted task files invisible."""
    import json
    import os

    files = []
    for entry in sorted(os.listdir(path)):
        if entry.startswith("_MANIFEST-") and not entry.endswith(".tmp"):
            with open(os.path.join(path, entry)) as f:
                files.extend(
                    os.path.join(path, fn) for fn in json.load(f)["files"]
                )
    return spark.read.schema(schema).json(files)


def read_ledger_output(spark, path: str, schema: str):
    """Manifest-honoring read of a committed sa_ledger write: ONLY the
    files the commit published are visible — stray files from aborted
    or still-running tasks are invisible, which is the entire point of
    the two-phase protocol."""
    import json
    import os

    with open(os.path.join(path, "_MANIFEST")) as f:
        manifest = json.load(f)
    files = [os.path.join(path, fn) for fn in manifest["files"]]
    return spark.read.schema(schema).json(files)
