"""UDF / UDAF / UDTF surface (SURVEY.md §2 B.10).

Each flavor computes something ANSI-SQL-expressible so the DuckDB
oracle still hash-checks it. Ranked by scale-worthiness:

1. pandas UDF / grouped-map (Arrow-batched, vectorized) — the only
   acceptable Python path at 100 TB;
2. row-at-a-time Python UDF — implemented to cover the API surface,
   deliberately on a small projection (it serializes per row; kept out
   of bench headline queries).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from steaminganalysis_spark.registry import query
from steaminganalysis_spark.sources import load


@F.udf(T.DoubleType())
def _fee_with_tax(value: float) -> float:
    # +10% tax in exact integer cents → thousandths, half-up back to
    # cents. Integer arithmetic end-to-end: Python's round() is
    # half-to-EVEN while SQL rounds half-up, so a float round here
    # would diverge from any SQL oracle on .xx5 boundaries.
    thousandths = int(value * 100 + 0.5) * 11
    return ((thousandths + 5) // 10) / 100.0


@query(
    "q_udf_scalar",
    oracle="""
    SELECT event_id,
           CAST((CAST(round(value * 100) AS BIGINT) * 11 + 5) // 10 AS DOUBLE) / 100.0
             AS fee_taxed
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (API-surface coverage; see module note)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.select("event_id", _fee_with_tax(F.col("value")).alias("fee_taxed"))


@F.pandas_udf(T.DoubleType())
def _scaled(v: pd.Series) -> pd.Series:
    # vectorized: v * 2 + 1 (exact in IEEE double: *2 is exponent bump)
    return v * 2.0 + 1.0


@query(
    "q_udf_pandas",
    oracle="""
    SELECT event_id, value * 2.0 + 1.0 AS scaled
    FROM events
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF — whole Arrow batches cross
    the JVM↔Python boundary, ~10-100× the row UDF's throughput."""
    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", _scaled(F.col("value")).alias("scaled"))


@F.pandas_udf(T.DoubleType())
def _mean_value(v: pd.Series) -> float:
    # grouped-agg pandas UDF (UDAF): exact 2-decimal mean via integer cents
    import numpy as np

    cents = np.rint(v.to_numpy() * 100.0).astype("int64")
    # mirror the oracle's association exactly: (decimal-sum → double) / n
    return (float(cents.sum()) / 100.0) / len(cents)


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) / COUNT(*) AS mean_value
    FROM events
    GROUP BY event_type
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (a UDAF): mean computed over exact
    integer cents so it hash-matches the decimal oracle regardless of
    summation order."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(_mean_value(F.col("value")).alias("mean_value"))


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    # per-group z-score against population stddev, exact-cents mean
    import numpy as np

    v = pdf["value"].to_numpy()
    cents = np.rint(v * 100.0).astype("int64")
    mean = cents.sum() / (100.0 * len(cents))
    var = float(np.square(v - mean).sum()) / len(v)
    sd = var**0.5
    z = (v - mean) / sd if sd > 0 else np.zeros_like(v)
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "z": np.round(z, 4)}
    )


@query("q_udtf_applyinpandas")  # rows-only: float var/std summation order differs vs oracle
def udtf_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (per-group table function): z-score
    normalization per event_type — the canonical per-group pandas
    transform. Shuffles once on the group key; each group is one Arrow
    batch in Python. Checked rows-only (variance summation order makes
    the last ulp engine-dependent); tests assert z-stats invariants."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        _zscore_group, schema="event_id long, event_type string, z double"
    )


@query(
    "q_udf_sql_registered",
    oracle="""
    SELECT p_partkey,
           CAST((CAST(round(p_retailprice * 100) AS BIGINT) * 93 + 50) // 100 AS DOUBLE)
             / 100.0 AS sale_price
    FROM part
    WHERE p_size > 25
    """,
)
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF registered into the SQL catalog and invoked from spark.sql —
    the `spark.udf.register` path. 7% discount in exact integer cents
    (see _fee_with_tax for why not float round)."""
    load(spark, sf_dir, "part").createOrReplaceTempView("_udf_part")
    spark.udf.register(
        "sale_price",
        lambda p: ((int(p * 100 + 0.5) * 93 + 50) // 100) / 100.0,
        T.DoubleType(),
    )
    return spark.sql(
        """
        SELECT p_partkey, sale_price(p_retailprice) AS sale_price
        FROM _udf_part WHERE p_size > 25
        """
    )


_title_arrow = F.udf(
    lambda s: s.strip().upper() if s is not None else None,
    T.StringType(),
    useArrow=True,
)


@query(
    "q_udf_arrow",
    oracle="""
    SELECT p_partkey, upper(trim(p_name)) AS name_uc
    FROM part
    """,
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-OPTIMIZED Python UDF (Spark 4 ``useArrow=True``): the same
    per-row lambda API as a classic Python UDF, but batched over Arrow
    instead of pickled row-by-row — the migration path for legacy UDF
    code that can't be vectorized yet."""
    p = load(spark, sf_dir, "part")
    return p.select("p_partkey", _title_arrow(F.col("p_name")).alias("name_uc"))


@query(
    "q_udtf_python",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents WHERE doc_id < 50)
    SELECT doc_id, i - 1 AS pos, t[i] AS tok, len(t[i]) AS tok_len
    FROM toks, unnest(generate_series(1, len(t))) AS r(i)
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF (Spark 4 `@udtf` class, one-to-many row
    expansion via LATERAL join) — the remaining B.10 surface beyond
    applyInPandas: a tokenizer emitting (pos, tok, tok_len) per input
    row. Deliberately on a 50-doc projection: per-row Python UDTFs are
    the slow path (`operators/udfs.py` module docstring); the JVM-side
    equivalent is q_fn_posexplode."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, tok string, tok_len int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield i, t, len(t)

    spark.udtf.register("sa_tokenize", Tokenize)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT doc_id, t.pos, t.tok, t.tok_len
        FROM docs_udtf, LATERAL sa_tokenize(text) AS t
        """
    )


@query(
    "q_udf_mapinarrow",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 200.0 + 0.5) AS BIGINT))
                AS BIGINT) AS dbl_cents
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def udf_mapinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow`: the lowest-level Arrow surface — the UDF receives
    raw `pyarrow.RecordBatch`es (no pandas conversion at all) and uses
    pyarrow compute kernels. Completes the map-side Python trio
    (mapInPandas in multimodal, applyInPandas in B.10): doubling
    quantities to integer cents batch-at-a-time, then a JVM aggregate
    on top. Arrow compute multiplies columnar buffers — the cheapest
    possible Python detour when pandas semantics aren't needed."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def double_cents(batches):
        for batch in batches:
            q = pc.cast(batch.column("l_quantity"), pa.float64())
            cents = pc.cast(
                pc.floor(pc.add(pc.multiply(q, pa.scalar(200.0)), pa.scalar(0.5))),
                pa.int64(),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_linestatus"), cents],
                names=["l_linestatus", "cents"],
            )

    li = load(spark, sf_dir, "lineitem").select("l_linestatus", "l_quantity")
    mapped = li.mapInArrow(double_cents, schema="l_linestatus string, cents long")
    return mapped.groupBy("l_linestatus").agg(
        F.count("*").alias("n"), F.sum("cents").alias("dbl_cents")
    )


@query(
    "q_udf_applyinarrow",
    oracle="""
    SELECT l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS qty_cents,
           CAST(MAX(CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS max_cents
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def udf_applyinarrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`applyInArrow` (Spark 4): grouped-map over raw `pyarrow.Table`s
    — the grouped twin of `mapInArrow`, completing the Arrow surface
    matrix (scalar `@pandas_udf` / map `mapInArrow` / grouped
    `applyInPandas`+`applyInArrow`). Each group arrives as ONE Arrow
    table; the whole-group reduction runs in pyarrow compute with no
    pandas materialization. Group count is tiny (per line status) so
    the per-group-Python cost is bounded; the exact-cents arithmetic
    matches the oracle integer-for-integer."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_group(table: pa.Table) -> pa.Table:
        q = pc.cast(table.column("l_quantity"), pa.float64())
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(q, pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        return pa.table(
            {
                "l_linestatus": [table.column("l_linestatus")[0].as_py()],
                "n": [table.num_rows],
                "qty_cents": [pc.sum(cents).as_py()],
                "max_cents": [pc.max(cents).as_py()],
            }
        )

    li = load(spark, sf_dir, "lineitem").select("l_linestatus", "l_quantity")
    return li.groupBy("l_linestatus").applyInArrow(
        per_group, schema="l_linestatus string, n long, qty_cents long, max_cents long"
    )


@query(
    "q_udtf_analyze",
    oracle="""
    SELECT doc_id, t[1] AS tok0, t[2] AS tok1, t[3] AS tok2
    FROM (SELECT doc_id, string_split(text, ' ') AS t
          FROM documents WHERE doc_id < 50)
    """,
)
def udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze()``): the output
    schema is not declared statically — the planner calls the UDTF's
    static ``analyze`` with the call-site arguments and the function
    computes its own schema from the literal k (here: k=3 → columns
    tok0..tok2). This is the extension point for connector-style
    functions whose shape depends on their arguments (parse_csv with a
    header literal, pivot-like expanders). Same deliberate 50-doc
    projection as ``q_udtf_python``: per-row Python is the slow path;
    what's being verified is the planner-to-Python schema negotiation,
    oracle-checked against plain list indexing."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FirstK:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            n = int(k.value)  # literal argument drives the schema
            st = StructType()
            for i in range(n):
                st.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, text: str, k: int):
            toks = text.split(" ")[:k]
            yield tuple(toks + [None] * (k - len(toks)))

    spark.udtf.register("sa_first_k", FirstK)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).select(
        "doc_id", "text"
    ).createOrReplaceTempView("docs_udtf_analyze")
    return spark.sql(
        """
        SELECT doc_id, t.tok0, t.tok1, t.tok2
        FROM docs_udtf_analyze, LATERAL sa_first_k(text, 3) AS t
        """
    )


@query(
    "q_udf_sql_body",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) AS disc_cents,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deep
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def udf_sql_body(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-BODY user functions (Spark 4 ``CREATE FUNCTION … RETURN
    expr``) — the UDF tier every pipeline should reach for FIRST: the
    body is an expression the planner INLINES at resolution time, so
    calls cost nothing (whole-stage codegen, constant folding,
    pushdown all see through them — no Python worker, no Arrow hop,
    no serialization; the probe plan shows the call folded to a
    literal). Business logic (discounted price in exact cents, a
    deep-discount predicate) is named once and reused across queries,
    with the same plan the hand-inlined expression produces — the
    oracle IS the hand-inlined SQL, so the equivalence is
    hash-verified."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sa_disc_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(FLOOR(p * (1.0 - d) * 100.0 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION sa_is_deep(d DOUBLE) "
        "RETURNS INT RETURN CASE WHEN d > 0.05 THEN 1 ELSE 0 END"
    )
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_sqludf")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(sa_disc_cents(l_extendedprice, l_discount)) AS disc_cents,
               CAST(SUM(sa_is_deep(l_discount)) AS BIGINT) AS n_deep
        FROM li_sqludf
        GROUP BY l_returnflag
        """
    )
