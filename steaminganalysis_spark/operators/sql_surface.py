"""SQL-surface operators beyond the DataFrame basics: scalar and IN
subqueries (correlated + uncorrelated), CTEs, null-handling pack,
arg-min/max aggregates, explode/posexplode, struct construction, and
string-distance functions.

Catalyst rewrites every subquery below into a join (correlated EXISTS →
left-semi, scalar subquery → broadcast of the 1-row aggregate), so the
SQL-shaped API carries no scale penalty over the DataFrame spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import SQL_DSUM, query
from steaminganalysis_spark.sources import load


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — planned as a 1-row broadcast, the
    whole table is scanned twice but shuffled never. The threshold
    comparison (not the output) uses the float average, so exactness
    only requires both engines to agree on > — the margin at 1.5× mean
    is far beyond any ulp."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        """
    )


@query(
    "q_subquery_in_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 200000)
    """,
)
def subquery_in_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + correlated EXISTS — both rewritten to left-semi joins."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
          AND EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        """
    )


@query(
    "q_cte",
    oracle=f"""
    WITH nat_rev AS (
      SELECT c_nationkey AS nk, {SQL_DSUM("o_totalprice")} AS rev, COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1
    )
    SELECT n_name, rev, n_orders
    FROM nat_rev JOIN nation ON nk = n_nationkey
    WHERE rev > 0
    """,
)
def cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE + join-on-aggregate: the aggregate output is dim-sized, so
    the second join broadcasts it."""
    _views(spark, sf_dir, "orders", "customer", "nation")
    return spark.sql(
        f"""
        WITH nat_rev AS (
          SELECT c_nationkey AS nk, {SQL_DSUM("o_totalprice")} AS rev, COUNT(*) AS n_orders
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1
        )
        SELECT n_name, rev, n_orders
        FROM nat_rev JOIN nation ON nk = n_nationkey
        WHERE rev > 0
        """
    )


@query(
    "q_fn_null",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_or_default,
           CASE WHEN NULLIF(o_orderpriority, '5-LOW') IS NULL THEN 1 ELSE 0 END AS was_low,
           IFNULL(NULLIF(o_orderpriority, '5-LOW'), 'defaulted') AS pri2,
           CASE WHEN o_totalprice IS NOT NULL THEN 'y' ELSE 'n' END AS has_price
    FROM orders
    """,
)
def fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling pack: coalesce / nullif / ifnull / IS NOT NULL
    (the fixtures are null-free, so nulls are manufactured with
    nullif)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_or_default"
        ),
        F.when(F.nullif("o_orderpriority", F.lit("5-LOW")).isNull(), 1)
        .otherwise(0)
        .alias("was_low"),
        F.ifnull(F.nullif("o_orderpriority", F.lit("5-LOW")), F.lit("defaulted")).alias(
            "pri2"
        ),
        F.when(F.col("o_totalprice").isNotNull(), "y").otherwise("n").alias("has_price"),
    )


@query(
    "q_agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           min_by(o_orderkey, o_totalprice) AS cheapest_order,
           max_by(o_orderkey, o_totalprice) AS priciest_order,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-min/arg-max aggregates (min_by/max_by). o_totalprice values
    are unique per customer in the fixture, so the argmin is
    deterministic; a production query would tie-break via a struct
    ordering."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "q_fn_explode",
    oracle="""
    SELECT doc_id, CAST(pos AS INT) AS pos, tok
    FROM (
      SELECT doc_id,
             generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
             unnest(string_split(text, ' ')) AS tok
      FROM documents
      WHERE doc_id < 20
    )
    WHERE tok LIKE 's%'
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (position-preserving lateral expansion) + post-filter."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok"))
        .filter(F.col("tok").like("s%"))
    )


@query(
    "q_fn_struct",
    oracle="""
    SELECT o_orderkey,
           CONCAT('{"k":', CAST(o_custkey AS VARCHAR), ',"p":',
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '}') AS as_json,
           CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus AS packed
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + field access + to_json round-trip (nested
    column handling: the struct never materializes row-wise, Catalyst
    flattens the access)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    s = F.struct(
        F.col("o_custkey").alias("k"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    return o.select(
        "o_orderkey",
        F.to_json(s).alias("as_json"),
        F.concat(
            F.col("o_custkey").cast("string"), F.lit("|"), F.col("o_orderstatus")
        ).alias("packed"),
    )


@query(
    "q_text_levenshtein",
    oracle="""
    SELECT s.s_name AS name_a, c.c_name AS name_b,
           CAST(levenshtein(s.s_name, c.c_name) AS INT) AS dist
    FROM supplier s JOIN customer c ON c.c_custkey <= 20
    WHERE s.s_suppkey <= 10
    """,
)
def text_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit distance (fuzzy matching primitive for entity dedup)."""
    s = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 10)
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 20)
    return s.crossJoin(c).select(
        F.col("s_name").alias("name_a"),
        F.col("c_name").alias("name_b"),
        F.levenshtein("s_name", "c_name").alias("dist"),
    )


@query(
    "q_subquery_not_exists",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def subquery_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated NOT EXISTS (customers with zero orders) via spark.sql
    — Catalyst rewrites it to a left-anti join (no per-row subquery
    execution)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("_sq_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("_sq_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM _sq_customer c
        WHERE NOT EXISTS (SELECT 1 FROM _sq_orders o
                          WHERE o.o_custkey = c.c_custkey)
        """
    )


@query(
    "q_sql_group_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    GROUP BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (Spark 3.4+/DuckDB): every non-aggregate select
    item becomes a grouping key — removes the classic
    silently-wrong-when-an-edit-forgets-the-GROUP-BY failure mode.
    Same plan as the explicit form: partial+final hash aggregate, one
    exchange."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_gba_orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(floor(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS cents
        FROM _gba_orders
        GROUP BY ALL
        """
    )


@query(
    "q_pandas_api",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pandas_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-API-on-Spark (`pyspark.pandas`) surface: the pandas
    idiom (assign → groupby → agg) compiled onto the same distributed
    engine, converted back to a DataFrame at the boundary. The whole
    chain stays lazy/distributed — `to_spark()` hands Catalyst the
    logical plan, nothing is collected. Exact-cents arithmetic keeps
    the oracle hash-identical. Demonstrates that a pandas-fluent user
    of this engine gets the same plans (and the same answers) as the
    DataFrame API."""
    import warnings

    import pyspark.pandas as ps
    from pyspark.pandas.utils import PandasAPIOnSparkAdviceWarning

    ps.set_option("compute.default_index_type", "distributed")
    psdf = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .pandas_api()
    )
    psdf = psdf.assign(
        cents=((psdf.o_totalprice * 100.0 + 0.5) // 1).astype("int64")
    )
    out = (
        psdf.groupby("o_orderpriority", as_index=False)
        .agg(n=("cents", "count"), cents=("cents", "sum"))
    )
    with warnings.catch_warnings():
        # dropping the synthetic distributed index at the boundary is
        # the point — silence the (correct, here irrelevant) advice
        warnings.simplefilter("ignore", PandasAPIOnSparkAdviceWarning)
        sdf = out.to_spark()
    return sdf.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n"),
        F.col("cents").cast("bigint").alias("cents"),
    )


@query(
    "q_sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_large
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAMETERIZED SQL (Spark 3.4+ named-parameter API): the query
    text carries ``:year_start``/``:threshold`` placeholders and the
    values arrive through ``spark.sql(..., args=...)`` — never string
    interpolation. This is the injection-safe surface an application
    layer builds on, and parameter markers bind as LITERALS in the
    plan, so Catalyst still constant-folds them and pushes the date
    bounds to the parquet scan exactly as with inline constants. The
    session-variable spelling (DECLARE/SET VAR) compiles to the same
    plan; the args form is the one that works from any client."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN o_totalprice > :threshold THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_large
        FROM orders
        WHERE o_orderdate >= CAST(:year_start AS TIMESTAMP)
          AND o_orderdate < CAST(:year_end AS TIMESTAMP)
        GROUP BY o_orderpriority
        """,
        args={
            "threshold": 150000.0,
            "year_start": "1995-01-01",
            "year_end": "1996-01-01",
        },
    )


@query(
    "q_sql_modern",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             // COUNT(*) AS avg_cents,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus)
             AS statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql_modern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two modern SQL-text conveniences in one aggregate, both
    resolving to plans identical to their verbose spellings:
    LISTAGG … WITHIN GROUP (Spark 4 / SQL:2023 ordered string
    aggregation — deterministic because the order clause is part of
    the aggregate, unlike a bare collect_list) and LATERAL COLUMN
    ALIASES (Spark 3.4+: ``SUM(...) AS cents, cents DIV n``) — the
    named-intermediate style that kills copy-pasted aggregate
    expressions. The oracle is DuckDB's ordered ``string_agg`` plus
    the expanded arithmetic, so both sugars are verified to mean
    exactly what the expanded SQL means."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents,
               cents DIV n AS avg_cents,
               listagg(DISTINCT o_orderstatus, '|')
                 WITHIN GROUP (ORDER BY o_orderstatus) AS statuses
        FROM orders
        GROUP BY o_orderpriority
        """
    )


@query(
    "q_sql_quantified",
    oracle="""
    WITH brand_avg AS (
      SELECT p_brand, AVG(p_retailprice) AS av FROM part GROUP BY 1
    )
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > ALL (SELECT av FROM brand_avg)
       OR p_size = ANY (SELECT MIN(p_size) FROM part GROUP BY p_type)
    ORDER BY p_partkey
    """,
)
def sql_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified-comparison subquery SEMANTICS — ``> ALL (...)`` and
    ``= ANY (...)``: parts priced above EVERY brand's average, or
    whose size is some type's minimum. Spark's grammar has no
    ALL/ANY quantifiers (probed: PARSE_SYNTAX_ERROR), so this operator
    IS the standard decorrelation a Spark user must hand-write —
    ``> ALL`` becomes a compare against the broadcast scalar MAX (the
    subquery is non-empty and null-free here, the case where that
    rewrite is exact), ``= ANY`` becomes a LEFT SEMI join on the value
    set. The oracle keeps the SQL-standard quantified spelling, so
    the key certifies the rewrite's equivalence, engine-vs-engine."""
    p = load(spark, sf_dir, "part")
    all_thresh = (
        p.groupBy("p_brand")
        .agg(F.avg("p_retailprice").alias("av"))
        .agg(F.max("av").alias("mx"))
    )
    any_sizes = (
        p.groupBy("p_type").agg(F.min("p_size").alias("p_size")).select("p_size").distinct()
    )
    above_all = p.crossJoin(F.broadcast(all_thresh)).filter(
        F.col("p_retailprice") > F.col("mx")
    )
    is_any = p.join(F.broadcast(any_sizes), "p_size", "left_semi")
    return (
        above_all.select("p_partkey", "p_name", "p_retailprice")
        .unionByName(is_any.select("p_partkey", "p_name", "p_retailprice"))
        .distinct()
        .orderBy("p_partkey")
    )


@query(
    "q_sql_pivot",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT)
             AS urgent,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT)
             AS high,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT)
             AS medium,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
                AS BIGINT) AS notspec,
           CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT)
             AS low
    FROM orders GROUP BY 1
    """,
)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``PIVOT`` clause (the DataFrame ``q_pivot``'s grammar
    twin): order counts cross-tabbed status × priority with an explicit
    IN-list — explicit because an inferred column list would need an
    extra distinct pass over the data AND make the output schema
    data-dependent, which breaks at 100 TB on both counts. Catalyst
    rewrites the clause into exactly the conditional-aggregation plan
    the oracle spells out (one shuffle, map-side partials); absent
    cells surface as NULL from PIVOT and are coalesced to 0 to match
    COUNT FILTER semantics."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_pv_orders")
    piv = spark.sql(
        """
        SELECT * FROM (
          SELECT o_orderstatus AS status, o_orderpriority AS prio
          FROM _pv_orders
        )
        PIVOT (COUNT(*) FOR prio IN (
          '1-URGENT' AS urgent, '2-HIGH' AS high, '3-MEDIUM' AS medium,
          '4-NOT SPECIFIED' AS notspec, '5-LOW' AS low))
        """
    )
    return piv.select(
        "status",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("urgent", "high", "medium", "notspec", "low")
        ],
    )


@query(
    "q_sql_dynamic",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5)
                AS BIGINT)) AS BIGINT) AS price_cents
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY 1
    """,
)
def sql_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's dynamic-SQL surface in one operator: a DECLAREd
    session variable, ``SET VAR``, and ``EXECUTE IMMEDIATE`` over a
    template whose table name binds through ``IDENTIFIER(:t)`` and
    whose predicate binds through a named parameter — the
    injection-safe way to parameterize BOTH identifiers and values
    (string-concatenated SQL is the anti-pattern this exists to kill;
    templates also keep one plan-cache entry per shape). The executed
    text is the plain aggregate the oracle spells statically, so the
    certificate is that the binding machinery is semantically
    transparent."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_dyn_orders")
    spark.sql("DECLARE OR REPLACE VARIABLE v_status STRING")
    spark.sql("SET VAR v_status = 'F'")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  COUNT(*) AS n_orders,
                  CAST(SUM(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100.0D + 0.5D)
                       AS BIGINT)) AS BIGINT) AS price_cents
           FROM IDENTIFIER(:t)
           WHERE o_orderstatus = :s
           GROUP BY 1'
        USING '_dyn_orders' AS t, v_status AS s
        """
    )


@query(
    "q_sql_unpivot",
    oracle="""
    WITH base AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5)
                  AS BIGINT)) AS BIGINT) AS price_cents,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, 'qty' AS metric, qty AS val FROM base
    UNION ALL
    SELECT l_returnflag, 'price_cents', price_cents FROM base
    UNION ALL
    SELECT l_returnflag, 'n_items', n_items FROM base
    """,
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``UNPIVOT`` clause (grammar twin of the DataFrame
    ``q_unpivot``): a wide per-returnflag metric row melted to
    (flag, metric, value) tuples — the wide→long step feeding metric
    stores and chart layers. Catalyst expands the clause to the
    three-way UNION ALL the oracle spells; the aggregate underneath is
    one partial+final shuffle and the melt itself is a zero-shuffle
    Expand node (each input row emits its |metrics| outputs map-side)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("_up_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, metric, val FROM (
          SELECT l_returnflag,
                 SUM(CAST(l_quantity AS BIGINT)) AS qty,
                 CAST(SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100.0D
                      + 0.5D) AS BIGINT)) AS BIGINT) AS price_cents,
                 COUNT(*) AS n_items
          FROM _up_lineitem GROUP BY 1
        )
        UNPIVOT (val FOR metric IN (qty, price_cents, n_items))
        """
    )


@query(
    "q_sql_lateral_view",
    oracle="""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents, unnest(string_split(text, ' ')) AS t(word)
    GROUP BY 1
    ORDER BY n DESC, word
    LIMIT 20
    """,
)
def sql_lateral_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HiveQL ``LATERAL VIEW explode()`` grammar — the third
    spelling of row explosion next to the DataFrame generator
    (``q_fn_explode``) and the comma-join ``unnest`` the oracle uses:
    corpus-wide top-20 word counts with deterministic (count, word)
    ordering. Same plan as every spelling — Generate over the scan,
    then one count shuffle with map-side partials and a
    TakeOrderedAndProject instead of a global sort; the grammar is
    what's certified, the plan is shared."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("_lv_documents")
    return spark.sql(
        """
        SELECT word, COUNT(*) AS n
        FROM _lv_documents LATERAL VIEW explode(split(text, ' ')) t AS word
        GROUP BY word
        ORDER BY n DESC, word
        LIMIT 20
        """
    )


@query(
    "q_sql_window_clause",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                AS BIGINT) AS running_cents,
           LAG(event_type) OVER w AS prev_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def sql_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named-WINDOW grammar surface: one WINDOW clause shared by
    ROW_NUMBER, a running SUM, and LAG — the spelling analysts reach
    for when several window functions share a partitioning. The order
    key (ts, event_id) is unique per partition, so the default RANGE
    frame coincides with ROWS and the running sum is deterministic;
    money accumulates as exact cents (floor(x·100+0.5)), never raw
    doubles.

    Plan note: because all three functions name the SAME window, the
    optimizer computes them in one Window operator over one user_id
    exchange + sort — the clause is not just sugar, it prevents the
    accidental triple-shuffle of three inline OVER specs with
    divergent orderings."""
    _views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id, user_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
               CAST(SUM(CAST(floor(value * 100 + 0.5D) AS BIGINT)) OVER w
                    AS BIGINT) AS running_cents,
               LAG(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """
    )
