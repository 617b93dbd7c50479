"""Scalar function packs (SURVEY.md §2 B.7): string, datetime, math,
array (higher-order), JSON. Each pack is one wide query exercising many
built-ins — all JVM-side, whole-stage-codegen'd expressions; no Python
in any of these paths.

The JSON pack is the engine's analog of the reference's fastjson parse
(StreamingAnalysisAppWithKafkaManageOffset.scala:52: ``JSON.parseObject(line.value())``) — here a typed
``from_json`` against a declared schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import SQL_DSUM, dsum, query
from steaminganalysis_spark.schemas import PROPS_SCHEMA
from steaminganalysis_spark.sources import load


@query(
    "q_fn_string",
    oracle="""
    SELECT p_partkey,
           substring(p_name, 1, 8) AS name8,
           upper(p_brand) AS brand_uc,
           lower(p_type) AS type_lc,
           CAST(length(p_name) AS INT) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           trim('  ' || p_brand || ' ') AS trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
           replace(p_name, ' ', '_') AS name_us,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           CASE WHEN starts_with(p_type, 'a') THEN 1 ELSE 0 END AS starts_a
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack — includes the reference's substring date-part idiom
    (StreamingAnalysisAppWithKafkaManageOffset.scala:58-60 uses substring(0,10)/(11,13)/(14,16))."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.substring("p_name", 1, 8).alias("name8"),
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.when(F.startswith(F.col("p_type"), F.lit("a")), 1).otherwise(0).alias("starts_a"),
    )


@query(
    "q_fn_datetime",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS od,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(dayofweek(o_orderdate) AS INT) AS dow,
           CAST(quarter(o_orderdate) AS INT) AS q,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS INT) AS days_to_2002,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS od_plus30,
           CAST(strftime(o_orderdate, '%Y') AS INT) AS y_str
    FROM orders
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime pack — the idiomatic replacement for the reference's
    substring calendar bucketing (StreamingAnalysisAppWithKafkaManageOffset.scala:58-60). Calendar values
    emitted as strings/ints, never raw timestamps (determinism)."""
    o = load(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_format(od, "yyyy-MM-dd").alias("od"),
        F.year(od).alias("y"),
        F.month(od).alias("m"),
        F.dayofmonth(od).alias("d"),
        # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6 → align.
        (F.dayofweek(od) - 1).alias("dow"),
        F.quarter(od).alias("q"),
        F.date_format(F.date_trunc("month", od), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("timestamp"), od).alias("days_to_2002"),
        F.date_format(od + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("od_plus30"),
        F.date_format(od, "yyyy").cast("int").alias("y_str"),
    )


@query(
    "q_fn_math",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 1) AS price_r1,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
           abs(o_totalprice - 200000.0) AS dist_200k,
           round(sqrt(o_totalprice), 6) AS price_sqrt,
           round(ln(o_totalprice + 1), 6) AS price_ln,
           round(pow(o_totalprice / 100000.0, 2), 6) AS price_pow,
           CAST(o_orderkey % 7 AS BIGINT) AS mod7,
           CAST(((o_orderkey % 7) + 7) % 7 AS BIGINT) AS pmod7,
           greatest(o_totalprice, 150000.0) AS hi,
           least(o_totalprice, 150000.0) AS lo,
           CAST(sign(o_totalprice - 150000.0) AS DOUBLE) AS sgn
    FROM orders
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack. Transcendentals (sqrt/ln/pow) rounded to 6 decimals —
    libm vs JDK StrictMath can differ in the final ulp."""
    o = load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(tp, 1).alias("price_r1"),
        F.floor(tp).alias("price_floor"),
        F.ceil(tp).alias("price_ceil"),
        F.abs(tp - 200000.0).alias("dist_200k"),
        F.round(F.sqrt(tp), 6).alias("price_sqrt"),
        F.round(F.log(tp + 1), 6).alias("price_ln"),
        F.round(F.pow(tp / 100000.0, 2), 6).alias("price_pow"),
        (F.col("o_orderkey") % 7).alias("mod7"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).cast("long").alias("pmod7"),
        F.greatest(tp, F.lit(150000.0)).alias("hi"),
        F.least(tp, F.lit(150000.0)).alias("lo"),
        F.signum(tp - 150000.0).alias("sgn"),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS INT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_sum,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           round(CAST(list_sort(embedding)[len(embedding)] AS DOUBLE), 6) AS max_elem
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order pack over the embeddings table: transform,
    filter, aggregate (fold), sort — all JVM-side lambda expressions,
    the building blocks of the similarity kernels in llm.py."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    as_double = F.transform(emb, lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        F.size(emb).alias("dim"),
        F.round(emb[0].cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("vec_sum"),
        F.round(
            F.aggregate(
                F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sq_norm"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max(emb).cast("double"), 6).alias("max_elem"),
    )


@query(
    "q_json_parse",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10
    FROM events
    """,
)
def json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing of the events.props blob — the reference's
    fastjson ``JSON.parseObject`` (StreamingAnalysisAppWithKafkaManageOffset.scala:52) done Spark-style:
    ``from_json`` with a declared schema (Catalyst prunes unreferenced
    json fields from the parse)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id", F.from_json(F.col("props"), PROPS_SCHEMA).alias("j")
    )
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k"),
        (F.col("j.k") % 10).alias("k_mod10"),
    )


@query(
    "q_fn_bitwise",
    oracle="""
    SELECT l_orderkey, l_partkey,
           xor(l_orderkey, l_partkey) AS k_xor,
           l_orderkey & l_partkey AS k_and,
           l_orderkey | l_partkey AS k_or,
           CAST(l_linenumber AS BIGINT) << 3 AS ln_shl,
           l_orderkey >> 2 AS k_shr,
           CAST(bit_count(l_orderkey) AS INT) AS k_bits
    FROM lineitem
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise pack: xor/and/or, shifts, popcount — the primitives the
    engine's own hash/LSH operators (SimHash signatures, LSH buckets)
    are built from, exposed as a verified scalar surface."""
    li = load(spark, sf_dir, "lineitem")
    k, p = F.col("l_orderkey"), F.col("l_partkey")
    return li.select(
        "l_orderkey",
        "l_partkey",
        k.bitwiseXOR(p).alias("k_xor"),
        k.bitwiseAND(p).alias("k_and"),
        k.bitwiseOR(p).alias("k_or"),
        F.shiftleft(F.col("l_linenumber").cast("long"), 3).alias("ln_shl"),
        F.shiftright(k, 2).alias("k_shr"),
        F.bit_count(k).alias("k_bits"),
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(json_keys(props), ',') AS keys_s,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS missing_val
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions over JSON-as-map: parse props into map<string,long>
    then map_keys / size / element_at (null on absent key) — the dynamic
    counterpart of the typed-struct parse in q_json_parse."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.size(F.map_keys(m)).alias("n_keys"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_s"),
        F.element_at(m, "k").alias("k_val"),
        F.element_at(m, "missing").alias("missing_val"),
    )


@query(
    "q_json_malformed",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CASE WHEN event_id % 10 = 0
                  THEN substr(props, 1, len(props) - 1)
                  ELSE props END AS j
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CASE WHEN json_valid(j) THEN 1 END) AS n_ok,
           CAST(SUM(CASE WHEN json_valid(j)
                    THEN CAST(json_extract_string(j, '$.k') AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS k_sum
    FROM c
    GROUP BY event_type
    """,
)
def json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-input robustness: every 10th props blob is truncated
    (broken JSON); the parse must yield NULL for those rows — never
    fail the job — and aggregates must count/skip them exactly. This is
    the PERMISSIVE-parse behavior a 100 TB ingest needs: one corrupt
    record must not kill a 10-hour job."""
    ev = load(spark, sf_dir, "events")
    corrupted = F.when(
        F.col("event_id") % 10 == 0,
        F.expr("substr(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    parsed = ev.select(
        "event_type",
        F.from_json(corrupted, PROPS_SCHEMA).alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count("p.k").alias("n_ok"),
        F.sum(F.coalesce(F.col("p.k"), F.lit(0))).alias("k_sum"),
    )


@query(
    "q_fn_array2",
    oracle="""
    WITH b AS (
      SELECT n_nationkey AS k, range(1, 2 + n_nationkey % 3) AS seq
      FROM nation
    )
    SELECT k,
           array_to_string(seq, ',') AS seq_s,
           array_to_string(list_transform(seq, i -> i * (k + 1)), ',') AS scaled_s,
           array_to_string(
             list_transform(range(1, 2 + k % 3),
                            i -> i * 10 + seq[len(seq) - i + 1]), ',') AS zw_s,
           CAST(COALESCE(list_position(seq, 2), 0) AS INT) AS pos2,
           array_to_string(list_sort(list_distinct(list_concat(seq, [2, 5]))), ',')
             AS union_s,
           array_to_string(flatten([seq, [9]]), ',') AS flat_s
    FROM b
    """,
)
def fn_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order pack #2: sequence, transform, zip_with (with
    reverse), array_position, array_union, flatten — all JVM
    expressions; array outputs serialized sorted/joined per the
    determinism conventions."""
    n = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    seq = F.sequence(F.lit(1), 1 + k % 3)
    return n.select(
        k.alias("k"),
        F.concat_ws(",", seq).alias("seq_s"),
        F.concat_ws(",", F.transform(seq, lambda i: i * (k + 1))).alias("scaled_s"),
        F.concat_ws(
            ",", F.zip_with(seq, F.reverse(seq), lambda x, y: x * 10 + y)
        ).alias("zw_s"),
        F.array_position(seq, 2).cast("int").alias("pos2"),
        F.concat_ws(
            ",", F.sort_array(F.array_union(seq, F.array(F.lit(2), F.lit(5))))
        ).alias("union_s"),
        F.concat_ws(",", F.flatten(F.array(seq, F.array(F.lit(9))))).alias("flat_s"),
    )


@query(
    "q_fn_datetime2",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(dayofyear(o_orderdate) AS INT) AS doy,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_spark,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
             AS days_since_95
    FROM orders
    """,
)
def fn_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime pack #2: quarter / day-of-year / day-of-week (aligned to
    Spark's Sunday=1 against DuckDB's Sunday=0) / last_day / datediff
    from an epoch date."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter(d).alias("q"),
        F.dayofyear(d).alias("doy"),
        F.dayofweek(d).alias("dow_spark"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.datediff(F.to_date(d), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


@query(
    "q_fn_string2",
    oracle="""
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS type_first,
           translate(p_brand, '#', '-') AS brand_dashed,
           repeat(substr(p_brand, 1, 2), 2) AS b2x2,
           reverse(p_name) AS name_rev,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           substr(p_name, 1, 3) AS name_left3
    FROM part
    """,
)
def fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String pack #2: split_part, translate, repeat, reverse, instr
    (1-based, 0 = absent on both engines), left-prefix."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("b2x2"),
        F.reverse("p_name").alias("name_rev"),
        F.instr("p_name", "a").alias("first_a"),
        F.substring("p_name", 1, 3).alias("name_left3"),
    )


@query(
    "q_fn_explode_outer",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x = 'zzzznever') AS rare
      FROM documents
    )
    SELECT doc_id, CAST(NULL AS VARCHAR) AS tok
    FROM t WHERE len(rare) = 0
    UNION ALL
    SELECT doc_id, unnest(rare) AS tok FROM t WHERE len(rare) > 0
    """,
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer semantics: rows whose array is EMPTY survive with a
    NULL element instead of vanishing — the corner that silently loses
    rows when plain explode is used on sparse features."""
    d = load(spark, sf_dir, "documents")
    rare = F.filter(F.split("text", " "), lambda x: x == "zzzznever")
    return d.select("doc_id", F.explode_outer(rare).alias("tok"))


@query(
    "q_fn_try",
    oracle="""
    SELECT event_id,
           CASE WHEN (event_id % 7) = 0 THEN NULL
                ELSE CAST(value / (event_id % 7) AS DOUBLE) END AS safe_div,
           TRY_CAST(event_type AS BIGINT) AS bad_cast,
           TRY_CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS good_cast
    FROM events
    """,
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe function family (`try_divide`, `try_cast`): NULL on
    divide-by-zero / un-castable input instead of an ANSI runtime
    error — the difference between a 10-hour pipeline dying at hour 9
    on one malformed row and it completing with an auditable NULL.
    DuckDB twin: TRY_CAST + an explicit zero-guard CASE (its division
    is NULL-on-zero only in non-strict mode)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.try_divide(F.col("value"), F.col("event_id") % 7).alias("safe_div"),
        F.expr("try_cast(event_type AS BIGINT)").alias("bad_cast"),
        F.expr("try_cast(CAST(event_id AS STRING) AS BIGINT)").alias("good_cast"),
    )


@query(
    "q_fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id, lang,
             'https://' || source || '.example.com/docs/' ||
               CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      FROM documents
    )
    SELECT split_part(split_part(url, '//', 2), '/', 1) AS host,
           COUNT(*) AS n_docs,
           array_to_string(list_sort(list(DISTINCT split_part(split_part(url, 'lang=', 2), '&', 1))), ',')
             AS langs
    FROM u GROUP BY 1
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function pack — ``parse_url`` (HOST / QUERY-parameter
    extraction), the domain-analytics primitive every web-corpus
    pipeline leans on (per-domain quality priors, domain caps,
    blocklists). Documents are assigned deterministic URLs
    (https://{source}.example.com/docs/{doc_id}?lang={lang}) and the
    operator recovers host and the lang query parameter WITH
    ``parse_url`` — the oracle recovers the same parts with plain
    string splitting, so the JVM URL parser itself is under test.
    Map-side parse + one aggregate; at 100 TB the host extraction
    stays inside whole-stage codegen (no UDF)."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return (
        d.select(
            F.parse_url(url, F.lit("HOST")).alias("host"),
            F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.concat_ws(",", F.array_sort(F.collect_set("lang_param"))).alias("langs"),
        )
    )


@query(
    "q_fn_csv",
    oracle=f"""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           {SQL_DSUM("o_totalprice")} AS sum_price
    FROM orders GROUP BY 1
    """,
)
def fn_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV scalar pack — ``to_csv`` / ``from_csv`` round-trip: each
    order serializes to a CSV line and is parsed back with a declared
    schema, and the aggregate over the PARSED columns must equal the
    aggregate over the originals (the oracle) — so the
    serialize→parse pair itself is under test, including double
    formatting round-trips. Both directions are JVM expressions inside
    whole-stage codegen: per-row semi-structured encode/decode at
    100 TB never touches Python."""
    o = load(spark, sf_dir, "orders")
    line = F.to_csv(F.struct("o_orderkey", "o_orderstatus", "o_totalprice"))
    parsed = F.from_csv(line, F.lit("k long, st string, price double"))
    return (
        o.select(parsed.alias("p"))
        .groupBy(F.col("p.st").alias("status"))
        .agg(F.count("*").alias("n"), dsum(F.col("p.price")).alias("sum_price"))
    )


@query(
    "q_fn_xml",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys
    FROM orders GROUP BY 1
    """,
)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML scalar pack — ``from_xml`` with a declared schema: orders
    render as XML fragments and parse back, completing the
    semi-structured trio (JSON pack, VARIANT, XML). The oracle
    aggregates the original columns, so the XML render→parse pair is
    what is verified. Same scale posture as the CSV pack: pure JVM
    expressions, no Python in the row path."""
    o = load(spark, sf_dir, "orders")
    xml = F.format_string(
        "<o><k>%d</k><st>%s</st></o>", F.col("o_orderkey"), F.col("o_orderstatus")
    )
    parsed = F.from_xml(xml, F.lit("k long, st string"))
    return (
        o.select(parsed.alias("p"))
        .groupBy(F.col("p.st").alias("status"))
        .agg(
            F.count("*").alias("n"),
            F.sum("p.k").cast("long").alias("sum_keys"),
        )
    )


@query(
    "q_fn_collation",
    oracle="""
    WITH cased AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE p_type END AS t
      FROM part
    )
    SELECT lower(t) AS type_ci,
           COUNT(*) AS n,
           COUNT(DISTINCT t) AS n_case_variants
    FROM cased GROUP BY 1
    """,
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): grouping under the UTF8_LCASE
    collation merges case variants that a binary-collated group-by
    would split. Case variation is synthesized deterministically
    (every even part key upper-cases its type), the group key is the
    COLLATED string, and the emitted label is canonicalized with
    lower() because the collation-group representative is
    engine-chosen (first-seen) — the one nondeterminism collations
    introduce, handled exactly as a 100 TB pipeline must handle it.
    n_case_variants counts the distinct binary spellings each
    case-insensitive group absorbed (>1 for every group at any SF —
    proof the collation, not the data, did the merging)."""
    p = load(spark, sf_dir, "part")
    cased = p.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type"))
        .otherwise(F.col("p_type"))
        .alias("t")
    )
    return (
        cased.groupBy(F.collate(F.col("t"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("t").alias("nv"),
        )
        .select(
            F.lower(F.collate(F.col("k"), "UTF8_BINARY")).alias("type_ci"),
            "n",
            F.col("nv").alias("n_case_variants"),
        )
    )


@query(
    "q_fn_mask",
    oracle="""
    SELECT o_orderkey,
           regexp_replace(regexp_replace(regexp_replace(
             o_orderpriority, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
             '[0-9]', 'n', 'g') AS masked_priority,
           sha256(CAST(o_custkey AS VARCHAR)) AS cust_pseudonym,
           substr(sha256(CAST(o_custkey AS VARCHAR)), 1, 8) AS cust_short
    FROM orders
    WHERE o_orderkey < 1000
    """,
)
def fn_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance scalar pair: ``mask()`` (Spark 3.4+ — uppercase
    → X, lowercase → x, digits → n, punctuation kept) for display-safe
    redaction, and ``sha2(…, 256)`` for stable pseudonymization (same
    customer → same token across tables, so joins still work on the
    pseudonym — the property PII-safe analytics needs; the regex-based
    detect+redact big sibling is ``q_text_pii_scrub``). Pure map-side
    expressions; the oracle replicates mask character-class by
    character-class with global regexp_replace."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.mask("o_orderpriority").alias("masked_priority"),
        F.sha2(F.col("o_custkey").cast("string"), 256).alias("cust_pseudonym"),
        F.substring(
            F.sha2(F.col("o_custkey").cast("string"), 256), 1, 8
        ).alias("cust_short"),
    )


@query(
    "q_fn_string_distance",
    oracle="""
    WITH v AS (SELECT p_brand, p_name, CAST(COUNT(*) AS BIGINT) AS n
               FROM part GROUP BY 1, 2)
    SELECT a.p_brand AS brand, a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           a.n AS n_parts_a, b.n AS n_parts_b
    FROM v a JOIN v b
      ON a.p_brand = b.p_brand AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
    ORDER BY brand, name_a, name_b
    """,
)
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching — blocked-join entity resolution
    with DEDUPE-BEFORE-COMPARE: aggregate to distinct (brand, name)
    values first (carrying how many parts each covers), then run the
    quadratic levenshtein comparison per brand block on the VALUE
    table, keeping near-miss pairs (distance 1–2; distance 0 is
    exact-dup territory, q_dedup_exact's job). Comparing raw rows
    instead of distinct values is the classic fuzzy-join footgun —
    at sf0.1 it is ~16M levenshtein calls in one task and a
    quadratically exploding output, vs ~50k calls and a bounded
    value-pair output here (measured 84 s → <2 s); at 100 TB the value
    table is smaller than the row table by exactly the duplication
    factor the match is looking for. Levenshtein is the same classic
    DP on both engines, so distances are hash-exact."""
    v = (
        load(spark, sf_dir, "part")
        .groupBy("p_brand", "p_name")
        .agg(F.count("*").alias("n"))
    )
    a, b = v.alias("a"), v.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_brand").alias("brand"),
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.cast("long").alias("dist"),
            F.col("a.n").alias("n_parts_a"),
            F.col("b.n").alias("n_parts_b"),
        )
        .filter(F.col("dist").between(1, 2))
        .orderBy("brand", "name_a", "name_b")
    )


@query(
    "q_fn_aes",
    oracle="""
    SELECT n_nationkey, n_name AS decrypted,
           CAST(16 * (length(n_name) // 16 + 1) AS BIGINT) AS ct_len,
           CAST(16 * (length(n_name) // 16 + 1) AS BIGINT) AS ct_len_expected
    FROM nation
    """,
)
def fn_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: ``aes_encrypt``/``aes_decrypt``
    (Spark 3.3+) in deterministic ECB/PKCS mode — the
    encrypt-join-on-ciphertext configuration (GCM's random IV is the
    right default at rest but breaks equality semantics; ECB here is
    the declared deterministic variant, not a security recommendation).
    DuckDB has no AES, so the oracle certifies the two properties that
    ARE engine-portable: decrypt∘encrypt == identity on the plaintext
    column, and the PKCS#7 ciphertext length law 16·(⌊len/16⌋+1) —
    the Spark side emits the MEASURED octet_length next to the
    formula's prediction and the hash compare forces them equal.
    Pure map-side JVM expressions, no shuffle."""
    n = load(spark, sf_dir, "nation")
    enc = "aes_encrypt(n_name, '0123456789abcdef', 'ECB', 'PKCS')"
    return n.select(
        "n_nationkey",
        F.expr(
            f"CAST(aes_decrypt({enc}, '0123456789abcdef', 'ECB', 'PKCS') AS STRING)"
        ).alias("decrypted"),
        F.expr(f"octet_length({enc})").cast("long").alias("ct_len"),
        F.expr("16 * (length(n_name) div 16 + 1)")
        .cast("long")
        .alias("ct_len_expected"),
    )
