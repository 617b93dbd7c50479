"""Aggregation operators (SURVEY.md §2 B.4) — including the flagship.

The flagship ``q_daily_rollup`` is the batch analog of the reference
pipeline (StreamingAnalysisAppWithKafkaManageOffset.scala:52-74): parse order events, classify paid vs
placed, bucket by event-time day, and aggregate (total orders, paid
orders, paid fee) per day. Fixture mapping per FIXTURES.md:
``event_type='purchase'`` ↔ ``flag=="1"``, ``value`` ↔ ``fee``.

Scale notes: every query here is a single ``groupBy().agg`` —
Catalyst plans partial (map-side) + final HashAggregate around one
hash-partitioned exchange, exactly the reference's reduceByKey combiner
strategy (StreamingAnalysisAppWithKafkaManageOffset.scala:67-69) but codegen'd and spill-aware. Group-key
cardinality (days, flags, types) is tiny relative to input, so the
shuffle moves only partial aggregates — this holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import SQL_DSUM, dsum, query
from steaminganalysis_spark.sources import load

__all__ = ["daily_rollup"]

def _purchase():
    return F.col("event_type") == "purchase"


def daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference flagship (StreamingAnalysisAppWithKafkaManageOffset.scala:58-74) on the events table:
    per event-time day — total events, paid events, paid-fee sum."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count("*").alias("total"),
            F.count(F.when(_purchase(), 1)).alias("success"),
            dsum(F.when(_purchase(), F.col("value")).otherwise(0.0)).alias("fee"),
        )
    )


query(
    "q_daily_rollup",
    oracle=f"""
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           COUNT(*) AS total,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS success,
           {SQL_DSUM("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS fee
    FROM events
    GROUP BY 1
    """,
)(daily_rollup)


@query(
    "q_daily_rollup_substring",
    oracle="""
    SELECT substr(strftime(ts, '%Y-%m-%d %H:%M:%S'), 1, 10) AS day,
           COUNT(*) AS total,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS success,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS fee_cents
    FROM events
    GROUP BY 1
    """,
)
def daily_rollup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship with the reference's BIT-EXACT spelling: events are
    re-skinned to the producer wire format (all-string JSON fields,
    KafkaProducerApp.scala:46-52) and bucketed by ``substring(time, 1,
    10)`` through ``classify_orders`` — the literal string slicing of
    StreamingAnalysisAppWithKafkaManageOffset.scala:58, not the
    idiomatic ``date_format`` of ``q_daily_rollup``. Both spellings are
    driver-checked so the README §1.2 day/hour/minute discrepancy has
    the idiomatic AND the reference-exact derivation under oracle
    (VERDICT r3 order #8). Fee flows as the reference's string fee →
    decimal(18,2) → integer cents, so the sum is exact by construction
    (no dsum needed)."""
    from steaminganalysis_spark.registry import to_cents
    from steaminganalysis_spark.streaming.pipeline import classify_orders

    ev = load(spark, sf_dir, "events").withColumn("cents", to_cents(F.col("value")))
    wire = ev.select(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("time"),
        F.format_string(
            "%s%d.%02d",
            F.when(F.col("cents") < 0, "-").otherwise(""),
            F.expr("abs(cents) div 100"),
            F.expr("abs(cents) % 100"),
        ).alias("fee"),
        F.when(_purchase(), "1").otherwise("0").alias("flag"),
        F.col("event_id").cast("string").alias("orderId"),
    )
    return (
        classify_orders(wire)
        .groupBy("day")
        .agg(
            F.count("*").alias("total"),
            F.sum("success").alias("success"),
            F.sum("fee_cents").alias("fee_cents"),
        )
    )


@query(
    "q_time_buckets",
    oracle=f"""
    WITH b AS (
      SELECT strftime(ts, '%Y-%m-%d') AS day,
             strftime(ts, '%H') AS hour,
             strftime(ts, '%M') AS minute,
             value, event_type
      FROM events
    )
    SELECT day, hour, minute,
           COUNT(*) AS total,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS success,
           {SQL_DSUM("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS fee
    FROM b
    GROUP BY GROUPING SETS ((day), (day, hour), (day, hour, minute))
    """,
)
def time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three calendar grains the reference README promises
    (README.md:4 '以天/时/分钟的维度统计'; the code derives hour/minute at
    StreamingAnalysisAppWithKafkaManageOffset.scala:59-60 then drops them) — one GROUPING SETS pass, so
    the input is scanned and shuffled once for all grains."""
    ev = load(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "HH").alias("hour"),
        F.date_format("ts", "mm").alias("minute"),
        "value",
        "event_type",
    )
    ev.createOrReplaceTempView("_tb_events")
    return spark.sql(
        f"""
        SELECT day, hour, minute,
               COUNT(*) AS total,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS success,
               {SQL_DSUM("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS fee
        FROM _tb_events
        GROUP BY GROUPING SETS ((day), (day, hour), (day, hour, minute))
        """
    )


@query(
    "q_agg_basic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM("l_quantity")} AS sum_qty,
           {SQL_DSUM("l_extendedprice")} AS sum_base_price,
           {SQL_DSUM("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
           {SQL_DSUM("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           {SQL_DSUM("l_quantity")} / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: count/sum/min/max/avg with
    filtered scan. Predicate + the 8-column projection push into the
    parquet reader (verified via .explain PushedFilters/ReadSchema)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("sum_disc_price"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
            ).alias("sum_charge"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            (dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-phase aggregate
    (Expand + partial distinct + final), keeping the distinct shuffle
    keyed on (group, value) so no single reducer sees all values."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count("*").alias("n_orders"),
    )


@query("q_agg_approx_distinct")  # rows-only: HLL estimate differs from exact by design
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB answer to
    COUNT(DISTINCT) — fixed-size sketch per partition, merged, no
    distinct shuffle. Checked rows-only (estimate vs exact tolerance is
    asserted in tests/test_llm_and_approx.py instead)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.count("*").alias("n_rows"),
    )


# ---------------- portable-hash HLL: the oracle-exact sketch (r10)

HLLP_M = 256  # registers: 8 index bits off the 32-bit multiplicative hash
HLLP_RMAX = 25  # rank cap: the 24 post-index bits are exhausted
# alpha_m · m² for m = 256 (Flajolet's 0.7213/(1 + 1.079/m)), emitted
# as ONE decimal literal both engines parse to the same double
_HLLP_ALPHA_M2 = repr((0.7213 / (1.0 + 1.079 / HLLP_M)) * HLLP_M * HLLP_M)


def _hllp_hash_sql(xor: str, div: str, expr: str = "user_id + 1") -> str:
    """lowbias32 avalanche hash (degski's xor-shift-multiply: two
    rounds of ``x = ((x >> 16) ^ x) * 0x45d9f3b mod 2^32`` + a final
    xor-shift) as engine-portable SQL. A plain multiplicative hash is
    NOT enough here: with an odd multiplier the product's trailing
    zeros equal the input's, so sequential ids give deterministic
    ranks and the estimate lands 50-100% high (measured). The mixer's
    constant 0x45d9f3b < 2^31 keeps every product under 2^63 — no
    BIGINT overflow in either engine. The one spelling difference
    between engines is xor/integer-div syntax, injected via ``xor``
    (``"({a} ^ {b})"`` Spark, ``"xor({a}, {b})"`` DuckDB) and ``div``
    (``DIV`` / ``//``); the constants, masks and structure are shared
    literally. ``expr`` is the integer input expression (default: the
    HLL key ``user_id + 1`` — the +1 so id 0 does not fix to 0);
    other sketches pass their own keyed/seeded inputs."""
    x = f"(({expr}) % 4294967296)"
    for _ in range(2):
        shifted = xor.format(a=f"({x} {div} 65536)", b=x)
        x = f"(({shifted}) * 73244475) % 4294967296"
    return xor.format(a=f"({x} {div} 65536)", b=x)
# linear-counting lookup m·ln(m/V) for V ∈ 1..m-1 precomputed to
# double literals: no runtime ln() (banned from hash-checked outputs)
_HLLP_LC = {
    v: repr(HLLP_M * __import__("math").log(HLLP_M / v))
    for v in range(1, HLLP_M)
}


def _hllp_rank_sql(div: str) -> str:
    """1-indexed lowest-set-bit position of the 24 post-index hash
    bits (`bit_count((x & -x) - 1)` = trailing zeros): the HLL rank,
    in BIGINT ops shared by both engines (`DIV`/`//` both truncate)."""
    rb = f"(h {div} {HLLP_M})"
    return (
        f"CASE WHEN {rb} = 0 THEN {HLLP_RMAX} "
        f"ELSE 1 + bit_count(({rb} & -{rb}) - 1) END"
    )


def _hllp_estimate_sql(alias: str) -> str:
    """Per-group HLL estimate folded to exact integers (the q_graph_anf
    discipline): Σ 2^-r is a sum of ≤m exact dyadics (order-free in
    doubles), the raw estimate αm²/(zeros + Σ2^-r) is one
    deterministic division, the small-range branch (raw ≤ 2.5m with
    zero registers present — Flajolet's rule) swaps in the
    linear-counting literal table, and FLOOR(est·1000) lands in BIGINT
    before anything crosses groups."""
    raw = (
        f"({_HLLP_ALPHA_M2} / ({HLLP_M}.0 - COUNT(*) "
        f"+ SUM(POW(2.0, -{alias}.r))))"
    )
    lc = " ".join(f"WHEN {v} THEN {lit}" for v, lit in _HLLP_LC.items())
    est = (
        f"CASE WHEN {raw} <= {2.5 * HLLP_M} AND COUNT(*) < {HLLP_M} "
        f"THEN (CASE ({HLLP_M} - COUNT(*)) {lc} END) "
        f"ELSE {raw} END"
    )
    return f"CAST(FLOOR(({est}) * 1000.0) AS BIGINT)"


@query(
    "q_agg_hll_portable",
    oracle=f"""
    WITH hh AS (
      SELECT event_type,
             {_hllp_hash_sql("xor({a}, {b})", '//')} AS h
      FROM events
    ),
    regs AS MATERIALIZED (
      SELECT event_type, h % {HLLP_M} AS j,
             MAX({_hllp_rank_sql('//')}) AS r
      FROM hh GROUP BY 1, 2
    ),
    est AS (
      SELECT s.event_type, {_hllp_estimate_sql('s')} AS hll_est_milli
      FROM regs s GROUP BY s.event_type
    ),
    ex AS (
      SELECT event_type,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT e.event_type, ex.exact_distinct, e.hll_est_milli
    FROM est e JOIN ex ON ex.event_type = e.event_type
    ORDER BY e.event_type
    """,
)
def agg_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type by a PORTABLE-HASH HyperLogLog —
    the oracle-exact twin of the rows-only sketch family
    (q_agg_approx_distinct / q_agg_hll_sketch check rows-only because
    their register bytes are engine-internal). Here every register op
    — the 32-bit multiplicative hash, the trailing-zero rank, the
    register MAX lattice, the αm²/LC estimate — is engine-portable
    integer SQL shared literally between the Spark plan and the DuckDB
    oracle (the q_graph_anf evidentiary trick, applied to the plain
    aggregation surface), so the driver hash-checks the ESTIMATE
    itself. The exact COUNT(DISTINCT) rides along per group, making
    the row self-certifying about accuracy. The fixture SFs exercise
    BOTH estimator regimes: sf0.001/0.01 land in linear counting
    (~150 distinct users ≪ 2.5m), sf0.1 (~1500 users) in the raw
    αm²/Σ2^-r branch — pinned in tests.

    Scale shape: the only shuffled state is the (group, register,
    max-rank) relation — ≤ m rows per group regardless of input size;
    the register MAX merge is associative so the map-side partial
    combine does real work, exactly how approx_count_distinct's
    internal HLL++ behaves, but auditable. The exact-distinct column
    is the standard two-phase distinct aggregate (keyed on
    (group, value), no single-reducer hotspot); at 100 TB you would
    drop it and keep only the sketch — it is here as the oracle's
    accuracy witness. Reference parity: no sketch surface in the
    reference (SURVEY §2 B.4 extension)."""
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    regs = (
        ev.selectExpr(
            "event_type", f"{_hllp_hash_sql('({a} ^ {b})', 'DIV')} AS h"
        )
        .selectExpr(
            "event_type",
            f"h % {HLLP_M} AS j",
            f"{_hllp_rank_sql('DIV')} AS r",
        )
        .groupBy("event_type", "j")
        .agg(F.max("r").alias("r"))
    )
    est = (
        regs.alias("s")
        .groupBy("event_type")
        .agg(F.expr(_hllp_estimate_sql("s")).alias("hll_est_milli"))
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        est.join(exact, "event_type")
        .select("event_type", "exact_distinct", "hll_est_milli")
        .orderBy("event_type")
    )


# -------------- portable-hash count-min sketch: oracle-exact (r10)

CMSP_D = 4  # hash rows
CMSP_W = 1024  # counters per row
CMSP_TOPN = 20  # heavy hitters reported


def _cmsp_col_sql(xor: str, div: str, row: int) -> str:
    """Counter column for hash row ``row``: lowbias32 of a per-row
    seeded key (seed folded into the integer input — distinct rows get
    independent hashes), mod w. Pure BIGINT, shared structure with the
    portable HLL."""
    return (
        f"({_hllp_hash_sql(xor, div, f'user_id + 1 + {row} * 1000003')}"
        f" % {CMSP_W})"
    )


def _cmsp_oracle() -> str:
    unions = "\n UNION ALL ".join(
        f"SELECT {r} AS hrow, {_cmsp_col_sql('xor({a}, {b})', '//', r)} AS col,"
        f" user_id FROM events"
        for r in range(CMSP_D)
    )
    ests = ",\n".join(
        f"""e{r} AS (
          SELECT t.user_id, c.n FROM top t JOIN counters c
          ON c.hrow = {r}
         AND c.col = {_cmsp_col_sql('xor({a}, {b})', '//', r).replace('user_id', 't.user_id')}
        )"""
        for r in range(CMSP_D)
    )
    least = "LEAST(" + ", ".join(f"e{r}.n" for r in range(CMSP_D)) + ")"
    joins = "\n".join(
        f"JOIN e{r} ON e{r}.user_id = t.user_id" for r in range(CMSP_D)
    )
    return f"""
    WITH cells AS MATERIALIZED ({unions}),
    counters AS MATERIALIZED (
      SELECT hrow, col, CAST(COUNT(*) AS BIGINT) AS n
      FROM cells GROUP BY 1, 2
    ),
    truth AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM events GROUP BY 1
    ),
    top AS (
      SELECT user_id, true_n FROM truth
      ORDER BY true_n DESC, user_id LIMIT {CMSP_TOPN}
    ),
    {ests}
    SELECT t.user_id, t.true_n, CAST({least} AS BIGINT) AS cms_est
    FROM top t
    {joins}
    ORDER BY t.true_n DESC, t.user_id
    """


@query("q_agg_cms_portable", oracle=_cmsp_oracle())
def agg_cms_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters with a PORTABLE-HASH sketch — the
    oracle-exact twin of the rows-only q_agg_cms_sketch (whose counter
    bytes are engine-internal): per-user event frequencies estimated
    from a {D}×{W} integer counter table whose every cell is
    reproducible SQL (the lowbias32 mixer of the portable HLL with a
    per-row seed folded into the key), so the driver hash-checks the
    ESTIMATES. All-integer end to end — counts in, mins out — the
    easiest sketch to make oracle-exact and the canonical one-sided
    bound: est ≥ true always (pinned), est ≤ true + ε·N w.h.p. The
    true count rides along for the top-{T} heaviest users, making each
    row self-certifying about overestimation.

    Scale shape: the build explodes each event into {D} (row, col)
    cells and aggregates — one shuffle of 12-byte rows into a table
    bounded by {D}·{W} cells REGARDLESS of input size, with map-side
    partial counts doing the heavy lifting (the linearity that lets
    1000 executors sketch independently and merge by cell-wise SUM).
    The probe side joins the top users against the BROADCAST counter
    table ({D}·{W} rows ≈ KBs) — probes never shuffle. At 100 TB the
    truth side disappears and only the sketch remains; it is here as
    the oracle's accuracy witness. Reference parity: no sketch
    surface in the reference (SURVEY §2 B.4 extension)."""
    ev = load(spark, sf_dir, "events").select("user_id")
    cells = None
    for r in range(CMSP_D):
        c = ev.selectExpr(
            f"{r} AS hrow",
            f"{_cmsp_col_sql('({a} ^ {b})', 'DIV', r)} AS col",
        )
        cells = c if cells is None else cells.unionAll(c)
    counters = cells.groupBy("hrow", "col").agg(
        F.count("*").cast("long").alias("n")
    )
    truth = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("true_n"))
    top = truth.orderBy(F.col("true_n").desc(), "user_id").limit(CMSP_TOPN)
    probed = top
    for r in range(CMSP_D):
        cr = counters.filter(F.col("hrow") == r).select(
            F.col("col").alias(f"col{r}"), F.col("n").alias(f"n{r}")
        )
        probed = probed.join(
            F.broadcast(cr),
            F.expr(_cmsp_col_sql("({a} ^ {b})", "DIV", r)) == F.col(f"col{r}"),
        )
    est = F.least(*[F.col(f"n{r}") for r in range(CMSP_D)])
    return (
        probed.select(
            "user_id", "true_n", est.cast("long").alias("cms_est")
        )
        .orderBy(F.col("true_n").desc(), "user_id")
    )


agg_cms_portable.__doc__ = (
    agg_cms_portable.__doc__.replace("{D}", str(CMSP_D))
    .replace("{W}", str(CMSP_W))
    .replace("{T}", str(CMSP_TOPN))
)


@query(
    "q_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {SQL_DSUM("l_quantity")} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy subtotals: (rf, ls) -> (rf) -> () in one Expand+
    aggregate pass — one scan for all grains."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


@query(
    "q_agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           {SQL_DSUM("o_totalprice")} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping combinations in one Expand+aggregate pass."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), dsum(F.col("o_totalprice")).alias("sum_price")
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS linenumbers,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_orderkey < 100
    GROUP BY l_orderkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_list), emitted sorted+joined so the
    value hash is order-insensitive (FIXTURES.md §3)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 100)
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list(F.col("l_linenumber")))).alias(
                "linenumbers"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q_agg_salted",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {SQL_DSUM("l_extendedprice")} AS total_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation for skewed keys: phase 1 groups by
    (key, salt) where salt = xxhash64(rowkey) mod 16 — spreading a hot
    key over 16 reducers — phase 2 merges the 16 partials per key.
    Result is bit-identical to the direct group-by (partials accumulate
    in exact decimal, so re-association cannot perturb the sum); the
    oracle IS the direct group-by. l_returnflag has ~3 values over the
    whole table — the canonical pathological skew at 100 TB. (AQE's
    skew handling covers joins; skewed AGGREGATION needs salting.)"""
    li = load(spark, sf_dir, "lineitem")
    salt = F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(16))
    partial = li.groupBy(F.col("l_returnflag"), salt.alias("salt")).agg(
        F.count("*").alias("pn"),
        F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).alias("psum"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("psum").cast("double").alias("total_price"),
    )


@query("q_agg_hll_sketch")  # rows-only: sketch estimates are engine-specific
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches via Spark 4
    ``hll_sketch_agg``): per-event-type distinct-user estimates PLUS an
    '__all__' row whose estimate comes from UNIONING the per-group
    sketches (``hll_union_agg``) — never re-scanning the input. This is
    the pre-aggregation pattern that matters at 100 TB: store tiny
    sketches per partition/day, answer global distinct queries by
    merging them. Tolerance vs exact counts is pinned in
    tests/test_stateful_and_sketches.py."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", F.lit(14)).alias("sk")
    )
    est = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est_users")
    )
    merged = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("__all__").alias("event_type"),
        F.hll_sketch_estimate("sk").alias("est_users"),
    )
    return est.unionAll(merged)


_THETA_LG_K = 16  # 2^16 nominal entries: exact-mode ceiling far above
# every fixture's per-cohort distinct-user count (~15k at sf0.1), so
# estimates are EXACT there and the oracle can be the exact SQL.


@query(
    "q_agg_theta_sketch",
    oracle="""
    WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
    SELECT 'type:' || event_type AS cohort,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'purchase&click',
           CAST((SELECT COUNT(*) FROM (SELECT * FROM p INTERSECT SELECT * FROM c)) AS BIGINT)
    UNION ALL
    SELECT 'purchase|click',
           CAST((SELECT COUNT(*) FROM (SELECT * FROM p UNION SELECT * FROM c)) AS BIGINT)
    UNION ALL
    SELECT 'click-purchase',
           CAST((SELECT COUNT(*) FROM (SELECT * FROM c EXCEPT SELECT * FROM p)) AS BIGINT)
    """,
)
def agg_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch cohort set algebra (Apache DataSketches via Spark 4
    ``theta_*``): per-event-type distinct users, plus purchase∩click,
    purchase∪click and click∖purchase computed ON THE SKETCHES — no
    re-scan, no distinct-user shuffle per cohort pair. This is the
    capability HLL cannot provide (HLL unions but never intersects):
    at 100 TB, per-segment theta sketches (KB each) are aggregated
    once, and ANY audience-overlap question is then answered by
    intersecting/differencing sketches, where the exact answer would
    re-shuffle the full user set per question.

    Below 2^{_THETA_LG_K} distinct values a theta sketch is in exact
    mode, so every estimate here is the exact count and the oracle is
    the plain COUNT(DISTINCT)/INTERSECT/EXCEPT SQL (precondition
    pinned in tests/test_stateful_and_sketches.py); past the ceiling
    it degrades to ~1% estimation with bounded memory instead of
    failing. The cohort-pair frame is a 1×1 crossJoin of single-row
    sketch aggregates — driver-size data by construction."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id", F.lit(_THETA_LG_K)).alias("sk")
    )
    base = per_type.select(
        F.concat(F.lit("type:"), F.col("event_type")).alias("cohort"),
        F.theta_sketch_estimate("sk").alias("n_users"),
    )
    p = per_type.filter(F.col("event_type") == "purchase").select(
        F.col("sk").alias("skp")
    )
    c = per_type.filter(F.col("event_type") == "click").select(
        F.col("sk").alias("skc")
    )
    algebra = (
        p.crossJoin(c)  # 1×1: two single-row sketch frames
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("purchase&click").alias("cohort"),
                        F.theta_sketch_estimate(
                            F.theta_intersection("skp", "skc")
                        ).alias("n_users"),
                    ),
                    F.struct(
                        F.lit("purchase|click").alias("cohort"),
                        F.theta_sketch_estimate(
                            F.theta_union("skp", "skc", _THETA_LG_K)
                        ).alias("n_users"),
                    ),
                    F.struct(
                        F.lit("click-purchase").alias("cohort"),
                        F.theta_sketch_estimate(
                            F.theta_difference("skc", "skp")
                        ).alias("n_users"),
                    ),
                )
            ).alias("r")
        )
        .select("r.cohort", "r.n_users")
    )
    return base.unionByName(algebra)


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) AS cov_qty_disc,
           round(avg(l_quantity), 6) AS mean_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate pack: stddev/variance/correlation/
    covariance per group. Both engines use numerically stable one-pass
    (Welford-style) merge formulas; results are rounded before hashing
    because partial-merge order legitimately perturbs the last ulps."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
        F.round(F.avg("l_quantity"), 6).alias("mean_qty"),
    )


@query(
    "q_agg_mode_bool",
    oracle="""
    SELECT l_linestatus,
           mode(l_returnflag) AS mode_flag,
           bool_and(l_quantity > 0) AS all_positive,
           bool_or(l_discount > 0.09) AS any_high_discount,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_mode_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mode() and boolean aggregates. NOTE: mode is only deterministic
    when the maximum is unique; on this data l_returnflag has a strict
    frequency ordering per linestatus (asserted implicitly by the oracle
    match — DuckDB and Spark would disagree on ties)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.mode("l_returnflag").alias("mode_flag"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).alias("any_high_discount"),
        F.count("*").alias("n"),
    )


@query(
    "q_agg_grouping_flags",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '<all>') AS rf,
           COALESCE(l_linestatus, '<all>') AS ls,
           CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
           COUNT(*) AS n,
           {SQL_DSUM("l_quantity")} AS qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() indicator columns — how downstream
    consumers distinguish 'NULL data value' from 'subtotal row' without
    guessing from NULLs."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count("*").alias("n"),
            dsum(F.col("l_quantity")).alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("ls"),
            "g_rf",
            "g_ls",
            "n",
            "qty",
        )
    )


@query(
    "q_agg_product",
    oracle="""
    SELECT l_orderkey,
           round(product(1.0 + l_discount), 6) AS discount_factor,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT aggregate (compounded discount factor per order): few
    factors per group in [1, 1.1], so reassociation noise sits far below
    the rounded precision."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.round(F.product(1.0 + F.col("l_discount")), 6).alias("discount_factor"),
        F.count("*").alias("n_lines"),
    )


@query(
    "q_agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via roaring-bitmap-style aggregation
    (``bitmap_bit_position`` / ``bitmap_construct_agg`` /
    ``bitmap_count``): ids within each 32k-bucket collapse to one
    bitmap map-side, buckets merge associatively, and the final count
    is a SUM of per-bucket popcounts. This is the middle path between
    ``COUNT(DISTINCT)`` (exact, but shuffles every distinct id) and
    HLL (`q_agg_hll_sketch`, mergeable but approximate): bitmaps are
    exact AND mergeable, shuffling at most one ~4 KB buffer per
    (group, id-bucket) regardless of row count — the right tool when
    the id domain is dense (user ids are). Two bounded shuffles:
    (event_type, bucket) bitmap partials, then the per-type popcount
    sum."""
    ev = load(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"),
        F.count("*").alias("c"),
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users"),
        F.sum("c").alias("n_events"),
    )


_CMS_EPS = 0.002  # width 1000: over-estimate bound eps*N
_CMS_CONF = 0.99  # depth 7
_CMS_SEED = 42
_CMS_TOP = 5


def _cms_parse(b: bytes):
    """Parse Spark's serialized CountMinSketch (version 1): header
    (version int, totalCount long, depth int, width int), then the
    depth hashA longs, then the depth×width counter table — all
    big-endian. O(KB) driver-side bytes."""
    import struct

    v, total, depth, width = struct.unpack(">iqii", b[:20])
    assert v == 1, f"unexpected CMS serialization version {v}"
    off = 20
    hash_a = struct.unpack(f">{depth}q", b[off : off + 8 * depth])
    off += 8 * depth
    table = [
        struct.unpack(f">{width}q", b[off + i * 8 * width : off + (i + 1) * 8 * width])
        for i in range(depth)
    ]
    return total, depth, width, hash_a, table


def _cms_estimate(parsed, item: int) -> int:
    """Point estimate for a LONG item — Spark's universal-hash scheme
    (hashA[i]·item, fold the high word, mask by the Mersenne prime
    2³¹−1, mod width; Java arithmetic shift reproduced on signed
    ints), min across the depth rows."""
    _, depth, width, hash_a, table = parsed
    vals = []
    for i in range(depth):
        h = (hash_a[i] * item) & ((1 << 64) - 1)
        if h >= 1 << 63:
            h -= 1 << 64
        h += h >> 32
        h &= (1 << 31) - 1
        vals.append(table[i][int(h % width)])
    return min(vals)


@query("q_agg_cms_sketch")  # rows-only: sketch internals are engine-specific
def agg_cms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable COUNT-MIN sketches (Spark ``count_min_sketch``) — the
    heavy-hitter frequency sketch that completes the sketch family
    (HLL/theta/bitmap count distincts; CMS counts frequencies): how
    often does each hot user appear, answered from KB-sized state.
    Three sketches are built in ONE pass each — the global sketch and
    two disjoint-half partials (even/odd event_id) — and the registered
    row carries the two properties production pre-aggregation relies
    on, verified EXACTLY:

    - mergeability: CMS is linear, so the element-wise SUM of the two
      partial counter tables must equal the global table bit-for-bit
      (same seed → same hash functions). This is what lets 1000
      executors sketch their partitions independently and a reader
      merge per-day sketches without rescanning 100 TB.
    - one-sided error: for the top-{TOP} users by exact count, the
      sketch estimate never under-counts and over-counts by at most
      eps·N (eps={EPS}).

    Only the three ~KB sketches and {TOP} exact rows reach the driver."""
    ev = load(spark, sf_dir, "events")
    cms = f"count_min_sketch(user_id, {_CMS_EPS}d, {_CMS_CONF}d, {_CMS_SEED})"
    glob = bytes(ev.agg(F.expr(cms).alias("c")).collect()[0]["c"])
    halves = {
        r["half"]: bytes(r["c"])
        for r in ev.groupBy(F.pmod("event_id", F.lit(2)).alias("half"))
        .agg(F.expr(cms).alias("c"))
        .collect()
    }
    g = _cms_parse(glob)
    h0, h1 = _cms_parse(halves[0]), _cms_parse(halves[1])
    merged_ok = all(
        a + b == c
        for ra, rb, rc in zip(h0[4], h1[4], g[4])
        for a, b, c in zip(ra, rb, rc)
    ) and h0[0] + h1[0] == g[0]
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(_CMS_TOP)
        .collect()
    )
    n_total = g[0]
    rows = []
    for r in top:
        est = _cms_estimate(g, int(r["user_id"]))
        rows.append(
            (
                int(r["user_id"]),
                int(r["exact_n"]),
                int(est),
                bool(r["exact_n"] <= est <= r["exact_n"] + _CMS_EPS * n_total),
                bool(merged_ok),
            )
        )
    return spark.createDataFrame(
        rows,
        "user_id long, exact_n long, cms_est long, within_bound boolean, "
        "merged_equals_global boolean",
    )


agg_cms_sketch.__doc__ = agg_cms_sketch.__doc__.replace(
    "{TOP}", str(_CMS_TOP)
).replace("{EPS}", str(_CMS_EPS))


@query(
    "q_agg_percentile_disc",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_quantity, 0.25) AS qty_p25,
           quantile_disc(l_quantity, 0.50) AS qty_p50,
           quantile_disc(l_quantity, 0.75) AS qty_p75,
           quantile_disc(l_extendedprice, 0.50) AS price_p50,
           quantile_disc(l_extendedprice, 0.99) AS price_p99
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete percentiles per group — PERCENTILE_DISC WITHIN
    GROUP, the SQL-standard form (Spark 3.4+). Unlike the sketch-backed
    ``q_agg_approx_percentile`` (rows-only, tolerance-tested), disc
    percentiles return an actual element of the multiset, so the result
    is hash-exact against DuckDB's quantile_disc (parity probed on odd/
    even group sizes before registration). Exact percentiles sort each
    group — fine at group-count grain; the approx variant remains the
    documented 100 TB path when groups are huge, which is precisely why
    both are registered."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("li_pdisc")
    return li.sparkSession.sql(
        """
        SELECT l_returnflag,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS qty_p25,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY l_quantity) AS qty_p50,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS qty_p75,
               percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice) AS price_p50,
               percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS price_p99
        FROM li_pdisc
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "q_agg_regression",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS y
      FROM events
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS HUGEINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS HUGEINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) AS HUGEINT) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) AS HUGEINT) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(y * y) AS HUGEINT) AS DOUBLE) AS syy
      FROM obs GROUP BY event_type
    )
    SELECT event_type,
           (FLOOR(((n * sxy - sx * sy) / (n * sxx - sx * sx)) * 1000000.0 + 0.5) / 1000000.0)
             AS slope_cents_per_day,
           (FLOOR(((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n) * 1000000.0 + 0.5) / 1000000.0)
             AS intercept_cents,
           (FLOOR(((n * sxy - sx * sy) * (n * sxy - sx * sy)
                    / ((n * sxx - sx * sx) * (n * syy - sy * sy))) * 1000000.0 + 0.5) / 1000000.0)
             AS r2
    FROM sums
    ORDER BY event_type
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ordinary-least-squares regression per group — slope /
    intercept / R² of event value (integer cents) against event date
    (days since epoch), computed from EXACT integer moment sums
    (n, Σx, Σy, Σxy, Σx², Σy² accumulated as decimal(38,0) / HUGEINT,
    overflow-promoting) so the result is a pure function of the data:
    the closed-form OLS expressions then run on identical doubles on
    both engines, and the outputs round through the floor-based
    convention. This is the moment-sketch formulation — one partial+
    final aggregate pass, no second centering pass, mergeable across
    partitions by construction — which is exactly how a 100 TB
    regression has to run (the naive two-pass mean-centered form costs
    a second scan; built-in regr_slope/corr use Welford merges whose
    last-ulp results depend on partition order, which is why they hash
    only after rounding, q_agg_stats). Fixture x-spread is ~30 days;
    slopes are in cents/day."""
    from steaminganalysis_spark.registry import to_cents

    ev = load(spark, sf_dir, "events")
    x = F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")).cast(
        "long"
    )
    y = to_cents(F.col("value"))
    obs = ev.select(F.col("event_type"), x.alias("x"), y.alias("y"))
    d38 = "decimal(38,0)"
    sums = obs.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast(d38)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(d38)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).cast("double").alias("syy"),
    )
    from steaminganalysis_spark.registry import round_half_up

    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r2 = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    ) / (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select(
        "event_type",
        round_half_up(slope, 6).alias("slope_cents_per_day"),
        round_half_up(intercept, 6).alias("intercept_cents"),
        round_half_up(r2, 6).alias("r2"),
    ).orderBy("event_type")


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_quantity,
             CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
               AS wt
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, l_quantity, wt,
             SUM(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY l_quantity, wt
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM w
    )
    SELECT l_returnflag,
           MIN(l_quantity) AS weighted_median_qty,
           CAST(MIN(tw) AS BIGINT) AS total_weight_cents
    FROM cum
    WHERE 2 * cw >= tw
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median — a surface Spark has no built-in for (and the
    sketch percentiles cannot weight): the smallest value whose
    cumulative weight reaches half the group total, weights in exact
    integer cents so the halfway comparison (2·cum ≥ total) is integer
    arithmetic on both engines. One window pass over each group's
    sorted rows (running weight + group total share the partition
    sort), then a MIN per group — no self-join, no driver collection.
    The same shape generalizes to any weighted quantile (2·cum ≥ total
    → q-scaled comparison). At 100 TB the group sort is the window
    family's standard cost; for truly huge groups the documented
    evolution is a weighted histogram sketch, traded for exactness."""
    from pyspark.sql import Window as W

    from steaminganalysis_spark.registry import to_cents

    li = load(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        "l_quantity",
        to_cents(F.col("l_extendedprice")).alias("wt"),
    )
    win = (
        W.partitionBy("l_returnflag")
        .orderBy("l_quantity", "wt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = w.select(
        "l_returnflag",
        "l_quantity",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(W.partitionBy("l_returnflag")).alias("tw"),
    )
    return (
        cum.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("weighted_median_qty"),
            F.min("tw").cast("long").alias("total_weight_cents"),
        )
        .orderBy("l_returnflag")
    )


# Bloom geometry: m = 2^16 bits packed into 1024 longs, k = 4 hashes.
# At the largest fixture (~10k distinct build keys) the predicted FP
# rate is (1 - e^{-kn/m})^4 ≈ 4% — large enough to OBSERVE false
# positives (the demo needs some) and small enough to bound.
_BLOOM_BITS = 1 << 16
_BLOOM_K = 4


@query("q_agg_bloom")  # rows-only: xxhash64 bit patterns are Spark-specific
def agg_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom filter as a first-class operator: build bit
    words from the orders' customer set with a bit_or aggregate
    (explode each key to k=4 (word, mask) pairs — map-side partial
    bit_or collapses every partition to ≤1024 rows), pack them into ONE
    map row, broadcast it, and probe every customer map-side. Emits
    per-customer ``maybe_present`` (the filter's answer) next to
    ``actually_present`` (the exact semi-join truth) so the defining
    contract is in the output: no false negatives ever, false
    positives at the designed ~4% — pinned in
    tests/test_stateful_and_sketches.py. This is the manual spelling
    of the runtime-bloom pattern Spark injects in joins
    (test_runtime_bloom_filter_prunes_fact_side): at 100 TB you build
    the 8 KB filter on the small side and ship it to every scan task
    instead of shuffling the fact table to discover non-matches."""
    m, k = _BLOOM_BITS, _BLOOM_K
    # Build on the urgent-order customer set (a strict subset of the
    # probe domain) so the filter's answers actually split: the full
    # customer probe has a real absent population to false-positive on.
    build = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    seeds = F.array(*[F.lit(i) for i in range(k)])
    positions = build.select(
        F.explode(
            F.transform(seeds, lambda i: F.pmod(F.xxhash64("o_custkey", i), F.lit(m)))
        ).alias("pos")
    )
    words = positions.selectExpr(
        "pos div 64 AS word",
        "shiftleft(1L, CAST(pos % 64 AS INT)) AS mask",
    ).groupBy("word").agg(F.bit_or("mask").alias("bits"))
    bloom = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("bm")
    )
    probe = load(spark, sf_dir, "customer").select("c_custkey")
    probed = probe.crossJoin(F.broadcast(bloom))
    hit = None
    for i in range(k):
        this = F.expr(
            f"coalesce(element_at(bm, pmod(xxhash64(c_custkey, {i}), {m}) div 64), 0L)"
            f" & shiftleft(1L, CAST(pmod(xxhash64(c_custkey, {i}), {m}) % 64 AS INT))"
        ) != 0
        hit = this if hit is None else (hit & this)
    flags = probed.select("c_custkey", hit.alias("maybe_present"))
    truth = build.select(F.col("o_custkey").alias("c_custkey")).withColumn(
        "actually_present", F.lit(True)
    )
    return flags.join(F.broadcast(truth), "c_custkey", "left").select(
        "c_custkey",
        "maybe_present",
        F.coalesce("actually_present", F.lit(False)).alias("actually_present"),
    )


# Measure columns screened pairwise by q_agg_corr_matrix; cents-scaled
# BIGINTs so every moment sum is exact. Quantity scales by 100 too so
# all three live on one integer convention.
_CORR_COLS = ("qty", "price", "disc")


@query(
    "q_agg_corr_matrix",
    oracle="""
    WITH m AS (
      SELECT CAST(l_quantity * 100 AS BIGINT) AS qty,
             CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
               AS price,
             CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT)
               AS disc
      FROM lineitem
    ),
    pairs AS (
      SELECT 'qty' AS col_a, 'price' AS col_b, qty AS x, price AS y FROM m
      UNION ALL
      SELECT 'qty', 'disc', qty, disc FROM m
      UNION ALL
      SELECT 'disc', 'price', disc, price FROM m
    ),
    sums AS (
      SELECT col_a, col_b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(CAST(SUM(x) AS HUGEINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS HUGEINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) AS HUGEINT) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) AS HUGEINT) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(y * y) AS HUGEINT) AS DOUBLE) AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT col_a, col_b, n,
           (FLOOR(((nd * sxy - sx * sy)
                   / NULLIF(sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 0.0))
                  * 1000000.0 + 0.5) / 1000000.0) AS r
    FROM sums
    """,
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the lineitem measures
    (quantity, extended price, discount — upper triangle, 3 pairs) in
    ONE pass: each row fans out to its pairs map-side (a ×3 Expand,
    no re-scan per pair), every pair reduces to the exact
    decimal(38,0)/HUGEINT moment sums, and the closed form runs on
    identical doubles with floor-ppm rounding. The feature-screening
    matrix a modeling pipeline computes before training — at 100 TB
    the cost is one scan + one 3-key aggregate shuffle regardless of
    how many measure pairs are screened, vs built-in ``corr`` called
    per pair which re-aggregates (and Welford-merges with
    partition-order last-ulp noise, the q_agg_stats caveat)."""
    from steaminganalysis_spark.registry import to_cents

    li = load(spark, sf_dir, "lineitem")
    m = li.select(
        (F.col("l_quantity") * 100).cast("long").alias("qty"),
        to_cents(F.col("l_extendedprice")).alias("price"),
        to_cents(F.col("l_discount")).alias("disc"),
    )
    pairs = m.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("qty").alias("col_a"),
                    F.lit("price").alias("col_b"),
                    F.col("qty").alias("x"),
                    F.col("price").alias("y"),
                ),
                F.struct(
                    F.lit("qty").alias("col_a"),
                    F.lit("disc").alias("col_b"),
                    F.col("qty").alias("x"),
                    F.col("disc").alias("y"),
                ),
                F.struct(
                    F.lit("disc").alias("col_a"),
                    F.lit("price").alias("col_b"),
                    F.col("disc").alias("x"),
                    F.col("price").alias("y"),
                ),
            )
        ).alias("p")
    ).select("p.*")
    d38 = "decimal(38,0)"
    sums = pairs.groupBy("col_a", "col_b").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(d38)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(d38)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast("double").alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(d38)).cast("double").alias("syy"),
    )
    return sums.select(
        "col_a",
        "col_b",
        "n",
        F.expr(
            "FLOOR(((CAST(n AS DOUBLE) * sxy - sx * sy)"
            " / NULLIF(sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)"
            "               * (CAST(n AS DOUBLE) * syy - sy * sy)), 0.0D))"
            " * 1000000.0D + 0.5D) / 1000000.0D"
        ).alias("r"),
    )


@query(
    "q_agg_skewkurt",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS x
      FROM events
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(CAST(SUM(x) AS HUGEINT) AS DOUBLE) AS s1,
             CAST(CAST(SUM(x * x) AS HUGEINT) AS DOUBLE) AS s2,
             CAST(CAST(SUM(x * x * x) AS HUGEINT) AS DOUBLE) AS s3,
             -- x^4 at cents scale passes int64 (56021^4 ≈ 9.8e18):
             -- promote BEFORE the multiply, mirroring Spark's
             -- decimal(38,0) × decimal(38,0) product
             CAST(CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT)
                  AS DOUBLE) AS s4
      FROM m GROUP BY 1
    ),
    cm AS (
      SELECT event_type, n, nd,
             s1 / nd AS mu,
             (s2 - s1 * s1 / nd) / nd AS m2,
             (s3 - 3.0 * (s1 / nd) * s2 + 2.0 * nd * (s1 / nd) * (s1 / nd) * (s1 / nd)) / nd AS m3,
             (s4 - 4.0 * (s1 / nd) * s3 + 6.0 * (s1 / nd) * (s1 / nd) * s2
                 - 3.0 * nd * (s1 / nd) * (s1 / nd) * (s1 / nd) * (s1 / nd)) / nd AS m4
      FROM sums
    )
    SELECT event_type, n,
           (FLOOR((m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))) * 1000000.0 + 0.5)
             / 1000000.0) AS skewness,
           (FLOOR((m4 / (m2 * m2) - 3.0) * 1000000.0 + 0.5) / 1000000.0)
             AS excess_kurtosis
    FROM cm
    """,
)
def agg_skewkurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third and fourth standardized moments — skewness and excess
    kurtosis per event type, completing the moment-sketch family
    (mean/var → OLS → ACF → now shape). Raw power sums Σx..Σx⁴
    accumulate EXACTLY (decimal(38,0)/HUGEINT — x⁴ at cents scale
    reaches ~10²¹, past both int64 and the double-exact range, which
    is precisely why the accumulator type matters); the central-moment
    algebra then runs on identical doubles both engines with floor-ppm
    rounding. One partial+final aggregate pass, mergeable across
    partitions by construction — the same single-scan property the
    built-in skewness/kurtosis give up by Welford-merging in
    partition order (last-ulp nondeterminism, the q_agg_stats
    caveat)."""
    from steaminganalysis_spark.registry import to_cents

    ev = load(spark, sf_dir, "events")
    m = ev.select("event_type", to_cents(F.col("value")).alias("x"))
    d38 = "decimal(38,0)"
    sums = m.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast(d38)).cast("double").alias("s1"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast("double").alias("s2"),
        F.sum((F.col("x") * F.col("x") * F.col("x")).cast(d38))
        .cast("double")
        .alias("s3"),
        F.sum(
            (F.col("x") * F.col("x")).cast(d38) * (F.col("x") * F.col("x")).cast(d38)
        )
        .cast("double")
        .alias("s4"),
    )
    cm = sums.selectExpr(
        "event_type",
        "n",
        "CAST(n AS DOUBLE) AS nd",
        "s1 / CAST(n AS DOUBLE) AS mu",
        "(s2 - s1 * s1 / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS m2",
        "(s3 - 3.0D * (s1 / CAST(n AS DOUBLE)) * s2"
        " + 2.0D * CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))"
        " / CAST(n AS DOUBLE) AS m3",
        "(s4 - 4.0D * (s1 / CAST(n AS DOUBLE)) * s3"
        " + 6.0D * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * s2"
        " - 3.0D * CAST(n AS DOUBLE) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE)))"
        " / CAST(n AS DOUBLE) AS m4",
    )
    return cm.selectExpr(
        "event_type",
        "n",
        "FLOOR((m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))) * 1000000.0D + 0.5D)"
        " / 1000000.0D AS skewness",
        "FLOOR((m4 / (m2 * m2) - 3.0D) * 1000000.0D + 0.5D) / 1000000.0D"
        " AS excess_kurtosis",
    )


# ---- portable-hash sampled quantiles: oracle-exact estimator (r11)

QSAMP_MOD = 8  # deterministic Bernoulli rate 1/8: keep rows with h % 8 = 0


def _qsamp_pick_sql(div: str, q: int, src: str = "cents") -> str:
    """Rank-select the q-th percentile from rows carrying rn (1-based
    rank by (cents, rid)) and n (group size): index = 1 +
    FLOOR((n-1)·q/100) in shared truncating integer division —
    percentile_disc semantics spelled identically on both engines
    (their built-ins disagree on interpolation, so neither is used)."""
    return f"MAX(CASE WHEN rn = 1 + (((n - 1) * {q}) {div} 100) THEN {src} END)"


def _qsamp_oracle() -> str:
    h = _hllp_hash_sql("xor({a}, {b})", "//", "l_orderkey * 8 + l_linenumber")
    return f"""
    WITH s AS (
      SELECT l_returnflag AS grp,
             CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
             (l_orderkey * 8 + l_linenumber) AS rid,
             {h} AS h
      FROM lineitem
    ),
    samp AS MATERIALIZED (
      SELECT grp, cents, rid,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, rid) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM s WHERE (h % {QSAMP_MOD}) = 0
    ),
    est AS (
      SELECT grp,
             CAST(MAX(n) AS BIGINT) AS sample_n,
             {_qsamp_pick_sql('//', 50)} AS p50_cents,
             {_qsamp_pick_sql('//', 90)} AS p90_cents,
             {_qsamp_pick_sql('//', 99)} AS p99_cents
      FROM samp GROUP BY grp
    ),
    fx AS MATERIALIZED (
      SELECT grp, cents,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, rid) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS n
      FROM s
    ),
    wit AS (
      SELECT grp,
             CAST(MAX(n) AS BIGINT) AS exact_n,
             {_qsamp_pick_sql('//', 50)} AS exact_p50_cents
      FROM fx GROUP BY grp
    )
    SELECT e.grp AS returnflag, w.exact_n, e.sample_n,
           e.p50_cents, e.p90_cents, e.p99_cents, w.exact_p50_cents
    FROM est e JOIN wit w ON w.grp = e.grp
    ORDER BY returnflag
    """


@query("q_agg_quantile_sampled", oracle=_qsamp_oracle())
def agg_quantile_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group percentiles (p50/p90/p99 of l_extendedprice by return
    flag) from a DETERMINISTIC-HASH Bernoulli sample — the third
    member of the oracle-exact sketch family (portable HLL for
    distincts, portable CMS for frequencies, this for quantiles).
    Random sampling would be rows-only; here the sample membership
    decision is lowbias32(primary key) % {M} = 0 — a pure function of
    the row — so both engines draw the IDENTICAL sample and the
    driver hash-checks the estimates themselves. Rank selection is
    percentile_disc spelled as shared integer SQL (row_number by
    (cents, rid) + index 1+FLOOR((n-1)q/100)) because the engines'
    built-in percentile functions disagree on interpolation; values
    are exact cents end to end. The exact full-data median rides
    along as the accuracy witness (the portable-HLL convention);
    accuracy against it is pinned in tests.

    Scale shape: the sample predicate evaluates MAP-SIDE on the scan
    (only ~1/{M} of rows ever reach the exchange), the per-group sort
    is over sample rows only, and hash-deterministic Bernoulli
    sampling is MERGEABLE — the sample of a union is the union of the
    samples, so per-partition/per-day samples compose exactly like
    sketch merges, and re-runs are reproducible. At 100 TB the
    modulus is the accuracy/cost lever (error ~ 1/√(group·rate));
    the witness column is the part you drop. Reference parity: no
    sketch surface in the reference (SURVEY §2 B.4 extension)."""
    from pyspark.sql import Window as W

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    s = li.selectExpr(
        "l_returnflag AS grp",
        "CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents",
        "(l_orderkey * 8 + l_linenumber) AS rid",
        f"{_hllp_hash_sql('({a} ^ {b})', 'DIV', 'l_orderkey * 8 + l_linenumber')} AS h",
    )
    rn_w = W.partitionBy("grp").orderBy("cents", "rid")
    n_w = W.partitionBy("grp")

    def ranked(df: DataFrame) -> DataFrame:
        return df.withColumn("rn", F.row_number().over(rn_w)).withColumn(
            "n", F.count("*").over(n_w)
        )

    est = (
        ranked(s.filter(f"(h % {QSAMP_MOD}) = 0"))
        .groupBy("grp")
        .agg(
            F.expr("CAST(MAX(n) AS BIGINT)").alias("sample_n"),
            F.expr(_qsamp_pick_sql("DIV", 50)).alias("p50_cents"),
            F.expr(_qsamp_pick_sql("DIV", 90)).alias("p90_cents"),
            F.expr(_qsamp_pick_sql("DIV", 99)).alias("p99_cents"),
        )
    )
    wit = (
        ranked(s)
        .groupBy("grp")
        .agg(
            F.expr("CAST(MAX(n) AS BIGINT)").alias("exact_n"),
            F.expr(_qsamp_pick_sql("DIV", 50)).alias("exact_p50_cents"),
        )
    )
    return (
        est.join(wit, "grp")
        .select(
            F.col("grp").alias("returnflag"),
            "exact_n",
            "sample_n",
            "p50_cents",
            "p90_cents",
            "p99_cents",
            "exact_p50_cents",
        )
        .orderBy("returnflag")
    )


agg_quantile_sampled.__doc__ = agg_quantile_sampled.__doc__.replace(
    "{M}", str(QSAMP_MOD)
)


# ---- portable Bloom filter: the oracle-exact membership sketch (r12)

BLP_BITS = 16384  # filter width (512 x 32-bit words, 4 KB broadcast)
BLP_K = 4  # hash functions
BLP_SEED = 2654435761  # per-hash additive stride (Knuth, the MHP seed)


def _blp_pos_sql(xor: str, div: str, key: str) -> str:
    """Bit position of hash j for ``key``: the lowbias32 mixer over
    the 32-bit fold of (key + j·stride), reduced mod BLP_BITS —
    engine-portable integer SQL, same toolkit as every portable
    sketch. Expects ``j`` in scope."""
    return (
        f"({_hllp_hash_sql(xor, div, f'(({key}) % 4294967296) + j * {BLP_SEED}')}"
        f" % {BLP_BITS})"
    )


def _blp_oracle() -> str:
    pos_b = _blp_pos_sql("xor({a}, {b})", "//", "o_custkey")
    pos_p = _blp_pos_sql("xor({a}, {b})", "//", "c_custkey")
    return f"""
    WITH build AS MATERIALIZED (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    words AS MATERIALIZED (
      SELECT pos // 32 AS w,
             bit_or(CAST(POWER(2, pos % 32) AS BIGINT)) AS word
      FROM (SELECT {pos_b} AS pos
            FROM build, unnest(generate_series(0, {BLP_K - 1})) AS p(j))
      GROUP BY 1
    ),
    bits AS (
      SELECT c_custkey, c_nationkey,
             COALESCE((word // CAST(POWER(2, pos % 32) AS BIGINT)) % 2, 0) AS bit
      FROM (SELECT c_custkey, c_nationkey, {pos_p} AS pos
            FROM customer, unnest(generate_series(0, {BLP_K - 1})) AS p(j)) pr
      LEFT JOIN words ON pr.pos // 32 = words.w
    ),
    verdicts AS (
      SELECT c_custkey, MIN(c_nationkey) AS nk, MIN(bit) AS maybe
      FROM bits GROUP BY 1
    ),
    final AS (
      SELECT v.nk, v.maybe,
             CASE WHEN b.o_custkey IS NULL THEN 0 ELSE 1 END AS actual
      FROM verdicts v LEFT JOIN build b ON v.c_custkey = b.o_custkey
    )
    SELECT CAST(nk AS BIGINT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(SUM(maybe) AS BIGINT) AS n_maybe,
           CAST(SUM(actual) AS BIGINT) AS n_actual,
           CAST(SUM(CASE WHEN maybe = 1 AND actual = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positive
    FROM final GROUP BY 1 ORDER BY 1
    """


@query("q_agg_bloom_portable", oracle=_blp_oracle())
def agg_bloom_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership with an ORACLE-EXACT bit array — the
    sixth portable sketch (HLL, CMS, sampled quantiles, MinHash,
    SimHash, now Bloom), converting rows-only ``q_agg_bloom``
    (xxhash64 bit patterns, engine-internal) into a hash-checked key:
    every bit position is the lowbias32 mixer over the 32-bit fold of
    (key + j·stride) mod BLP_BITS, so BOTH engines build the
    byte-identical 512-word filter and even the FALSE-POSITIVE SET is
    deterministic cross-engine — the driver hash-checks the filter's
    answers themselves, not a tolerance band. Build = urgent-order
    customer keys (a strict subset of the probe domain, so answers
    split); probe = every customer; output = per-nation counts of
    probes / filter-yes / truly-present / false positives, with the
    no-false-negative contract implied by n_maybe >= n_actual in
    every row (pinned).

    Scale shape: the build explodes each key to k=4 (word, mask)
    pairs whose map-side partial bit_or collapses every partition to
    <= 512 rows BEFORE the exchange — filter state is bounded by
    BLP_BITS regardless of input size, and bit_or linearity makes
    partial filters mergeable (filter(A∪B) = filter(A)|filter(B),
    pinned); the probe side joins the BROADCAST 4 KB word table and
    never shuffles the probe relation — exactly the runtime-bloom
    join-pruning shape Spark itself injects, spelled portably.
    Reference parity: no sketch surface in the reference (SURVEY §2
    B.4 extension)."""
    pos_b = _blp_pos_sql("({a} ^ {b})", "DIV", "o_custkey")
    pos_p = _blp_pos_sql("({a} ^ {b})", "DIV", "c_custkey")
    jays = F.broadcast(
        spark.range(BLP_K).select(F.col("id").cast("int").alias("j"))
    )
    build = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
        .localCheckpoint(eager=True)  # read twice: filter build + truth
    )
    words = (
        build.crossJoin(jays)
        .selectExpr(f"{pos_b} AS pos")
        .selectExpr(
            "pos DIV 32 AS w", "CAST(pow(2, pos % 32) AS BIGINT) AS m"
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("word"))
    )
    probe = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .crossJoin(jays)
        .selectExpr("c_custkey", "c_nationkey", f"{pos_p} AS pos")
    )
    bits = (
        probe.selectExpr("c_custkey", "c_nationkey", "pos", "pos DIV 32 AS w")
        .join(F.broadcast(words), "w", "left")
        .selectExpr(
            "c_custkey",
            "c_nationkey",
            "COALESCE((word DIV CAST(pow(2, pos % 32) AS BIGINT)) % 2, 0) AS bit",
        )
    )
    verdicts = bits.groupBy("c_custkey").agg(
        F.min("c_nationkey").alias("nk"), F.min("bit").alias("maybe")
    )
    truth = build.selectExpr("o_custkey AS _k", "1 AS actual")
    return (
        verdicts.join(
            F.broadcast(truth), F.col("c_custkey") == F.col("_k"), "left"
        )
        .selectExpr("nk", "maybe", "COALESCE(actual, 0) AS actual")
        .groupBy(F.col("nk").cast("long").alias("nationkey"))
        .agg(
            F.count("*").cast("long").alias("n_cust"),
            F.sum("maybe").cast("long").alias("n_maybe"),
            F.sum("actual").cast("long").alias("n_actual"),
            F.sum(
                F.when((F.col("maybe") == 1) & (F.col("actual") == 0), 1)
                .otherwise(0)
            ).cast("long").alias("n_false_positive"),
        )
        .orderBy("nationkey")
    )
