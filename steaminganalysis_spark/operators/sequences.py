"""Event-sequence and time-series analytics (round 5): journey regex
matching (a MATCH_RECOGNIZE-lite) plus the windowed series diagnostics
a metrics platform layers on the same events — changepoints, diurnal
seasonality, autocorrelation, rolling OLS trend, rolling-median
despiking, and MAD robust outliers.

The reference's streaming job reduces each event to an independent
(date, key) contribution (App.scala:41-67); this family is what the
same platform asks NEXT: "did the user follow view→…→purchase",
"when did the metric regime shift", "is it trending or mean-
reverting", "which spikes are sensor glitches".

Scale posture (shared by the whole family):
- ``q_seq_pattern`` builds journeys at (user, day) grain, so per-group
  state is bounded by one day of one user's events — the journey
  string can never grow with corpus size. One shuffle on (user_id,
  day) with map-side partial collect; the regex scan is JVM codegen.
- Every series operator collapses the fact table to the (event_type,
  hour) rollup FIRST — windows then run over ~10³-row series, not the
  fact table, and computing several diagnostics together shares ONE
  fact scan + one aggregate shuffle. Frames are ROW-based over integer
  cents (bit-stable under any partitioning); float-touching outputs
  (ACF, slope) go through exact decimal(38,0) moment sums and the
  floor-ppm rounding convention.
- ``q_ts_outlier_mad`` is the one member that ranks RAW events (exact
  per-type sort); its documented unbounded-cardinality evolution is
  the approx-percentile sketch, not a plan rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import query, to_cents
from steaminganalysis_spark.sources import load

# One char per event type: journeys become compact strings a regex can
# scan. Applied identically in the oracle.
_CODE = "CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c' \
WHEN 'signup' THEN 's' WHEN 'purchase' THEN 'p' ELSE 'e' END"

# A conversion run: a view followed by a purchase with no intermediate
# purchase. Non-overlapping left-to-right matches — the same semantics
# in Java regex and RE2, because the pattern is a plain char class.
_FUNNEL = "v[^p]*p"


@query(
    "q_seq_pattern",
    oracle=f"""
    WITH coded AS (
      SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
             {_CODE} AS code, ts, event_id
      FROM events
    ),
    journeys AS (
      SELECT user_id, day,
             string_agg(code, '' ORDER BY ts, event_id) AS journey
      FROM coded GROUP BY 1, 2
    )
    SELECT user_id, day,
           CAST(length(journey) AS BIGINT) AS journey_len,
           CAST(len(regexp_extract_all(journey, '{_FUNNEL}')) AS BIGINT)
             AS n_conversions,
           len(regexp_extract_all(journey, '{_FUNNEL}')) > 0 AS converted
    FROM journeys
    """,
)
def seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: encode each user's ts-ordered daily event
    journey as a one-char-per-event string and count non-overlapping
    ``view …no-purchase… purchase`` conversion runs with a single regex
    scan. Spark has no MATCH_RECOGNIZE clause; journey-string + regex
    is the standard DataFrame re-expression for patterns without
    quantified backtracking, and keeps the whole match JVM-side (no
    UDF). Grouping at (user, day) bounds journey length at scale;
    ordering inside the aggregate is made deterministic by sorting
    (ts, event_id) structs — the unique-key tie-break convention."""
    ev = load(spark, sf_dir, "events")
    coded = ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.struct("ts", "event_id", F.expr(_CODE).alias("code")).alias("s"),
    )
    journeys = coded.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("s")), lambda s: s["code"]), ""
        ).alias("journey")
    )
    n_conv = F.size(F.regexp_extract_all("journey", F.lit(_FUNNEL), F.lit(0)))
    return journeys.select(
        "user_id",
        "day",
        F.length("journey").cast("long").alias("journey_len"),
        n_conv.cast("long").alias("n_conversions"),
        (n_conv > 0).alias("converted"),
    )


# Changepoint frames: compare the 3 hours strictly before a bucket with
# the bucket plus the 2 after it. Both frames must be FULL (3 rows) so
# series edges never emit partial-window noise. The shift rule is pure
# integer arithmetic: |delta| >= |before| / 2.
_N_BEFORE = 3
_N_AFTER = 3


@query(
    "q_ts_changepoint",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    framed AS (
      SELECT event_type, hour, cents,
             SUM(cents) OVER wb AS before_cents, COUNT(*) OVER wb AS n_before,
             SUM(cents) OVER wa AS after_cents,  COUNT(*) OVER wa AS n_after
      FROM hourly
      WINDOW wb AS (PARTITION BY event_type ORDER BY hour
                    ROWS BETWEEN {_N_BEFORE} PRECEDING AND 1 PRECEDING),
             wa AS (PARTITION BY event_type ORDER BY hour
                    ROWS BETWEEN CURRENT ROW AND {_N_AFTER - 1} FOLLOWING)
    )
    SELECT event_type, hour, cents,
           CAST(before_cents AS BIGINT) AS before_cents,
           CAST(after_cents AS BIGINT) AS after_cents,
           CAST(after_cents - before_cents AS BIGINT) AS delta_cents,
           abs(after_cents - before_cents) * 2 >= abs(before_cents) AS is_shift
    FROM framed
    WHERE n_before = {_N_BEFORE} AND n_after = {_N_AFTER}
    """,
)
def ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-shift changepoint detection: per event type, compare the
    integer-cents volume of the trailing {3h} frame against the leading
    {3h} frame at every observed hour and flag buckets where the jump
    is at least half the trailing level — the windowed-CUSUM shape
    behind metric regime-change alerts. The fact table collapses to
    (type, hour) grain before any window runs, so the window pass costs
    O(types × hours) regardless of event volume; frames are ROW-based
    over integer cents, bit-stable under any partitioning, and edge
    buckets with partial frames are excluded rather than emitted with
    understated sums."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
    ).agg(F.sum(to_cents(F.col("value"))).cast("long").alias("cents"))
    wb = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-_N_BEFORE, -1)
    )
    wa = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(0, _N_AFTER - 1)
    )
    framed = hourly.select(
        "event_type",
        "hour",
        "cents",
        F.sum("cents").over(wb).alias("before_cents"),
        F.count("*").over(wb).alias("n_before"),
        F.sum("cents").over(wa).alias("after_cents"),
        F.count("*").over(wa).alias("n_after"),
    )
    return (
        framed.filter(
            (F.col("n_before") == _N_BEFORE) & (F.col("n_after") == _N_AFTER)
        )
        .select(
            "event_type",
            "hour",
            "cents",
            "before_cents",
            "after_cents",
            (F.col("after_cents") - F.col("before_cents")).alias("delta_cents"),
            (
                F.abs(F.col("after_cents") - F.col("before_cents")) * 2
                >= F.abs(F.col("before_cents"))
            ).alias("is_shift"),
        )
    )


@query(
    "q_ts_seasonal_profile",
    oracle="""
    WITH hod AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, hod, n_events, cents,
           CAST((cents * 1000000) // SUM(cents) OVER (PARTITION BY event_type)
                AS BIGINT) AS share_ppm,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY cents DESC, hod) = 1 AS is_peak
    FROM hod
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal seasonality profile — the 'seasonal' term of a
    decomposition at hour-of-day grain: per event type, each of the 24
    buckets' event count, integer-cents volume, exact ppm share of the
    type's total, and a peak flag (deterministic hod tie-break). The
    fact table collapses to ≤ 24·|types| rows before the share window
    runs, so the profile costs one aggregate shuffle regardless of
    event volume; dividing a day's metric by this profile is the
    standard deseasonalization step feeding the changepoint detector
    upstream of it."""
    ev = load(spark, sf_dir, "events")
    hod = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hod")
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(to_cents(F.col("value"))).cast("long").alias("cents"),
    )
    wt = W.partitionBy("event_type")
    wr = W.partitionBy("event_type").orderBy(F.col("cents").desc(), "hod")
    return hod.select(
        "event_type",
        "hod",
        "n_events",
        "cents",
        F.sum("cents").over(wt).alias("total_cents"),
        (F.row_number().over(wr) == 1).alias("is_peak"),
    ).select(
        "event_type",
        "hod",
        "n_events",
        "cents",
        F.expr("(cents * 1000000) div total_cents").alias("share_ppm"),
        "is_peak",
    )


_ACF_LAGS = (1, 2, 3)


@query(
    "q_ts_autocorr",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, cents AS y, lg AS lag,
             LAG(cents, lg) OVER (PARTITION BY event_type, lg ORDER BY hour) AS x
      FROM hourly, unnest([{', '.join(str(l) for l in _ACF_LAGS)}]) AS t(lg)
    ),
    sums AS (
      SELECT event_type, CAST(lag AS BIGINT) AS lag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(*) AS DOUBLE) AS nd,
             CAST(CAST(SUM(x) AS HUGEINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS HUGEINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) AS HUGEINT) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) AS HUGEINT) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(y * y) AS HUGEINT) AS DOUBLE) AS syy
      FROM lagged WHERE x IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT event_type, lag, n,
           (FLOOR(((nd * sxy - sx * sy)
                   / NULLIF(sqrt((nd * sxx - sx * sx) * (nd * syy - sy * sy)), 0.0))
                  * 1000000.0 + 0.5) / 1000000.0) AS acf
    FROM sums
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1..3) of each event type's hourly
    integer-cents series — the diagnostic that separates trending from
    mean-reverting metrics and sizes the changepoint/seasonal windows
    upstream. Same moment-sketch discipline as ``q_agg_regression``:
    the lagged pairs reduce to EXACT integer sums (decimal(38,0) /
    HUGEINT, partition-order-free), the Pearson formula then runs on
    identical doubles on both engines (IEEE sqrt is correctly rounded,
    so it is bit-identical too), floored to ppm. One window pass per
    lag over the tiny (type, hour) table — at 100 TB the only
    fact-sized cost is the initial hourly rollup the whole ts family
    shares."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
    ).agg(F.sum(to_cents(F.col("value"))).cast("long").alias("cents"))
    w = W.partitionBy("event_type").orderBy("hour")
    with_lags = hourly.select(
        "event_type",
        F.col("cents").alias("y"),
        *[F.lag("cents", L).over(w).alias(f"x{L}") for L in _ACF_LAGS],
    )
    lagged = with_lags.select(
        "event_type",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).cast("long").alias("lag"),
                        F.col(f"x{L}").alias("x"),
                    )
                    for L in _ACF_LAGS
                ]
            )
        ).alias("p"),
    ).select("event_type", F.col("p.lag").alias("lag"), F.col("p.x").alias("x"), "y")
    d38 = "decimal(38,0)"
    sums = (
        lagged.filter(F.col("x").isNotNull())
        .groupBy("event_type", "lag")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast(d38)).cast("double").alias("sx"),
            F.sum(F.col("y").cast(d38)).cast("double").alias("sy"),
            F.sum((F.col("x") * F.col("y")).cast(d38)).cast("double").alias("sxy"),
            F.sum((F.col("x") * F.col("x")).cast(d38)).cast("double").alias("sxx"),
            F.sum((F.col("y") * F.col("y")).cast(d38)).cast("double").alias("syy"),
        )
    )
    return sums.select(
        "event_type",
        "lag",
        "n",
        F.expr(
            "FLOOR(((CAST(n AS DOUBLE) * sxy - sx * sy)"
            " / NULLIF(sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)"
            "               * (CAST(n AS DOUBLE) * syy - sy * sy)), 0.0D))"
            " * 1000000.0D + 0.5D) / 1000000.0D"
        ).alias("acf"),
    )


_SLOPE_FRAME = 6  # trailing hours per rolling fit (current + 5 back)


@query(
    "q_window_slope",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             CAST(epoch(date_trunc('hour', ts)) // 3600 AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM events GROUP BY 1, 2, 3
    ),
    framed AS (
      SELECT event_type, hour,
             COUNT(*) OVER w AS n,
             CAST(CAST(SUM(x) OVER w AS HUGEINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) OVER w AS HUGEINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) OVER w AS HUGEINT) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) OVER w AS HUGEINT) AS DOUBLE) AS sxx
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN {_SLOPE_FRAME - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, hour,
           (FLOOR(((CAST(n AS DOUBLE) * sxy - sx * sy)
                   / (CAST(n AS DOUBLE) * sxx - sx * sx))
                  * 1000000.0 + 0.5) / 1000000.0) AS slope_cents_per_hour
    FROM framed
    WHERE n = {_SLOPE_FRAME}
    """,
)
def window_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling OLS slope — the windowed sibling of ``q_agg_regression``
    and the quantitative form of a trend/momentum indicator: at every
    observed hour, the least-squares slope (cents per hour) of the
    trailing {6}-bucket frame, from exact integer moment sums
    accumulated INSIDE the window frame (n, Σx, Σy, Σxy, Σx² — the
    mergeable moment sketch, so the same expression works as a window,
    a group-by, or a streaming accumulator). Partial frames at series
    heads are excluded, the closed form runs on identical doubles both
    engines, floor-ppm rounding. The fact table collapses to (type,
    hour) grain first; x is the exact epoch-hour BIGINT so frames are
    shift-covariant and the slope unit is physical."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
        (F.unix_timestamp(F.date_trunc("hour", "ts")) / 3600)
        .cast("long")
        .alias("x"),
    ).agg(F.sum(to_cents(F.col("value"))).cast("long").alias("y"))
    w = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-(_SLOPE_FRAME - 1), 0)
    )
    d38 = "decimal(38,0)"
    framed = hourly.select(
        "event_type",
        "hour",
        F.count("*").over(w).alias("n"),
        F.sum(F.col("x").cast(d38)).over(w).cast("double").alias("sx"),
        F.sum(F.col("y").cast(d38)).over(w).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(d38)).over(w).cast("double").alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).over(w).cast("double").alias("sxx"),
    )
    return framed.filter(F.col("n") == _SLOPE_FRAME).select(
        "event_type",
        "hour",
        F.expr(
            "FLOOR(((CAST(n AS DOUBLE) * sxy - sx * sy)"
            " / (CAST(n AS DOUBLE) * sxx - sx * sx))"
            " * 1000000.0D + 0.5D) / 1000000.0D"
        ).alias("slope_cents_per_hour"),
    )


_MED_FRAME = 5  # centered rolling-median frame (2 back .. 2 ahead)


@query(
    "q_window_median",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    framed AS (
      SELECT event_type, hour, cents,
             list(cents) OVER w AS frame,
             COUNT(*) OVER w AS n
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN {_MED_FRAME // 2} PRECEDING
                            AND {_MED_FRAME // 2} FOLLOWING)
    )
    SELECT event_type, hour, cents,
           CAST(list_sort(frame)[{_MED_FRAME // 2 + 1}] AS BIGINT) AS median_cents,
           CAST(cents - list_sort(frame)[{_MED_FRAME // 2 + 1}] AS BIGINT)
             AS residual_cents
    FROM framed WHERE n = {_MED_FRAME}
    """,
)
def window_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN filter — the robust despiker a mean-based rolling
    window can't be (one sensor glitch drags a mean for the whole
    frame; the median ignores it): per event type, the exact median of
    the centered {5}-bucket frame plus the residual that feeds outlier
    rules. No Spark built-in computes an exact windowed median, so the
    frame is materialized with collect_list OVER the window and the
    middle element picked from the sorted array — O(frame log frame)
    per row with frame=5, a constant, and the array lives only inside
    the projection (never shuffled). Partial edge frames excluded;
    everything integer cents, so sorted-pick is bit-exact on any
    engine. Runs on the shared (type, hour) rollup like the rest of
    the ts family."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
    ).agg(F.sum(to_cents(F.col("value"))).cast("long").alias("cents"))
    half = _MED_FRAME // 2
    w = W.partitionBy("event_type").orderBy("hour").rowsBetween(-half, half)
    framed = hourly.select(
        "event_type",
        "hour",
        "cents",
        F.collect_list("cents").over(w).alias("frame"),
        F.count("*").over(w).alias("n"),
    )
    med = F.element_at(F.array_sort("frame"), half + 1)
    return framed.filter(F.col("n") == _MED_FRAME).select(
        "event_type",
        "hour",
        "cents",
        med.cast("long").alias("median_cents"),
        (F.col("cents") - med).cast("long").alias("residual_cents"),
    )


@query(
    "q_ts_outlier_mad",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM ev
    ),
    med AS (
      SELECT event_type, n, cents AS med_cents
      FROM ranked WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT e.event_type, e.cents, abs(e.cents - m.med_cents) AS d,
             m.med_cents, m.n
      FROM ev e JOIN med m ON e.event_type = m.event_type
    ),
    dranked AS (
      SELECT event_type, d, med_cents, n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
      FROM dev
    ),
    mad AS (
      SELECT event_type, med_cents, n, d AS mad_cents
      FROM dranked WHERE rn = (n + 1) // 2
    )
    SELECT v.event_type,
           CAST(a.n AS BIGINT) AS n,
           a.med_cents, a.mad_cents,
           CAST(COUNT(*) FILTER (WHERE abs(v.cents - a.med_cents)
                                       > 3 * a.mad_cents) AS BIGINT) AS n_outliers
    FROM dev v JOIN mad a ON v.event_type = a.event_type
    GROUP BY 1, 2, 3, 4
    """,
)
def ts_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection by median absolute deviation — the
    estimator a contaminated stream can't fool (mean/σ z-scores move
    with the very outliers they hunt, ``q_anomaly_zscore``'s documented
    limitation; the MAD has a 50% breakdown point): per event type the
    EXACT lower-middle median of integer cents, the exact MAD, and the
    count of points beyond the 3×MAD fence. Medians are discrete
    row_number picks (never interpolated floats), spelled identically
    in the oracle so even-count semantics can't diverge. Two ranking
    passes partitioned by event_type — exact per-group sort; at a
    cardinality where a single group outgrows one reducer the
    documented evolution is the approx-percentile sketch
    (``q_agg_approx_percentile``), not a plan rewrite."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", to_cents(F.col("value")).alias("cents")
    )
    wr = W.partitionBy("event_type").orderBy("cents")
    wc = W.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "cents",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type", "n", F.col("cents").alias("med_cents")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "cents",
        "med_cents",
        "n",
        F.abs(F.col("cents") - F.col("med_cents")).alias("d"),
    )
    wd = W.partitionBy("event_type").orderBy("d")
    mad = (
        dev.select(
            "event_type", "med_cents", "n", "d", F.row_number().over(wd).alias("rn")
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("d").alias("mad_cents"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "n", "med_cents", "mad_cents")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col("cents") - F.col("med_cents"))
                    > 3 * F.col("mad_cents"),
                    1,
                )
            ).alias("n_outliers")
        )
        .select("event_type", "n", "med_cents", "mad_cents", "n_outliers")
    )


_DECAY_FRAME = 16  # events per decayed frame (current + 15 back)
_DECAY_TOP = 1 << (_DECAY_FRAME - 1)  # weight of the current event: 2^15


@query(
    "q_ts_decayed_sum",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT a.user_id, a.event_id, a.cents,
           CAST(SUM(b.cents *
                    CAST(POWER(2, {_DECAY_FRAME - 1} - (a.rn - b.rn)) AS BIGINT))
                AS BIGINT) AS decayed_scaled
    FROM e a JOIN e b
      ON b.user_id = a.user_id AND a.rn - b.rn BETWEEN 0 AND {_DECAY_FRAME - 1}
    GROUP BY a.user_id, a.event_id, a.cents
    """,
)
def ts_decayed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed running sum (half-life = one event) over
    each user's ts-ordered event stream, truncated to the trailing
    {16}-event frame: the recency-weighted activity score behind
    fraud/engagement features, as EWMA-style state without
    ``applyInPandas``. The emitted value is scaled by 2^15 so every
    weight 2^(15-d) is an INTEGER — the whole computation is exact
    BIGINT arithmetic, bit-identical on any engine or partitioning
    (a float EWMA would be summation-order-sensitive). Truncation is
    what makes it a WINDOW: untruncated EWMA is a sequential
    recurrence; the 16-event frame loses at most one part in 2^16 of
    the mass and turns it into one row-frame window pass.

    Plan: one shuffle on user_id; collect_list over the row frame
    (≤16 longs per row, frame order = (ts, event_id) order) folded by
    a JVM higher-order ``aggregate`` with integer halving — no UDF,
    no second exchange. The oracle computes the same integers via a
    banded rn self-join — two different algorithms, one exact answer.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", to_cents(F.col("value")).alias("cents")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_DECAY_FRAME - 1), 0)
    )
    # coalesce BEFORE collect_list: collect_list silently drops NULLs,
    # which would shift every later element's weight by one halving; the
    # oracle's banded self-join keeps the NULL row's rn slot and SUM
    # ignores the NULL product — i.e. the slot contributes 0 but still
    # occupies a frame position (ADVICE r6).
    frame = F.collect_list(F.coalesce(F.col("cents"), F.lit(0))).over(w)
    fold = (
        f"aggregate(reverse(frame), "
        f"named_struct('s', CAST(0 AS BIGINT), 'w', CAST({_DECAY_TOP} AS BIGINT)), "
        f"(acc, x) -> named_struct('s', acc.s + x * acc.w, 'w', acc.w div 2), "
        f"acc -> acc.s)"
    )
    return (
        ev.select("user_id", "event_id", "cents", frame.alias("frame"))
        .selectExpr("user_id", "event_id", "cents", f"{fold} AS decayed_scaled")
    )


@query(
    "q_ts_gapfill_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR(epoch(ts) / 3600.0) AS BIGINT) AS h,
             CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(min(h), max(h))) AS h
      FROM hourly GROUP BY event_type
    ),
    joined AS (
      SELECT g.event_type, g.h, hr.cents
      FROM grid g LEFT JOIN hourly hr
        ON hr.event_type = g.event_type AND hr.h = g.h
    ),
    bounded AS (
      SELECT event_type, h, cents,
             last_value(cents IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
               OVER wp AS ph,
             first_value(cents IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
               OVER wn AS nh
      FROM joined
      WINDOW wp AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wn AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h,
           CAST(CASE WHEN cents IS NOT NULL THEN cents
                ELSE pv + CAST(FLOOR(
                       CAST((nv - pv) * (h - ph) AS DOUBLE)
                       / CAST(nh - ph AS DOUBLE) + 0.5) AS BIGINT)
                END AS BIGINT) AS cents,
           cents IS NULL AS interpolated
    FROM bounded
    """,
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap fill with LINEAR interpolation (the companion to
    ``q_window_locf``'s step fill): the hourly cents series per event
    type is completed to a dense hour grid, and every missing bucket
    gets the straight line between its neighboring observed buckets —
    ``pv + round((nv-pv)·(h-ph)/(nh-ph))`` with the engine's
    floor(x+0.5) convention on an exact small-integer ratio, so both
    engines land the identical BIGINT. Grid endpoints are the observed
    min/max hour per type, so every gap is interior (both neighbors
    exist by construction).

    Plan: fact table collapses to (type, hour) FIRST; the grid is a
    per-type ``sequence`` explode over the tiny bounds row; gap fill
    is two IGNORE-NULLS window passes sharing one event_type
    partitioning — O(types × hours) everywhere, fact volume touched
    exactly once."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / F.lit(3600.0)).cast("long").alias("h"),
    ).agg(F.sum(to_cents(F.col("value"))).cast("long").alias("cents"))
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select(
            "event_type", F.explode(F.sequence("lo", "hi")).alias("h")
        )
    )
    joined = grid.join(hourly, ["event_type", "h"], "left")
    wp = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wn = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(1, W.unboundedFollowing)
    )
    known_h = F.when(F.col("cents").isNotNull(), F.col("h"))
    bounded = joined.select(
        "event_type",
        "h",
        "cents",
        F.last("cents", ignorenulls=True).over(wp).alias("pv"),
        F.last(known_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("cents", ignorenulls=True).over(wn).alias("nv"),
        F.first(known_h, ignorenulls=True).over(wn).alias("nh"),
    )
    interp = F.col("pv") + F.floor(
        ((F.col("nv") - F.col("pv")) * (F.col("h") - F.col("ph"))).cast("double")
        / (F.col("nh") - F.col("ph")).cast("double")
        + F.lit(0.5)
    ).cast("long")
    return bounded.select(
        "event_type",
        "h",
        F.when(F.col("cents").isNotNull(), F.col("cents"))
        .otherwise(interp)
        .cast("long")
        .alias("cents"),
        F.col("cents").isNull().alias("interpolated"),
    )
