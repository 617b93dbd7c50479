"""Query registry: the single source of truth for the driver contract.

Every operator in SURVEY.md §2 registers here as a named query — a
callable ``(spark, sf_dir) -> DataFrame`` — optionally paired with an
ANSI-SQL oracle string that DuckDB runs over the same parquet tables.
``__spark_entry__.py`` simply re-exports these dicts.

Determinism conventions (FIXTURES.md §3), applied by every registered
query AND its oracle:
- alias every computed column identically on both sides;
- money/double sums go through exact decimal accumulation then a final
  cast to double (``dsum`` helper) so summation order cannot perturb
  the value hash;
- calendar buckets are emitted as strings (``yyyy-MM-dd`` etc.), never
  raw timestamps, so session-timezone settings cannot perturb them;
- top-k / ranking queries always break ties on a unique key;
- array-valued aggregates are sorted and joined to a string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["QUERIES", "ORACLE", "query", "dsum", "to_cents", "SQL_DSUM", "collect_queries"]

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB SQL twin
    (omit for genuinely non-SQL-expressible ops → rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def to_cents(col: Column, scale: int = 2) -> Column:
    """The engine's ONE fixed-point conversion: ``floor(x·10^s + 0.5)``
    → long. Every operator that needs exact integer money/value
    arithmetic (``dsum``, rolling-window sums, z-score stats) derives
    its cents through this helper so the rounding convention — and its
    DuckDB twin inside ``SQL_DSUM`` and per-query oracles — can never
    drift between call sites."""
    m = 10**scale
    return F.floor(col.cast("double") * F.lit(float(m)) + F.lit(0.5)).cast("long")


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-insensitive exact sum of a fixed-scale double column.

    Each value is converted to integer "cents" with cheap IEEE ops —
    ``floor(x·10^scale + 0.5)`` → long — then accumulated as
    ``decimal(38,0)``: the integer sum is exact regardless of
    partitioning/summation order, and the decimal accumulator rides
    Spark's compact-long fast path while PROMOTING (never silently
    wrapping, unlike a long sum) past 2^63 — which a global sum over
    ~10^12 rows at scale 6 actually reaches. ~2.3× faster than the
    previous decimal(30,scale)-cast sum and within ~1.5× of a plain
    double sum at sf0.1 (SCALE.md), with the same bit-exact value-hash
    reproducibility. The DuckDB twin is ``SQL_DSUM`` (identical float
    ops → identical longs → exact integer sum on both sides).

    Correct for |x| < 2^63/10^scale per value and inputs with ≤scale
    true decimal digits (floor+0.5 = unambiguous nearest integer: a
    tie would need an impossible extra decimal digit).

    ``SPARK_GRAFT_DOUBLE_SUMS=1`` (bench-only mode, read at plan-build
    time) swaps in a plain double SUM to measure the exact-accumulation
    tax (SCALE.md); it intentionally breaks value-hash reproducibility,
    so the oracle harness and the driver must never run with it set."""
    import os

    if os.environ.get("SPARK_GRAFT_DOUBLE_SUMS") == "1":
        return F.sum(col)
    m = 10**scale
    cents = to_cents(col, scale).cast("decimal(38,0)")
    return F.sum(cents).cast("double") / F.lit(float(m))


def SQL_DSUM(expr: str, scale: int = 2) -> str:
    """DuckDB twin of ``dsum`` — identical float ops in the same order,
    fully parenthesized (it ends in a division, and callers embed it in
    larger expressions)."""
    m = 10**scale
    return (
        f"(CAST(SUM(CAST(FLOOR(CAST(({expr}) AS DOUBLE) * {m}.0 + 0.5) AS BIGINT))"
        f" AS DOUBLE) / {m}.0)"
    )


# The driver's per-round correctness gate verifies the first ~50
# registered queries in REGISTRATION ORDER, so the window is pinned as
# an explicit key list (key-level, not module-import-level: round 3
# needs three keys re-verified out of otherwise-green modules because
# their implementations changed AFTER their round-1 green rows —
# VERDICT.md r2 order #2).
#
# History: round 1 verified aggregates/functions_pack/llm/ann
# (CORRECTNESS_r01.json, 50/50 green), round 2 verified joins/tpch/
# windows/relational[:10] (CORRECTNESS_r02.json, 49/50 — the q12 red
# was the HUGEINT oracle-type bug, fixed).
#
# Measured module sizes (re-measure with the import counter below
# before every rotation — never eyeball): joins 12, tpch 21,
# windows 7, relational 14, sql_surface 11 (incl. the new
# q_sql_group_by_all + q_pandas_api, deferred to round 4), udfs 9 (incl. the new
# q_udf_applyinarrow, deferred to round 4), storage 8 (incl.
# the new q_scan_xml + q_zorder_layout, deferred to round 4),
# reshape 4, pipeline 12 (incl. the new q_corpus_pipeline, deferred
# to round 4), streaming_queries 10 (incl. the new flagship
# replay; stream-static join + append-watermark deferred to round 4),
# multimodal 4, aggregates 14, functions_pack 13 (incl. the new
# q_fn_try, deferred to round 4), llm 23, ann 3, extras 24 (incl.
# the new q_ts_resample + q_scd2_from_cdc, deferred to round 4)
# (189 total).
#
# Remaining never-driver-checked after round 3 (for rounds 4-5):
# relational's last 4 set-op/sort keys, extras (24), ann (3), the
# keys deferred below, plus re-checks of any module edited since its
# green round.
#
# ROUND-4 WINDOW CANDIDATE (~50, finalize next round after reading
# CORRECTNESS_r03): relational tail 4 (q_set_except,
# q_set_intersect_all, q_set_except_all, q_sort_nulls) + extras 24 +
# ann 3 + round-3 deferred 11 (q_agg_approx_percentile, q_datagen,
# q_stream_neardup, q_multimodal_frame_sample, q_scan_xml,
# q_zorder_layout, q_stream_static_join, q_sql_group_by_all,
# q_fn_try, q_corpus_pipeline + q_udf_applyinarrow) + q_ts_resample,
# q_scd2_from_cdc, q_pandas_api, q_stream_append_watermark = 46;
# top up with llm re-checks (q_dedup_near, q_dedup_containment,
# q_sim_threshold_pairs, q_dedup_clusters — staging.stage refactor
# touched them in round 3). Round 5: llm/aggregates/functions_pack
# remainder.
ROUND3_WINDOW = [
    # Stale-stamp re-verifications: these three were green in round 1
    # but their implementations changed during round 2 (llm.py commit
    # 3959e06, aggregates' dsum rework) — their stamps are stale.
    "q_daily_rollup",
    "q_dedup_ngram_jaccard",
    "q_text_entropy",
    # Round 2's ONE red row: the HUGEINT oracle-type bug, fixed this
    # round — must re-enter the window so CORRECTNESS_r03 records the
    # green (VERDICT r2 order #1's done-condition).
    "q_tpch_q12",
    # New this round: the reference's actual pipeline end-to-end
    # (stream parse → classify → rollup → idempotent KV), hash-checked.
    "q_stream_flagship_replay",
    # sql_surface (9)
    "q_subquery_scalar", "q_subquery_in_correlated", "q_cte", "q_fn_null",
    "q_agg_minmax_by", "q_fn_explode", "q_fn_struct", "q_text_levenshtein",
    "q_subquery_not_exists",
    # udfs (8)
    "q_udf_scalar", "q_udf_pandas", "q_udaf_grouped", "q_udtf_applyinpandas",
    "q_udf_sql_registered", "q_udf_arrow", "q_udtf_python", "q_udf_mapinarrow",
    # storage (6)
    "q_scan_csv", "q_scan_orc", "q_scan_partitioned", "q_join_bucketed",
    "q_scan_binary", "q_compact_small_files",
    # reshape (3 of 4 — q_agg_approx_percentile is rows-only, deferred
    # to round 4 where the weaker rows-only driver check costs least)
    "q_pivot", "q_unpivot", "q_agg_percentile",
    # pipeline (11)
    "q_sample_hash", "q_dedup_latest_per_key", "q_sessionize",
    "q_retention_cohorts", "q_funnel", "q_histogram", "q_dq_checks",
    "q_train_test_split", "q_sample_stratified", "q_data_mix",
    "q_text_pii_scrub",
    # streaming_queries (5 of 7 — q_datagen and q_stream_neardup are
    # rows-only, deferred to round 4)
    "q_stream_tumbling_daily", "q_window_sliding", "q_session_window",
    "q_stream_dedup", "q_stream_stream_join",
    # multimodal (3 of 4; rows-only by design — binary synthesis.
    # q_multimodal_frame_sample deferred to round 4 to make room for
    # the q_tpch_q12 re-verification; decode/image/audio still give
    # the modality set driver rows)
    "q_multimodal_decode", "q_multimodal_image_features",
    "q_multimodal_audio_features",
]


def collect_queries() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import every operator module (side effect: registration), then
    reorder so ROUND3_WINDOW occupies the first 50 registration slots
    — the slice the driver's correctness gate checks this round."""
    from steaminganalysis_spark.operators import joins  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import tpch  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import windows  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import relational  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import sql_surface  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import udfs  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import storage  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import reshape  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import pipeline  # noqa: F401  isort: skip
    from steaminganalysis_spark.streaming import queries as streaming_queries  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import multimodal  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import aggregates  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import functions_pack  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import llm  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import ann  # noqa: F401  isort: skip
    from steaminganalysis_spark.operators import extras  # noqa: F401  isort: skip

    missing = [k for k in ROUND3_WINDOW if k not in QUERIES]
    if missing:
        raise RuntimeError(f"ROUND3_WINDOW names unregistered queries: {missing}")
    window = set(ROUND3_WINDOW)
    ordered = ROUND3_WINDOW + [k for k in QUERIES if k not in window]
    reordered = {k: QUERIES[k] for k in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
    reordered_oracle = {k: ORACLE[k] for k in ordered if k in ORACLE}
    ORACLE.clear()
    ORACLE.update(reordered_oracle)
    return QUERIES, ORACLE
