"""The sqllogictest-style corpus: every registered query must match its
DuckDB oracle exactly at the correctness scale factor (sf0.01 — the
same SF the driver uses)."""

from __future__ import annotations

import pytest

from steaminganalysis_spark.registry import collect_queries
from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_harness import compare_query

QUERIES, ORACLE = collect_queries()

# r18 (VERDICT r17 order #1): driver-observable runs sweep the
# representative subset; the whole registry runs with
# SPARK_GRAFT_FULL_TESTS=1 (freeze protocol) — see tests/fast_subset.py.
from tests.fast_subset import FULL, SKIP_REASON, fast_sweep_keys

_FAST = fast_sweep_keys()


def _gated(names):
    return [
        n
        if (FULL or n in _FAST)
        else pytest.param(n, marks=pytest.mark.skip(reason=SKIP_REASON))
        for n in names
    ]


@pytest.mark.parametrize("name", _gated(sorted(QUERIES)))
def test_query_matches_oracle(spark, name):
    problems = compare_query(spark, name, SF_DIR_CORRECTNESS, QUERIES, ORACLE)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"day", "total", "success", "fee"}


# Every rows-only query must be one we deliberately exempted, with the
# reason inline. Module-level so the round-rotation closure tests
# (tests/test_oracle_types.py) can import it.
ROWS_ONLY_DOCUMENTED = {
        "q_agg_approx_distinct",  # HLL estimate
        "q_udtf_applyinpandas",  # float variance summation order
        "q_dedup_near",  # MinHash probabilistic
        "q_dedup_simhash",  # engine-specific 64-bit hash
        "q_sim_ann_lsh",  # ANN recall probabilistic
        "q_sim_topk_arrow",  # numpy sum order; equality-tested vs q_sim_topk
        "q_text_heavy_hitters",  # candidate recall heuristic; equality-tested vs exact
        "q_dedup_clusters",  # iterative label propagation; equality-tested vs union-find
        "q_sim_ann_ivf",  # ANN recall probabilistic
        "q_sim_ann_pq",  # PQ shortlist recall probabilistic (recall-tested)
        "q_sim_ann_ivfpq",  # IVF routing + PQ shortlist, recall-tested
        "q_stream_neardup",  # xxhash64 LSH signatures; equality-tested vs batch candidates
        "q_agg_approx_percentile",  # sketch estimate
        "q_agg_hll_sketch",  # DataSketches estimate (tolerance-tested)
        "q_multimodal_decode",  # binary payload synthesis not SQL-expressible
        "q_multimodal_image_features",  # binary synthesis not SQL-expressible
        "q_multimodal_frame_sample",  # binary synthesis not SQL-expressible
        "q_multimodal_resize",  # binary synthesis not SQL-expressible; header/dims/checksum pinned
        "q_multimodal_audio_features",  # binary synthesis not SQL-expressible
        "q_scan_binary",  # binaryFile source over a generated dir; bytes hash-verified in tests
        "q_compact_small_files",  # file-layout maintenance op; invariants in the result row
        "q_zorder_layout",  # file-layout op; preservation + locality invariants in the result row
        "q_cluster_incremental",  # file-layout op; base-untouched/amplification/idempotence invariants in the result row (r11)
        "q_datagen",  # randomized generator; schema+domain-tested
        "q_bpe_train",  # iterative merge loop; equality-tested vs Python BPE
        "q_partition_overwrite_dynamic",  # write-path layout op; invariants in the result row
        "q_agg_cms_sketch",  # sketch internals; linearity + bound invariants in the result row
        "q_bpe_encode",  # applies the iterative trainer's merges; equality-tested vs Python encode
        "q_emb_pca_power",  # float summation order; cosine-equivalence vs numpy pinned
        "q_scan_schema_evolution",  # reads scratch dirs it writes; invariants in the result row
        "q_agg_bloom",  # xxhash64 bit patterns Spark-specific; FN=0 + FP bound pinned
        "q_cluster_kmeans",  # float centroids; assignment equality vs numpy pinned
        "q_multimodal_phash",  # binary synthesis not SQL-expressible; brute-force completeness pinned
        "q_emb_pca_topk",  # float summation order; per-component cosine vs numpy pinned
        "q_stream_ann_index",  # k-means floats; stream≡batch assignment equality pinned
}


def test_every_query_has_oracle_or_is_documented():
    rows_only = set(QUERIES) - set(ORACLE)
    documented = ROWS_ONLY_DOCUMENTED
    assert rows_only <= documented, f"undocumented rows-only queries: {rows_only - documented}"
