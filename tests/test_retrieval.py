"""Retrieval scoring (operators/retrieval.py): Python-reference
equivalence and plan shape — value equality vs SQL is covered by the
oracle-parity sweep."""

from __future__ import annotations

from steaminganalysis_spark.registry import collect_queries

QUERIES, ORACLE = collect_queries()
SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bm25_matches_python_reference(spark):
    """The exact-integer BM25 must equal a pure-Python recompute of
    the same rational formula (odds idf in ppm, k1=6/5, b=3/4 cleared
    to BIGINT arithmetic) — pinning the algebra independently of both
    engines' SQL."""
    import pandas as pd

    from steaminganalysis_spark.operators.retrieval import (
        BM25_TERMS,
        BM25_TOPK,
    )

    got = [
        (r.doc_id, r.doc_len, r.score_ppm)
        for r in QUERIES["q_text_bm25"](spark, SF).collect()
    ]
    docs = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]]
    toks = {d: t.split(" ") for d, t in zip(docs["doc_id"], docs["text"])}
    n = len(toks)
    total = sum(len(ws) for ws in toks.values())
    df = {
        term: sum(1 for ws in toks.values() if term in ws)
        for term in BM25_TERMS
    }
    rows = []
    for d, ws in toks.items():
        dl = len(ws)
        score = 0
        hit = False
        for term in BM25_TERMS:
            tf = ws.count(term)
            if tf == 0:
                continue
            hit = True
            idf_ppm = ((2 * n - 2 * df[term] + 1) * 1000000) // (
                2 * df[term] + 1
            )
            score += (idf_ppm * tf * 44 * total) // (
                20 * tf * total + 6 * total + 18 * dl * n
            )
        if hit:
            rows.append((d, dl, score))
    rows.sort(key=lambda r: (-r[2], r[0]))
    assert got == rows[:BM25_TOPK]


def test_bm25_topk_is_heap_not_global_sort(spark):
    """The top-K must compile to TakeOrderedAndProject (per-task K-row
    heap) — a global Sort over the scored set would be the wrong plan
    at corpus scale."""
    plan = _plan(QUERIES["q_text_bm25"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_knn_classify_matches_numpy_reference(spark):
    """The kNN majority vote must equal a NumPy recompute of the same
    integer pipeline (milli-quantize, squared L2, rank ties on train
    id, vote ties on smaller label)."""
    import numpy as np
    import pandas as pd

    from steaminganalysis_spark.operators.retrieval import (
        KNN_K,
        KNN_TEST_MOD,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    vecs = {
        int(r.vec_id): (
            np.floor(np.asarray(r.embedding, dtype=np.float64) * 1000.0 + 0.5)
            .astype(np.int64)
        )
        for r in emb.itertuples()
    }
    labels = dict(zip(emb["vec_id"].astype(int), emb["label"].astype(int)))
    test_ids = sorted(v for v in vecs if v % KNN_TEST_MOD == 0)
    train_ids = sorted(v for v in vecs if v % KNN_TEST_MOD != 0)
    expect = {}
    for t in test_ids:
        dists = sorted(
            (int(((vecs[t] - vecs[r]) ** 2).sum()), r) for r in train_ids
        )
        votes: dict[int, int] = {}
        for _, r in dists[:KNN_K]:
            votes[labels[r]] = votes.get(labels[r], 0) + 1
        pred, n = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        expect[t] = (labels[t], pred, n)
    got = {
        r.vec_id: (r.true_label, r.pred_label, r.n_votes)
        for r in QUERIES["q_emb_knn_classify"](spark, SF).collect()
    }
    assert got == expect


def test_knn_classify_broadcasts_test_side(spark):
    """The held-out slice is the broadcast side; the labeled corpus
    must never shuffle for the distance pass, and the per-query top-k
    must be a WindowGroupLimit, not a global sort."""
    plan = (
        QUERIES["q_emb_knn_classify"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "WindowGroupLimit" in plan


def test_hybrid_rrf_plan_topk_heaps_and_fusion_math(spark):
    """q_retrieval_hybrid_rrf: both candidate lists end in
    TakeOrderedAndProject (per-task heaps — no global sort of the
    corpus ever happens), and the fused score is exactly the
    RRF formula recomputed from the emitted ranks."""
    df = QUERIES["q_retrieval_hybrid_rrf"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("TakeOrderedAndProject") >= 2
    from steaminganalysis_spark.operators.retrieval import RRF_K

    rows = df.collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        expect = 0
        if r.lex_rank is not None:
            expect += 1000000 // (RRF_K + r.lex_rank)
        if r.sem_rank is not None:
            expect += 1000000 // (RRF_K + r.sem_rank)
        assert r.rrf_ppm == expect, r
    # fused order is (rrf desc, doc_id)
    key = [(-r.rrf_ppm, r.doc_id) for r in rows]
    assert key == sorted(key)


def test_mmr_matches_python_greedy_and_diversifies(spark):
    """Independent reconstruction of q_retrieval_mmr: quantize the
    embeddings in numpy (same floor(x·1000+0.5)), run the same integer
    greedy in plain Python, and require the identical (rank, doc_id)
    sequence; then certify the key is non-vacuous — the diversified
    set must differ from the plain relevance top-K — and that the pool
    pass compiles to TakeOrderedAndProject (per-task heap; the corpus
    is never globally sorted)."""
    import numpy as np

    from steaminganalysis_spark.operators.retrieval import (
        MMR_DIV_W,
        MMR_POOL,
        MMR_QUERY_VEC,
        MMR_REL_W,
        MMR_TOPK,
    )

    df = QUERIES["q_retrieval_mmr"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {
        r.vec_id: np.floor(
            np.asarray(r.embedding, dtype=np.float64) * 1000.0 + 0.5
        ).astype(np.int64)
        for r in emb
    }
    qv = vecs[MMR_QUERY_VEC]
    d2q = {
        i: int(((v - qv) ** 2).sum())
        for i, v in vecs.items()
        if i != MMR_QUERY_VEC
    }
    pool = sorted(d2q, key=lambda i: (d2q[i], i))[:MMR_POOL]
    remaining = set(pool)
    first = min(remaining, key=lambda i: (d2q[i], i))
    selected = [first]
    remaining.discard(first)
    while remaining and len(selected) < MMR_TOPK:
        best = max(
            remaining,
            key=lambda i: (
                MMR_DIV_W
                * min(int(((vecs[i] - vecs[s]) ** 2).sum()) for s in selected)
                - MMR_REL_W * d2q[i],
                -i,
            ),
        )
        selected.append(best)
        remaining.discard(best)

    rows = df.collect()
    assert [(r.rank, r.doc_id) for r in rows] == [
        (k + 1, doc) for k, doc in enumerate(selected)
    ]
    assert [r.d2q for r in rows] == [d2q[i] for i in selected]
    # non-vacuous: diversification actually changed the answer
    assert selected != pool[:MMR_TOPK]


def test_retrieval_chunked_spans_contain_terms_and_postings_prefiltered(spark):
    """q_retrieval_chunked: (a) every returned span, re-extracted from
    the raw document via (start_char, 120), contains at least one
    probe term — the span-addressing composition actually points at
    relevant text; (b) chunk-grain df ≥ doc-grain df can differ — the
    ranking is genuinely chunk-level: at least one returned doc_id has
    multiple distinct chunks scored in the full result (term-dense
    spans separate); (c) plan — the token explode is filtered to the
    probe terms before any exchange (no corpus-sized shuffle)."""
    from pyspark.sql import functions as F

    from steaminganalysis_spark.operators.retrieval import BM25_TERMS
    from steaminganalysis_spark.plans import physical_plan

    sf = "/root/testdata/sf0.001"
    df = QUERIES["q_retrieval_chunked"](spark, sf)
    rows = df.collect()
    assert rows
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        span = docs[r.doc_id][r.start_char - 1 : r.start_char - 1 + 120]
        assert any(t in span for t in BM25_TERMS), (r, span)
    plan = physical_plan(df)
    # the probe-term filter sits below the first exchange: the plan's
    # filter on `w` mentions the literal terms
    assert any(t in plan for t in BM25_TERMS)


def test_retrieval_eval_python_replay_and_bounds(spark):
    """q_retrieval_eval: an independent Python computation of
    precision/recall/MRR/nDCG from (the collected ranking, the
    relevance rule) reproduces every ppm value exactly; all metrics in
    [0, 1e6]; non-vacuity — precision strictly between 0 and 1e6 (the
    relevance rule genuinely discriminates the ranker's top-10 rather
    than saturating), and nDCG < 1e6 exactly when some top rank
    missed."""
    from pyspark.sql import functions as F

    from steaminganalysis_spark.operators.retrieval import (
        _EVAL_DISC,
        EVAL_K,
        _bm25_scored,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r.metric: r.value_ppm
        for r in QUERIES["q_retrieval_eval"](spark, sf).collect()
    }
    scored, _ = _bm25_scored(spark, sf)
    ranking = [
        r.doc_id
        for r in scored.orderBy(F.col("score_ppm").desc(), "doc_id")
        .limit(EVAL_K)
        .collect()
    ]
    rel = {
        r.doc_id
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .filter(F.expr("substring(text, 1, 80) LIKE '%spark%'"))
        .select("doc_id")
        .collect()
    }
    hits = [1 if d in rel else 0 for d in ranking]
    nhit = sum(hits)
    precision = nhit * 1_000_000 // EVAL_K
    recall = nhit * 1_000_000 // len(rel)
    first = next((i + 1 for i, h in enumerate(hits) if h), None)
    mrr = 1_000_000 // first if first else 0
    dcg = sum(h * _EVAL_DISC[i + 1] for i, h in enumerate(hits))
    idcg = sum(
        _EVAL_DISC[i] for i in range(1, min(EVAL_K, len(rel)) + 1)
    )
    ndcg = dcg * 1_000_000 // idcg
    assert got == {
        f"precision_at_{EVAL_K}": precision,
        f"recall_at_{EVAL_K}": recall,
        "mrr": mrr,
        f"ndcg_at_{EVAL_K}": ndcg,
    }
    for v in got.values():
        assert 0 <= v <= 1_000_000
    p = got[f"precision_at_{EVAL_K}"]
    assert 0 < p < 1_000_000, "relevance rule saturated or empty"
    assert (got[f"ndcg_at_{EVAL_K}"] < 1_000_000) == (nhit < EVAL_K)
