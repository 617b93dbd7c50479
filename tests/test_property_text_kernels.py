"""Property-based tests (hypothesis) for the text kernels every dedup
operator builds on: the JVM-side expressions must agree with a plain
Python reference on arbitrary inputs — not just the fixture corpus."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from steaminganalysis_spark.functions import tokens, word_ngrams

WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
DOC = st.lists(WORD, min_size=0, max_size=12)


def _py_ngrams(toks: list[str], n: int = 3) -> list[str]:
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


@settings(max_examples=12, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=6))
def test_word_ngrams_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: list(r.ng)
        for r in df.select(
            "doc_id", word_ngrams(tokens("text"), 3).alias("ng")
        ).collect()
    }
    for i, d in enumerate(docs):
        # splitting "" yields [""] in both Spark and Python — normalize
        toks = (" ".join(d)).split(" ")
        assert got[i] == _py_ngrams(toks), (toks, got[i])


@settings(max_examples=8, deadline=None)
@given(st.lists(WORD, min_size=3, max_size=12), st.lists(WORD, min_size=3, max_size=12))
def test_pairwise_jaccard_matches_python_sets(spark, ta, tb):
    """The shingle-hash Jaccard the dedup operators compute equals the
    plain set-based Jaccard (hashing must not change set cardinalities
    at these sizes)."""
    from steaminganalysis_spark.functions import shingle_hashes

    df = spark.createDataFrame(
        [(0, " ".join(ta)), (1, " ".join(tb))], "doc_id long, text string"
    )
    sh = shingle_hashes(df)
    sets: dict[int, set] = {0: set(), 1: set()}
    for r in sh.collect():
        sets[r.doc_id].add(r.h)
    a = set(_py_ngrams((" ".join(ta)).split(" ")))
    b = set(_py_ngrams((" ".join(tb)).split(" ")))
    assert len(sets[0]) == len(a) and len(sets[1]) == len(b)
    # intersect via hashes == intersect via strings
    got_inter = len(sets[0] & sets[1])
    assert got_inter == len(a & b)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=7200),  # offset seconds
            st.integers(min_value=0, max_value=30000),  # cents
        ),
        min_size=1,
        max_size=40,
    )
)
def test_rolling_time_window_matches_python_reference(spark, rows):
    """The 1-hour RANGE frame (count + cents sum) must equal a brute
    Python recomputation for arbitrary event layouts, including
    duplicate timestamps (peers enter the frame together)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, u, base + dt.timedelta(seconds=s), c / 100.0)
        for i, (u, s, c) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    got = {
        r.event_id: (r.n, r.s)
        for r in df.select(
            "event_id",
            F.count("*").over(w).alias("n"),
            F.sum(cents).over(w).alias("s"),
        ).collect()
    }
    for i, (u, s, c) in enumerate(rows):
        in_frame = [
            (u2, s2, c2)
            for (u2, s2, c2) in rows
            if u2 == u and s - 3600 <= s2 <= s
        ]
        assert got[i] == (len(in_frame), sum(x[2] for x in in_frame)), (i, rows)


@settings(max_examples=8, deadline=None)
@given(st.lists(WORD, min_size=2, max_size=20))
def test_repetition_fractions_match_python_reference(spark, toks):
    """dup-token and top-bigram fractions equal a plain Python
    recomputation on arbitrary token lists."""
    from collections import Counter

    text = " ".join(toks)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    t = df.select("doc_id", tokens("text").alias("t"))
    stats = t.select(
        F.size("t").alias("n_tok"), F.size(F.array_distinct("t")).alias("n_dist")
    ).collect()[0]
    bigrams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    c = Counter(bigrams)
    got_bg = (
        t.select(F.explode(word_ngrams(F.col("t"), 2)).alias("g"))
        .groupBy("g")
        .count()
        .agg(F.max("count").alias("top"), F.sum("count").alias("n"))
        .collect()[0]
    )
    assert stats.n_tok == len(toks)
    assert stats.n_dist == len(set(toks))
    assert (got_bg.top, got_bg.n) == (max(c.values()), len(bigrams))


def test_shingle_df_cap_drops_hot_shingles(spark):
    """cap_document_frequency drops exactly the shingles whose document
    frequency exceeds the cap, keeps everything else untouched, and is
    the identity when no shingle is hot (the fixture-SF situation —
    measured max DF 25 at sf0.1 vs the production cap of 1000)."""
    from steaminganalysis_spark.functions import cap_document_frequency

    # hash 100 appears in 5 docs, hash 200 in 2, hash 300 in 1
    rows = [(d, 100) for d in range(5)] + [(0, 200), (1, 200), (2, 300)]
    sh = spark.createDataFrame(rows, "doc_id long, h long")

    capped = cap_document_frequency(sh, df_cap=4)
    got = {(r.doc_id, r.h) for r in capped.collect()}
    assert got == {(0, 200), (1, 200), (2, 300)}  # the DF=5 shingle is gone

    identity = cap_document_frequency(sh, df_cap=5)
    assert {(r.doc_id, r.h) for r in identity.collect()} == set(
        (d, h) for d, h in rows
    )


def _py_chunks(toks: list[str], size: int, stride: int):
    """Python reference for chunk_documents' windowing rule."""
    if len(toks) < 1:
        return []
    out = []
    i = 0
    while i * stride <= len(toks) - 1:
        piece = toks[i * stride : i * stride + size]
        out.append((i, " ".join(piece), len(piece)))
        i += 1
    return out


@settings(max_examples=12, deadline=None)
@given(st.lists(st.lists(WORD, min_size=0, max_size=130), min_size=1, max_size=5))
def test_chunk_documents_matches_python_reference(spark, docs):
    """The chunking operator's window rule (size 50, stride 40, short
    tail kept, empty docs dropped) equals the plain-Python reference on
    arbitrary token lists — including docs shorter than one stride,
    exactly one window, and lengths straddling the overlap region."""
    from steaminganalysis_spark.operators import corpus as corpus_mod

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    orig_load = corpus_mod.load
    corpus_mod.load = lambda _s, _d, _t: df
    try:
        got = {
            (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
            for r in corpus_mod.chunk_documents(spark, "unused").collect()
        }
    finally:
        corpus_mod.load = orig_load
    exp = set()
    for i, d in enumerate(docs):
        # split(" ") on a joined-empty list yields [''] — one token,
        # matching Spark's split of the empty string
        toks = " ".join(d).split(" ")
        for idx, text, n in _py_chunks(
            toks, corpus_mod.CHUNK_TOKENS, corpus_mod.CHUNK_STRIDE
        ):
            exp.add((i, idx, text, n))
    assert got == exp


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
)
def test_shingle_df_cap_is_noop_at_fixture_sfs(spark, sf_dir):
    """Oracle-exactness precondition (ADVICE r3): the DF cap inside
    ``_shingle_hashes`` is applied by the Jaccard/containment/minhash
    operators while their DuckDB oracles stay uncapped, so those
    oracles are exact ONLY while no fixture shingle exceeds the cap.
    Assert it here so a fixture regen or a cap change turns silent
    divergence into a loud red test."""
    from steaminganalysis_spark.functions import shingle_hashes
    from steaminganalysis_spark.operators.llm import _SHINGLE_DF_CAP
    from steaminganalysis_spark.sources import load

    sh = shingle_hashes(load(spark, sf_dir, "documents"))
    max_df = sh.groupBy("h").count().agg(F.max("count").alias("m")).collect()[0].m
    assert max_df <= _SHINGLE_DF_CAP, (
        f"max shingle DF {max_df} exceeds cap {_SHINGLE_DF_CAP}: the "
        "uncapped dedup oracles are no longer exact at this SF"
    )


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
        min_size=2,
        max_size=12,
    )
)
def test_prefix_filter_theorem_pure(sets):
    """The completeness theorem q_dedup_jaccard_prefix rests on, tested
    on random universes WITHOUT Spark (the operator's exact rule,
    re-implemented on plain Python sets): order every set by global
    document frequency (ties by token), take each set's first
    n − ⌈3n/5⌉ + 1 elements as its prefix, generate candidates as pairs
    sharing ≥1 prefix token that pass the 3/5 length filter — then
    EVERY pair with Jaccard ≥ 3/5 must be a candidate. 300 random
    corpora probe the boundary geometry (tiny sets, equal sets,
    near-threshold sizes) far harder than the fixtures do."""
    # global document frequency over the random corpus
    df: dict[int, int] = {}
    for s in sets:
        for t in s:
            df[t] = df.get(t, 0) + 1
    order = lambda s: sorted(s, key=lambda t: (df[t], t))

    def prefix(s):
        n = len(s)
        plen = n - -(-3 * n // 5) + 1  # n - ceil(3n/5) + 1
        return set(order(s)[:plen])

    prefixes = [prefix(s) for s in sets]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            union = len(a | b)
            if 5 * inter >= 3 * union:  # true pair at t = 3/5
                # length filter must admit it ...
                assert 3 * len(b) <= 5 * len(a) and 3 * len(a) <= 5 * len(b)
                # ... and the prefixes must collide (completeness)
                assert prefixes[i] & prefixes[j], (
                    f"prefix filter dropped a true pair: {sorted(a)} vs {sorted(b)} "
                    f"(J = {inter}/{union})"
                )
