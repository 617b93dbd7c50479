"""Property-based tests (hypothesis) for the text kernels every dedup
operator builds on: the JVM-side expressions must agree with a plain
Python reference on arbitrary inputs — not just the fixture corpus."""

from __future__ import annotations

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
