"""Pins for operators/curation.py beyond oracle parity: the weighted
sample's top-K plan shape and length bias, fold-assignment stability
across corpus growth, and vocab-prune's order/bound invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from steaminganalysis_spark.operators.curation import (
    FOLDS,
    MAX_DF_FRAC,
    MIN_DF,
    SAMPLE_K,
)
from steaminganalysis_spark.registry import collect_queries
from tests.conftest import SF_DIR

QUERIES, ORACLE = collect_queries()


def test_sample_weighted_topk_plan_no_global_sort(spark):
    """The selection must compile to TakeOrderedAndProject (per-task
    K-row heap, driver merges P·K rows) — a global Sort node would be
    the 100 TB scale-killer this operator exists to avoid."""
    from steaminganalysis_spark.plans import physical_plan

    plan = physical_plan(QUERIES["q_sample_weighted"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_sample_weighted_is_length_biased_and_deterministic(spark):
    """Weight = n_chars must show up as length bias (sampled mean above
    corpus mean), and two runs must select the identical set (the
    hash-derived uniform has no RNG state)."""
    from steaminganalysis_spark.sources import load

    got = QUERIES["q_sample_weighted"](spark, SF_DIR).collect()
    assert len(got) == min(SAMPLE_K, 500)
    sample_mean = sum(r.n_chars for r in got) / len(got)
    corpus_mean = (
        load(spark, SF_DIR, "documents").agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean
    again = QUERIES["q_sample_weighted"](spark, SF_DIR).collect()
    assert sorted(r.doc_id for r in got) == sorted(r.doc_id for r in again)


def test_crossval_folds_balanced_and_stable_under_growth(spark):
    """Every fold lands within a loose balance band, and a document's
    fold is identical at sf0.001 and sf0.01 — assignment is a pure
    function of doc_id, so corpus growth never reassigns (the property
    row_number/ntile schemes lack)."""
    small = {r.doc_id: r.fold for r in QUERIES["q_crossval_folds"](spark, SF_DIR).collect()}
    assert set(small.values()) <= set(range(FOLDS))
    counts = [list(small.values()).count(f) for f in range(FOLDS)]
    n = len(small)
    assert all(0.5 * n / FOLDS < c < 1.5 * n / FOLDS for c in counts), counts
    bigger = {
        r.doc_id: r.fold
        for r in QUERIES["q_crossval_folds"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    overlap = set(small) & set(bigger)
    assert overlap and all(small[d] == bigger[d] for d in overlap)


def test_vocab_prune_bounds_and_order_preserved(spark):
    """No surviving token violates the DF bounds, kept tokens appear in
    original document order (a subsequence of the source text), and
    corpus cardinality is preserved even for fully-pruned documents."""
    from steaminganalysis_spark.sources import load

    docs = {r.doc_id: r.text for r in load(spark, SF_DIR, "documents").collect()}
    out = QUERIES["q_vocab_prune"](spark, SF_DIR).collect()
    assert len(out) == len(docs)

    # recompute exact document frequencies in Python
    from collections import Counter

    df = Counter()
    for text in docs.values():
        df.update(set(text.split(" ")))
    max_df = int(MAX_DF_FRAC * len(docs))

    for r in out:
        orig = docs[r.doc_id].split(" ")
        kept = r.pruned_text.split(" ") if r.pruned_text else []
        assert r.n_kept == len(kept)
        assert r.n_dropped == len(orig) - len(kept)
        for w in set(kept):
            assert MIN_DF <= df[w] <= max_df, (w, df[w])
        # kept must be the exact in-order subsequence of survivors
        expect = [w for w in orig if MIN_DF <= df[w] <= max_df]
        assert kept == expect


def test_dedup_url_matches_urllib_canonicalizer(spark):
    """A third, independent canonicalizer — Python urllib — must agree
    with the SQL twins: parse the raw URL, lowercase host, strip www./
    default port/fragment/utm_* params, sort params, trim trailing
    slashes. Pins that the two SQL spellings implement the SPEC, not
    merely each other."""
    from urllib.parse import urlsplit

    # rebuild the raw urls exactly as the operator does
    import duckdb

    from steaminganalysis_spark.operators.curation import _URL_RAW

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    rows = con.execute(
        f"SELECT o_orderkey, {_URL_RAW} AS url FROM orders"
    ).fetchall()

    def canon(url: str) -> str:
        parts = urlsplit(url)
        host = parts.netloc.lower()
        if host.startswith("www."):
            host = host[4:]
        if host.endswith(":443"):
            host = host[:-4]
        path = parts.path.rstrip("/")
        params = [
            p for p in parts.query.split("&") if p and not p.startswith("utm_")
        ]
        q = "&".join(sorted(params))
        return f"https://{host}{path}" + (f"?{q}" if q else "")

    from collections import defaultdict

    groups: dict[str, list] = defaultdict(list)
    variants: dict[str, set] = defaultdict(set)
    for k, u in rows:
        c = canon(u)
        groups[c].append(k)
        variants[c].add(u)
    expect = {
        (c, len(ks), len(variants[c]), min(ks)) for c, ks in groups.items()
    }
    got = {
        (r.canonical_url, r.n_dups, r.n_variants, r.keep_key)
        for r in QUERIES["q_dedup_url"](spark, SF_DIR).collect()
    }
    assert got == expect


def test_dedup_url_canonical_computed_before_single_shuffle(spark):
    """Canonicalization must be a scan-stage map (regexp/HOF builtins,
    no Python UDF) feeding the dedup aggregation's exchanges: one for
    the (canonical, url)-distinct partial, one for the final canonical
    key — the standard two-phase exact-distinct shape, both on
    canonical-prefixed keys so spellings combine map-side."""
    from steaminganalysis_spark.plans import count_exchanges

    df = QUERIES["q_dedup_url"](spark, SF_DIR)
    assert count_exchanges(df) <= 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_extract_html_loses_and_invents_nothing(spark):
    """The extraction round-trip guarantee behind chaining any corpus
    operator after ``q_text_extract_html``: the extracted text is
    BYTE-IDENTICAL to the planted article text for every document —
    no boilerplate leaks in (ads, nav, script bodies with `<`/`>`,
    entities, headings, footer), no article content is lost at the
    paragraph split — at the edge SF and the 10× sweep SF."""
    from steaminganalysis_spark.sources import load

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        out = QUERIES["q_text_extract_html"](spark, sf_dir)
        d = load(spark, sf_dir, "documents").select("doc_id", "text")
        joined = out.join(d, "doc_id")
        assert joined.filter(F.col("text_extracted") != F.col("text")).count() == 0
        n = out.count()
        assert n == d.count() and n > 0
        # and the page really carried boilerplate to strip: the raw
        # HTML is materially larger than what survives
        shrink = joined.select(
            F.sum("html_chars").alias("raw"),
            F.sum(F.length("text")).alias("clean"),
        ).first()
        assert shrink.raw > shrink.clean + 300 * n  # ≥300 boilerplate chars/page


def test_text_extract_html_pure_map_plan(spark):
    """Extraction is a zero-exchange map pipeline (regex inside
    whole-stage codegen, no UDF): at 100 TB it parallelizes exactly as
    the scan does."""
    from steaminganalysis_spark.plans import count_exchanges

    df = QUERIES["q_text_extract_html"](spark, SF_DIR)
    assert count_exchanges(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
