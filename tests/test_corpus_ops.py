"""Corpus-preparation operators (operators/corpus.py): invariants the
oracles can't see (plan shapes, permutation properties, chunk
reconstruction) — the oracle-parity sweep covers value equality."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from steaminganalysis_spark.registry import collect_queries

QUERIES, ORACLE = collect_queries()
SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_chunks_reconstruct_documents(spark):
    """Concatenating each document's chunks at stride boundaries
    (first `stride` tokens of every chunk, ALL tokens of the last)
    reproduces the original text — no token lost or duplicated."""
    from steaminganalysis_spark.operators.corpus import CHUNK_STRIDE

    chunks = QUERIES["q_chunk_documents"](spark, SF)
    w_last = F.max("chunk_idx").over(Window.partitionBy("doc_id"))
    rebuilt = (
        chunks.withColumn("last_idx", w_last)
        .withColumn(
            "piece",
            F.when(
                F.col("chunk_idx") == F.col("last_idx"), F.col("chunk_text")
            ).otherwise(
                F.concat_ws(
                    " ", F.slice(F.split("chunk_text", " "), 1, CHUNK_STRIDE)
                )
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
            ).alias("rebuilt")
        )
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    bad = rebuilt.join(docs, "doc_id").filter(F.col("rebuilt") != F.col("text"))
    assert bad.count() == 0


def test_chunk_sizes_and_overlap(spark):
    """Every chunk has 1..CHUNK_TOKENS tokens; every non-final chunk
    spans past the next chunk's start (n_tokens > stride — with
    overlap, the second-to-last window CAN be shorter than full when
    the doc ends inside its overlap region, but never short enough to
    leave a gap); n_tokens equals the real token count of
    chunk_text."""
    from steaminganalysis_spark.operators.corpus import CHUNK_STRIDE, CHUNK_TOKENS

    chunks = QUERIES["q_chunk_documents"](spark, SF)
    c = chunks.withColumn("actual", F.size(F.split("chunk_text", " ")))
    assert c.filter(F.col("actual") != F.col("n_tokens")).count() == 0
    assert c.filter(
        (F.col("n_tokens") < 1) | (F.col("n_tokens") > CHUNK_TOKENS)
    ).count() == 0
    last = F.max("chunk_idx").over(Window.partitionBy("doc_id"))
    gapped_nonfinal = c.withColumn("last_idx", last).filter(
        (F.col("chunk_idx") < F.col("last_idx"))
        & (F.col("n_tokens") <= CHUNK_STRIDE)
    )
    assert gapped_nonfinal.count() == 0


def test_chunking_plan_has_zero_exchanges(spark):
    """Chunking is embarrassingly parallel — the plan must contain no
    Exchange (and no join): scan → project → generate only."""
    plan = _plan(QUERIES["q_chunk_documents"](spark, SF))
    assert "Exchange" not in plan, plan
    assert "Join" not in plan, plan


def test_shuffle_is_deterministic_permutation(spark):
    """Same seed → identical assignment on a re-run; keys are unique
    (it IS a permutation); shards are reasonably balanced (uniform
    md5: no shard holds more than 4× the mean at 500 docs)."""
    a = QUERIES["q_shuffle_deterministic"](spark, SF)
    b = QUERIES["q_shuffle_deterministic"](spark, SF)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and len(ra) > 0
    keys = [r[2] for r in ra]
    assert len(set(keys)) == len(keys)
    from collections import Counter

    shard_counts = Counter(r[1] for r in ra)
    mean = len(ra) / 256
    assert max(shard_counts.values()) <= max(4 * mean, 8)


def test_shuffle_plan_has_zero_exchanges(spark):
    """Permutation assignment is a pure map — zero exchanges."""
    plan = _plan(QUERIES["q_shuffle_deterministic"](spark, SF))
    assert "Exchange" not in plan, plan


def test_materialize_epoch_shuffle_order_and_plan(spark):
    """materialize_epoch_shuffle produces the exact permutation the
    assignment query declares (rows read in partition-then-row order
    == rows sorted by shuffle_key), via rangepartitioning — never a
    single-partition global sort."""
    from steaminganalysis_spark.operators.corpus import materialize_epoch_shuffle
    from steaminganalysis_spark.sources import load

    d = load(spark, SF, "documents").select("doc_id")
    out = materialize_epoch_shuffle(d, "epoch-0", num_shards=8)
    plan = _plan(out)
    assert "rangepartitioning" in plan, plan
    assert "SinglePartition" not in plan, plan
    # physical order across shards == global key order
    rows = out.select("doc_id", "_shuffle_key").rdd.glom().collect()
    flat = [r for part in rows for r in part]
    keys = [r["_shuffle_key"] for r in flat]
    assert keys == sorted(keys) and len(keys) == d.count()
    # per-partition sortWithinPartitions held, and ranges are disjoint
    ends = [p[-1]["_shuffle_key"] for p in rows if p]
    starts = [p[0]["_shuffle_key"] for p in rows if p]
    assert all(s <= e for s, e in zip(starts, ends))
    # determinism: a second materialization yields the identical order
    flat2 = [
        r
        for part in materialize_epoch_shuffle(d, "epoch-0", num_shards=8)
        .select("doc_id", "_shuffle_key")
        .rdd.glom()
        .collect()
        for r in part
    ]
    assert [r["doc_id"] for r in flat2] == [r["doc_id"] for r in flat]


def test_inverted_index_postings_and_df(spark):
    """Postings are sorted, unique, bounded by K; doc_freq counts ALL
    docs (not just kept postings); a token known to be in two docs
    indexes both."""
    from steaminganalysis_spark.operators.corpus import _POSTINGS_K

    inv = QUERIES["q_index_inverted"](spark, SF).collect()
    assert inv
    for r in inv:
        ids = [int(x) for x in r.postings.split(",")]
        assert ids == sorted(set(ids))
        assert len(ids) <= _POSTINGS_K
        assert r.doc_freq >= len(ids) if r.doc_freq > _POSTINGS_K else r.doc_freq == len(ids)


def test_inverted_index_df_cap_drops_hot_tokens(spark):
    """With a tiny cap, tokens in more docs than the cap vanish from
    the index (the stopword/posting-blow-up guard), others survive."""
    from steaminganalysis_spark.functions import tokens as _tokens
    from steaminganalysis_spark.sources import load

    d = load(spark, SF, "documents")
    pairs = d.select("doc_id", F.explode(_tokens("text")).alias("token")).distinct()
    df_counts = {r.token: r.c for r in pairs.groupBy("token").agg(F.count("*").alias("c")).collect()}
    hot = {t for t, c in df_counts.items() if c > 10}
    cold = {t for t, c in df_counts.items() if c <= 10}
    import steaminganalysis_spark.operators.corpus as corpus_mod

    orig = corpus_mod._INDEX_DF_CAP
    corpus_mod._INDEX_DF_CAP = 10
    try:
        got = {r.token for r in corpus_mod.index_inverted(spark, SF).collect()}
    finally:
        corpus_mod._INDEX_DF_CAP = orig
    assert got == cold
    assert got.isdisjoint(hot)


def test_inverted_index_aggregates_before_collect(spark):
    """Scale-order pin: the doc-frequency aggregate (HashAggregate on
    token) appears BELOW the posting-collecting ObjectHashAggregate in
    the plan, and the HOT set (a bounded stopword list — never the
    unbounded kept vocabulary) is the broadcast side of a LeftAnti —
    hot tokens are dropped before any posting list materializes."""
    plan = _plan(QUERIES["q_index_inverted"](spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    obj = plan.find("ObjectHashAggregate")
    assert obj != -1, plan
    assert "HashAggregate" in plan[obj:], plan  # df agg below the collect


def test_dedup_incremental_partition_and_completeness(spark):
    """Every kept row is from the new batch (doc_id % 5 == 0) and its
    content hash is genuinely absent from the corpus; every DROPPED
    batch row's hash IS present — the anti-join removes exactly the
    already-seen documents."""
    kept = QUERIES["q_dedup_incremental"](spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert all(i % 5 == 0 for i in kept_ids)
    corpus_hashes = {
        r["h"]
        for r in docs.filter(F.col("doc_id") % 5 != 0)
        .select(F.md5("text").alias("h"))
        .distinct()
        .collect()
    }
    batch = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.md5("text").alias("h")
    )
    for r in batch.collect():
        assert (r["doc_id"] in kept_ids) == (r["h"] not in corpus_hashes)


def test_dedup_incremental_plan_anti_join_on_hashes(spark):
    """The corpus side reduces to DISTINCT hashes before the LeftAnti
    join (a HashAggregate feeds the join's right side) and no text
    column crosses the exchange on that side — the shuffled corpus
    payload is O(16 bytes/doc) regardless of document size."""
    plan = _plan(QUERIES["q_dedup_incremental"](spark, SF))
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan
    anti = plan.find("LeftAnti")
    assert "HashAggregate" in plan[anti:], plan  # distinct below the join


def test_skew_profile_values_and_plan(spark):
    """Top-k slice is exactly k rows ranked 1..k by descending count;
    shares are in (0,100]; skew_ratio >= 1 (max >= mean) — and the
    top-k is a TakeOrderedAndProject, never a global sort of the key
    domain."""
    from steaminganalysis_spark.operators.corpus import _SKEW_TOP_K

    df = QUERIES["q_skew_profile"](spark, SF)
    rows = sorted(df.collect(), key=lambda r: r["rnk"])
    assert [r["rnk"] for r in rows] == list(range(1, _SKEW_TOP_K + 1))
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert 0 < r["share_pct"] <= 100
        assert r["skew_ratio"] >= 1.0
        assert r["total_rows"] >= r["n_keys"]
    assert "TakeOrderedAndProject" in _plan(df)


def test_ngram_lm_top_bigram_and_probabilities(spark):
    """The emitted top bigram matches a driver-side brute-force count;
    every conditional probability is in (0, 1] and equals cnt / c(w1,·)
    recomputed from the raw corpus."""
    from collections import Counter

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text").collect()
    big = Counter()
    uni = Counter()
    for r in docs:
        t = r["text"].split(" ")
        for a, b in zip(t, t[1:]):
            big[(a, b)] += 1
            uni[a] += 1
    rows = QUERIES["q_ngram_lm"](spark, SF).collect()
    assert len(rows) > 0
    top = max(big.items(), key=lambda kv: (kv[1], ) + tuple(-ord(ch) for ch in "\0"))
    best_cnt = max(big.values())
    assert rows[0]["cnt"] == best_cnt
    for r in rows:
        assert 0 < r["cond_p"] <= 1
        assert r["cnt"] == big[(r["w1"], r["w2"])]
        expect = big[(r["w1"], r["w2"])] / uni[r["w1"]]
        assert abs(r["cond_p"] - expect) < 1e-6
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)


def test_ngram_lm_plan_topk_and_map_side_bigrams(spark):
    """Top-k is TakeOrderedAndProject (no global sort materialization)
    and the bigram stream is generated map-side (the explode sits below
    the first exchange) — no cartesian anywhere."""
    plan = _plan(QUERIES["q_ngram_lm"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_quality_lm_score_matches_python(spark):
    """Ground-truth recompute of the integer LM score: per bigram
    ppm = (cnt * 1e6) // c1, per doc score = sum(ppm) // n — exact
    integer equality against a driver-side Python model."""
    from collections import Counter

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").collect()
    big = Counter()
    uni = Counter()
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for r in docs:
        t = r["text"].split(" ")
        pairs = list(zip(t, t[1:]))
        per_doc[r["doc_id"]] = pairs
        for a, b in pairs:
            big[(a, b)] += 1
            uni[a] += 1
    rows = {r["doc_id"]: r for r in QUERIES["q_quality_lm_score"](spark, SF).collect()}
    expected_docs = {d for d, p in per_doc.items() if p}
    assert set(rows) == expected_docs
    for doc_id, pairs in per_doc.items():
        if not pairs:
            continue
        ppms = [(big[p] * 1_000_000) // uni[p[0]] for p in pairs]
        assert rows[doc_id]["n_bigrams"] == len(pairs)
        assert rows[doc_id]["score_ppm"] == sum(ppms) // len(ppms)


def test_quality_lm_score_plan_staged_once(spark):
    """The hashed bigram stream is staged once: the final plan reads
    the materialization (ExistingRDD), never re-scans documents for
    the three consumers, and stays equi-join shaped (no cartesian, no
    BroadcastNestedLoopJoin)."""
    plan = _plan(QUERIES["q_quality_lm_score"](spark, SF))
    assert "ExistingRDD" in plan
    assert "documents.parquet" not in plan  # tokenize+explode ran at staging time
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Reference BPE: pair counts weighted by word count, best pair by
    (count desc, left, right), left-to-right non-overlapping merge."""
    from collections import Counter

    vocab = {w: [*w] for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += word_counts[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_python_reference(spark):
    """The distributed BPE trainer's merge table AND final vocabulary
    segmentation equal a driver-side Python BPE on the same word
    counts — merge order, tie-breaks, and the non-overlap rule all
    pinned exactly."""
    from collections import Counter

    from steaminganalysis_spark.operators.corpus import _BPE_MERGES, bpe_train

    wc = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect():
        wc.update(r["text"].split(" "))
    exp_merges, exp_vocab = _python_bpe(dict(wc), _BPE_MERGES)

    merges, vocab = bpe_train(spark, SF)
    assert merges == exp_merges
    got = {r["word"]: (r["n"], list(r["symbols"])) for r in vocab.collect()}
    assert set(got) == set(exp_vocab)
    for w, syms in exp_vocab.items():
        assert got[w] == (wc[w], syms), w


def test_bpe_iteration_runs_on_staged_vocab_not_corpus(spark):
    """After the single word-count pass, every merge round's plan reads
    the staged vocabulary materialization (ExistingRDD) — the corpus
    parquet never re-enters the iteration, which is what makes BPE
    trainable at corpus scale."""
    from steaminganalysis_spark.operators.corpus import bpe_train

    _, vocab = bpe_train(spark, SF, n_merges=2)
    plan = _plan(vocab)
    assert "ExistingRDD" in plan
    assert "documents.parquet" not in plan


def test_dsir_score_ranks_target_language_higher(spark):
    """The DSIR importance score must separate the target domain: the
    mean score of English (target) documents exceeds the mean score of
    every other language's documents, and every score is the exact
    integer mean of its per-token diffs (spot-checked via recompute of
    one document)."""
    from collections import Counter, defaultdict

    rows = QUERIES["q_dsir_score"](spark, SF).collect()
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r["dsir_ppm"])
    means = {la: sum(v) / len(v) for la, v in by_lang.items()}
    for la, m in means.items():
        if la != "en":
            assert means["en"] > m, (la, means)

    # exact recompute for one doc
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "text"
    ).collect()
    tgt, raw = Counter(), Counter()
    t_total = r_total = 0
    for d in docs:
        ws = d["text"].split(" ")
        raw.update(ws)
        r_total += len(ws)
        if d["lang"] == "en":
            tgt.update(ws)
            t_total += len(ws)
    d0 = docs[0]
    ws = d0["text"].split(" ")
    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q
    diffs = [
        (tgt.get(w, 0) * 1_000_000) // t_total - (raw[w] * 1_000_000) // r_total
        for w in ws
    ]
    got = {r["doc_id"]: r for r in rows}[d0["doc_id"]]
    assert got["n_tokens"] == len(ws)
    assert got["dsir_ppm"] == trunc_div(sum(diffs), len(diffs))


def test_bpe_encode_matches_python_encoding(spark):
    """Applying the trained merges distributedly equals encoding every
    document with the Python-BPE reference vocabulary: per-doc word
    and BPE token counts match exactly."""
    from collections import Counter

    from steaminganalysis_spark.operators.corpus import _BPE_MERGES

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").collect()
    wc = Counter()
    for r in docs:
        wc.update(r["text"].split(" "))
    _, exp_vocab = _python_bpe(dict(wc), _BPE_MERGES)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in QUERIES["q_bpe_encode"](spark, SF).collect()
    }
    assert set(got) == {r["doc_id"] for r in docs}
    for r in docs:
        ws = r["text"].split(" ")
        expect = (len(ws), sum(len(exp_vocab[w]) for w in ws))
        assert got[r["doc_id"]] == expect, r["doc_id"]


def test_bpe_edge_cases_vs_python(spark):
    """Adversarial vocabularies aimed at the merge fold: runs of a
    repeated character (non-overlap rule), exact count ties (lexico
    break), single-char words (no pairs), and merge exhaustion
    (n_merges beyond the available pair inventory must early-break) —
    each exact-equal to the Python reference."""
    from steaminganalysis_spark.operators.corpus import bpe_train_on_words

    cases = [
        {"aaaa": 3, "aa": 2, "a": 5},          # overlap: 'aaaa' → [aa, aa]
        {"ab": 1, "ba": 1, "c": 9},            # tie on count → lexicographic
        {"x": 4, "y": 2},                      # no pairs at all
        {"abc": 1},                            # exhaustion: 2 pairs, ask for 5
        {"abab": 2, "bab": 1, "bb": 3},
    ]
    for wc in cases:
        exp_merges, exp_vocab = _python_bpe(dict(wc), 5)
        words = spark.createDataFrame(list(wc.items()), "word string, n long")
        merges, vocab = bpe_train_on_words(words, 5)
        assert merges == exp_merges, wc
        got = {r["word"]: list(r["symbols"]) for r in vocab.collect()}
        assert got == exp_vocab, wc


def test_corpus_select_gates_and_plan(spark):
    """The composed selection pipeline must genuinely select (a
    non-empty strict subset of the corpus survives the dedup + LM +
    DSIR gates) and stay equi-join shaped: no cartesian, and the only
    BroadcastNestedLoopJoin is the single-row scalar-totals cross join
    (the scalar-subquery shape)."""
    df = QUERIES["q_corpus_select"](spark, SF)
    rows = df.collect()
    kept = sum(r["n_docs"] for r in rows)
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert 0 < kept < total
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # the only BNLJs allowed are single-row scalar-totals cross joins
    # (AQE may print the shape once or twice depending on stage reuse);
    # a data×data nested-loop would dwarf this count
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_collocations_match_python_reference(spark):
    """The lift ranking must equal a pure-Python recompute of the same
    BIGINT division pipeline (third referee beside the two SQL
    twins)."""
    import pandas as pd

    from steaminganalysis_spark.operators.corpus import (
        COLLOC_MIN_SUPPORT,
        COLLOC_TOPK,
    )
    from steaminganalysis_spark.registry import collect_queries

    QUERIES, _ = collect_queries()
    sf = "/root/testdata/sf0.001"
    got = [
        (r.w1, r.w2, r.c_ab, r.lift_ppm)
        for r in QUERIES["q_text_collocations"](spark, sf).collect()
    ]
    docs = pd.read_parquet(f"{sf}/documents.parquet")["text"]
    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    n_uni = 0
    n_bi = 0
    for t in docs:
        ws = t.split(" ")
        uni.update(ws)
        n_uni += len(ws)
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] += 1
            n_bi += 1
    rows = []
    for (a, b), c_ab in bi.items():
        if c_ab < COLLOC_MIN_SUPPORT:
            continue
        lift = (((c_ab * 1000000 * n_uni) // (uni[a] * uni[b])) * n_uni) // n_bi
        rows.append((a, b, c_ab, lift))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == rows[:COLLOC_TOPK]
