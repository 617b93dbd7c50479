"""Corpus-curation operators (round 6): deterministic weighted
sampling, cross-validation fold assignment, and document-frequency
vocabulary pruning — the selection/splitting layer a training-data
pipeline runs between cleaning and packing.

Everything here is a PURE FUNCTION of the input keys: randomness comes
from md5 over a seeded key string, evaluated with identical SQL
expressions in Spark and the DuckDB oracle (the same discipline as
``q_sample_hash`` / ``q_shuffle_deterministic``), so every operator is
reproducible across runs, engines, and repartitions — the property
sampling and fold assignment need for resumable pipelines.

Scale posture (the 100 TB story):

- ``q_sample_weighted`` is Efraimidis–Spirakis A-ES weighted sampling
  without replacement: priority ``ln(u)/w`` per document (u a
  hash-derived uniform, w the document weight), global top-K by
  priority. In Spark the top-K compiles to ``TakeOrderedAndProject``
  — each task keeps a K-row heap and the driver merges P·K rows —
  so there is NO global sort and NO shuffle of the corpus, at any
  scale. The hash-derived u means no RNG state: re-running selects the
  same sample, and adding documents never perturbs the priorities of
  existing ones (only the top-K cut line).
- ``q_crossval_folds`` maps each document to one of K folds by an
  integer-arithmetic hash digest — a zero-exchange map; fold
  membership is stable under corpus growth, so incremental runs never
  reshuffle old assignments.
- ``q_vocab_prune`` is the gensim-style ``filter_extremes``: drop
  tokens whose document frequency is out of [MIN_DF, MAX_DF_FRAC·N],
  then rebuild each document preserving token order. The DF table is
  tiny relative to the corpus (vocab-sized) and is broadcast back, so
  the corpus shuffles ONCE (on doc_id, to reassemble) — the DF
  aggregate's shuffle moves vocab-sized partial counts, not tokens.

Determinism: uniforms are 32-bit dyadic rationals (exact doubles on
both engines); ``ln`` ordering ties would need two 32-bit hashes
within ~1 ulp after division — not a realistic event, and the
selection emits value columns only (no ranks), so a boundary swap
inside the top-K is the only exposure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import query
from steaminganalysis_spark.sources import load

SAMPLE_K = 200  # documents kept by the weighted sample
FOLDS = 5
MIN_DF = 3  # q_vocab_prune: min documents a token must appear in
MAX_DF_FRAC = 0.3  # ... and max fraction of the corpus it may appear in

_HEXD = "0123456789abcdef"


def _hex_digit(h: str, i: int) -> str:
    """Dialect-common SQL for the value of hex digit ``i`` (1-based) of
    expression ``h`` — POSITION/substr evaluate identically in Spark
    and DuckDB."""
    # BIGINT cast: Spark's POSITION is INT and d·16^7 overflows int32
    # under ANSI arithmetic
    return f"(CAST(POSITION(substr({h}, {i}, 1) IN '{_HEXD}') AS BIGINT) - 1)"


def _uniform_sql(key_expr: str, seed: str) -> str:
    """A dyadic uniform in (0,1]: the first 8 hex digits of
    ``md5(seed:key)`` as u = (n+1)/2^32 — 32 significant bits, exactly
    representable, bit-identical on both engines."""
    h = f"md5('{seed}:' || CAST({key_expr} AS STRING))"
    n = " + ".join(
        f"{_hex_digit(h, i)} * {16 ** (8 - i)}" for i in range(1, 9)
    )
    return f"(CAST(({n}) + 1 AS DOUBLE) / 4294967296.0)"


def _fold_sql(key_expr: str, seed: str, k: int) -> str:
    """Fold id in [0, k): first 3 hex digits of md5(seed:key) as an
    integer mod k — pure BIGINT arithmetic, identical on both engines
    (4096 % k leaves a ≤k/4096 imbalance, documented not hidden)."""
    h = f"md5('{seed}:' || CAST({key_expr} AS STRING))"
    n = f"({_hex_digit(h, 1)} * 256 + {_hex_digit(h, 2)} * 16 + {_hex_digit(h, 3)})"
    return f"CAST({n} % {k} AS BIGINT)"


@query(
    "q_sample_weighted",
    oracle=f"""
    SELECT doc_id, n_chars
    FROM (
      SELECT doc_id, n_chars,
             ln({_uniform_sql('doc_id', 'wsamp')}) / CAST(n_chars AS DOUBLE)
               AS priority
      FROM documents
    )
    ORDER BY priority DESC, doc_id
    LIMIT {SAMPLE_K}
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis
    A-ES), weight = n_chars: documents are ranked by ``ln(u)/w`` with
    u a hash-derived uniform — equivalent to ranking by ``u^(1/w)`` —
    and the top-{SAMPLE_K} kept, so selection probability is
    proportional to document length without replacement. The uniform
    is a pure function of (seed, doc_id): no RNG state, reproducible
    on any engine or partitioning. Plan: map-side priority + top-K via
    TakeOrderedAndProject (per-task K-row heap, driver merges P·K
    rows) — the corpus is never sorted or shuffled."""
    pri = f"ln({_uniform_sql('doc_id', 'wsamp')}) / CAST(n_chars AS DOUBLE)"
    return (
        load(spark, sf_dir, "documents")
        .selectExpr("doc_id", "n_chars", f"{pri} AS priority")
        .orderBy(F.col("priority").desc(), "doc_id")
        .limit(SAMPLE_K)
        .select("doc_id", "n_chars")
    )


@query(
    "q_crossval_folds",
    oracle=f"""
    SELECT doc_id, {_fold_sql('doc_id', 'fold', FOLDS)} AS fold
    FROM documents
    """,
)
def crossval_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{FOLDS}-fold cross-validation assignment: fold = the first three
    hex digits of md5(seed:doc_id) as an integer mod {FOLDS} — integer
    arithmetic end to end, so the assignment is exact on any engine
    and STABLE under corpus growth (a new document never moves an old
    one between folds, unlike ntile/row_number schemes). Zero
    exchanges: the fold id is computed in the scan projection."""
    return load(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{_fold_sql('doc_id', 'fold', FOLDS)} AS fold"
    )


@query(
    "q_vocab_prune",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ),
    df AS (
      SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM toks GROUP BY w
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    kept AS (
      SELECT t.doc_id, t.w, t.pos
      FROM toks t JOIN df ON df.w = t.w, n
      WHERE df.df >= {MIN_DF}
        AND df.df <= CAST(FLOOR({MAX_DF_FRAC} * n.n_docs) AS BIGINT)
    ),
    rebuilt AS (
      SELECT doc_id,
             string_agg(w, ' ' ORDER BY pos) AS pruned_text,
             CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(r.pruned_text, '') AS pruned_text,
           COALESCE(r.n_kept, 0) AS n_kept,
           CAST(len(string_split(d.text, ' ')) AS BIGINT)
             - COALESCE(r.n_kept, 0) AS n_dropped
    FROM documents d LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
    """,
)
def vocab_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency vocabulary pruning (gensim
    ``filter_extremes``): drop tokens appearing in fewer than
    {MIN_DF} documents (typo-class noise) or more than
    {MAX_DF_FRAC:.0%} of the corpus (boilerplate/stopwords), then
    rebuild every document with surviving tokens in original order.
    Plan: the DF aggregate shuffles vocab-sized partial counts (never
    token instances — map-side combine on the token key); the kept
    vocabulary joins back BROADCAST (vocab ≪ corpus); reassembly is
    the single corpus shuffle, on doc_id. Documents losing every token
    survive with empty text — corpus cardinality is preserved."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    df = toks.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size enters the plan as a broadcast 1-row join, not a
    # driver-side action — the whole query stays one declarative plan
    n = docs.agg(F.count("*").alias("n_docs"))
    kept_vocab = (
        df.crossJoin(F.broadcast(n))
        .filter(
            (F.col("df") >= MIN_DF)
            & (F.col("df") <= F.floor(F.lit(MAX_DF_FRAC) * F.col("n_docs")))
        )
        .select("w")
    )
    rebuilt = (
        toks.join(F.broadcast(kept_vocab), "w")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
            ).alias("pruned_text"),
            F.count("*").alias("n_kept"),
        )
    )
    return (
        docs.select("doc_id", F.size(F.split("text", " ")).alias("n_toks"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pruned_text", F.lit("")).alias("pruned_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_toks") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


# --- URL canonicalization dedup -------------------------------------
# Crawl pipelines dedup by CANONICAL url before any content hashing:
# scheme/host case, a www. prefix, the scheme's default port, tracking
# params (utm_*), parameter order, and fragments all vary freely for
# the same resource. The fixture synthesizes those variations
# deterministically from order keys; the canonicalizer itself is
# general string/array algebra evaluated identically on both engines.

# Raw URL synthesis, shared by both engines (pure string concat over
# integer-derived variation): mixed-case scheme+host, optional www.,
# optional explicit :443, utm tracking param first, two real params in
# varying positions, optional fragment.
_URL_RAW = (
    "CASE WHEN o_orderkey % 3 = 0 THEN 'HTTPS://WWW.Shop' ELSE 'https://shop' END"
    " || CAST(o_custkey % 5 AS STRING) || '.Example.COM'"
    " || CASE WHEN o_orderkey % 4 = 0 THEN ':443' ELSE '' END"
    " || '/cat/' || CAST(o_orderkey % 7 AS STRING)"
    " || CASE WHEN o_orderkey % 2 = 0 THEN '/' ELSE '' END"
    " || '?utm_campaign=mail&id=' || CAST(o_orderkey % 100 AS STRING)"
    " || '&b=' || CAST(o_custkey % 3 AS STRING)"
    " || CASE WHEN o_orderkey % 5 = 0 THEN '#frag' ELSE '' END"
)

_HOST_RE = "^[a-zA-Z]+://([^/?#]+)"
_PATH_RE = "^[a-zA-Z]+://[^/?#]+([^?#]*)"


def _canon_sql(dialect: str) -> str:
    """The canonical-url expression over a column ``url`` — identical
    semantics, dialect-local array spellings. Spark SQL string
    literals consume one level of backslash escaping; DuckDB's do not
    — so the regex metacharacter escape is dialect-local too."""
    bs = "\\\\" if dialect == "spark" else "\\"
    host = (
        f"regexp_replace(regexp_replace(lower(regexp_extract(url, '{_HOST_RE}', 1)),"
        f" '^www{bs}.', ''), ':443$', '')"
    )
    # NOT rtrim(expr, '/'): Spark's two-arg rtrim takes (trimStr, src)
    # — the reverse of DuckDB's (src, chars). regexp_replace reads the
    # same on both engines.
    path = f"regexp_replace(regexp_extract(url, '{_PATH_RE}', 1), '/+$', '')"
    qraw = f"regexp_extract(url, '{bs}?([^#]*)', 1)"
    if dialect == "spark":
        # Anchored patterns, JVM higher-order builtins for the param
        # list surgery.
        q = (
            f"array_join(array_sort(filter(split({qraw}, '&'),"
            " x -> NOT startswith(x, 'utm_'))), '&')"
        )
    else:
        q = (
            f"array_to_string(list_sort(list_filter(string_split({qraw}, '&'),"
            " x -> NOT starts_with(x, 'utm_'))), '&')"
        )
    return (
        f"'https://' || {host} || {path}"
        f" || CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END"
    )


@query(
    "q_dedup_url",
    oracle=f"""
    WITH raw AS (
      SELECT o_orderkey, {_URL_RAW} AS url FROM orders
    ),
    canon AS (
      SELECT o_orderkey, url, {_canon_sql('duckdb')} AS canonical_url
      FROM raw
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_dups,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
           CAST(MIN(o_orderkey) AS BIGINT) AS keep_key
    FROM canon
    GROUP BY canonical_url
    """,
)
def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup (the crawl-frontier normalizer):
    lowercase scheme+host, strip a `www.` prefix and the scheme
    default port, drop `utm_*` tracking params and the fragment, sort
    the surviving query params, strip the trailing slash — then group
    by the canonical form, keeping the smallest key as the survivor
    and reporting how many raw rows and DISTINCT raw spellings each
    canonical URL absorbed. The canonicalizer is implemented twice
    (Spark regexp/HOF builtins vs DuckDB list functions) from the same
    spec, so oracle parity certifies the semantics, not a shared
    implementation.

    Scale shape: canonicalization is a zero-exchange scan-stage map
    (regexp + array ops, all JVM whole-stage codegen — no UDF); the
    dedup aggregate shuffles on the canonical key (two-phase because
    of the exact DISTINCT-variant count — drop n_variants or sketch it
    and it collapses to one exchange). The canonical key is computed
    map-side, so near-duplicate URL spellings combine in the partial
    aggregate before touching the wire."""
    raw = load(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", f"{_URL_RAW} AS url"
    )
    return (
        raw.selectExpr("o_orderkey", "url", f"{_canon_sql('spark')} AS canonical_url")
        .groupBy("canonical_url")
        .agg(
            F.count("*").cast("long").alias("n_dups"),
            F.countDistinct("url").cast("long").alias("n_variants"),
            F.min("o_orderkey").cast("long").alias("keep_key"),
        )
    )


# ------------------------------------------------ crawl text extraction
#
# The crawl-to-corpus entry stage (the trafilatura/jusText step): every
# operator downstream of here consumes clean `documents.text`, but a
# real pipeline starts from crawled HTML. The fixture has no HTML
# column, so the operator uses the synthesize-then-verify pattern
# (operators/multimodal.py): wrap each document's text in a
# deterministic full-page template — head script with `<` and `>` in
# its body, stylesheet, nav with entities, an ad block and a SECOND
# inline script inside the article between the paragraphs — then
# extract. Because the planted truth is the original text, the
# extraction-loses-and-invents-nothing guarantee is the oracle hash
# itself, plus a byte-equality pin in tests/test_curation.py.

# Template fragments, shared verbatim by the Spark expression and the
# DuckDB oracle so both engines extract from the SAME page bytes.
_HTML_HEAD = (
    '<html><head><title>Doc #ID#</title>'
    '<style>body{margin:0} .ad{color:red}</style>'
    '<script type="text/javascript">var p=#ID#;if(p<9||p>0){track(p)}'
    "</script></head><body>"
    '<nav class="top"><a href="/">Home</a> &middot; '
    '<a href="/#LANG#">#LANG#</a></nav>'
    '<div class="ad">SUBSCRIBE &amp; SAVE <b>50%</b> &gt; now</div>'
    "<article><h1>Entry #ID#</h1><p>"
)
_HTML_MID = (
    '</p><div class="ad">RELATED &raquo;</div>'
    "<script>mid(p&&1)</script><p>"
)
_HTML_TAIL = (
    "</p></article><footer>&copy; 2024 Example Corp &lt;legal&gt;"
    "</footer></body></html>"
)

# Extraction pipeline, one regex per boilerplate class — identical
# pattern strings in both engines (Java regex and RE2 agree on
# non-greedy `.*?`, character classes, and alternation; nothing
# engine-specific like lookbehind is used):
_RE_SCRIPT = "<script[^>]*>.*?</script>"
_RE_ARTICLE = "<article>(.*?)</article>"
_RE_HEADING = "<h1>.*?</h1>"
_RE_AD = '<div class="ad">.*?</div>'
_RE_TAG = "<[^>]*>"


def _synth_sql(dialect: str) -> str:
    """SQL expression producing the synthesized page for one document
    row (columns doc_id, text, lang in scope). The body is the text
    split at the midpoint word into two <p> blocks — slice/join string
    surgery only, zero information added or lost — with the inline
    ad + script planted between them."""
    if dialect == "spark":
        words, join_ = "split(text, ' ')", "array_join"
        first = f"{join_}(slice({words}, 1, size({words}) div 2), ' ')"
        second = (
            f"{join_}(slice({words}, size({words}) div 2 + 1, "
            f"size({words}) - size({words}) div 2), ' ')"
        )
    else:
        words = "string_split(text, ' ')"
        first = f"array_to_string(list_slice({words}, 1, len({words}) // 2), ' ')"
        second = (
            f"array_to_string(list_slice({words}, len({words}) // 2 + 1, "
            f"len({words})), ' ')"
        )
    head = _HTML_HEAD.replace("'", "''")
    mid = _HTML_MID.replace("'", "''")
    tail = _HTML_TAIL.replace("'", "''")
    tmpl = (
        f"'{head}' || {first} || '{mid}' || {second} || '{tail}'"
    )
    id_str = (
        "CAST(doc_id AS STRING)" if dialect == "spark" else "CAST(doc_id AS VARCHAR)"
    )
    return tmpl.replace("#ID#", f"' || {id_str} || '").replace(
        "#LANG#", "' || lang || '"
    )


@query(
    "q_text_extract_html",
    oracle=f"""
    WITH page AS (
      SELECT doc_id, {_synth_sql('duckdb')} AS html FROM documents
    ), art AS (
      SELECT doc_id, CAST(LENGTH(html) AS BIGINT) AS html_chars,
             regexp_extract(regexp_replace(html, '{_RE_SCRIPT}', '', 'g'),
                            '{_RE_ARTICLE}', 1) AS a
      FROM page
    )
    SELECT doc_id, html_chars,
           TRIM(regexp_replace(
                  replace(
                    regexp_replace(
                      regexp_replace(a, '{_RE_HEADING}', '', 'g'),
                      '{_RE_AD}', '', 'g'),
                    '</p><p>', ' '),
                  '{_RE_TAG}', '', 'g')) AS text_extracted
    FROM art
    """,
)
def text_extract_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML/markup main-text extraction — strip tags, scripts, styles,
    navigation, ads and footer boilerplate from a crawled page and
    recover the article text, the stage that runs BEFORE everything
    else in a crawl-to-corpus pipeline (reference scope: the engine's
    text operators assume extraction already happened; this closes
    that gap Spark-first). Extraction order is the part that carries
    semantics: script blocks go FIRST (their bodies legally contain
    `<` and `>`, so naive tag-stripping corrupts the page), then the
    <article> region is selected (dropping head/nav/footer wholesale —
    the main-content selection step), then heading and inline-ad
    blocks are removed, paragraph boundaries become single spaces, and
    remaining tags are stripped.

    The planted article text round-trips byte-exactly (pinned in
    tests/test_curation.py), so the whole downstream corpus stack —
    ``q_corpus_select``'s dedup→LM-gate→DSIR-gate chain included —
    is certified to consume crawl HTML through this operator
    unchanged. Real-world deltas (entity decoding inside the article,
    nested articles, malformed tags) are data-dependent policy, not
    plan shape; the regexes are the contract surface to extend.

    Scale shape: pure map — zero exchanges, zero UDFs (JVM regex
    inside whole-stage codegen); at 100 TB this is exactly as
    parallel as the scan, and column pruning reaches the parquet
    reader (only doc_id/text/lang are read)."""
    d = load(spark, sf_dir, "documents")
    page = d.selectExpr("doc_id", f"{_synth_sql('spark')} AS html")
    art = page.select(
        "doc_id",
        F.length("html").cast("long").alias("html_chars"),
        F.regexp_extract(
            F.regexp_replace("html", _RE_SCRIPT, ""), _RE_ARTICLE, 1
        ).alias("a"),
    )
    return art.select(
        "doc_id",
        "html_chars",
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace("a", _RE_HEADING, ""), _RE_AD, ""
                    ),
                    "</p><p>",
                    " ",
                ),
                _RE_TAG,
                "",
            )
        ).alias("text_extracted"),
    )


# ----------------------------------- quality-aware dedup (round 9)

# Source-priority classes for q_dedup_keep_best's planted copies. The
# natural fixture has ZERO exact-duplicate groups at sf0.001/sf0.01
# (8 at sf0.1), so the key uses the synthesize-then-verify pattern
# (operators/multimodal.py, llm._aug_embeddings): plant copies in BOTH
# engines with pure projection arithmetic so the keep decision is
# non-vacuous at every SF and every selection is oracle-certified.
_KEEP_BEST_MIRROR_OFFSET = 1_000_000
_KEEP_BEST_CURATED_OFFSET = 2_000_000


@query(
    "q_dedup_keep_best",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + {_KEEP_BEST_MIRROR_OFFSET}, text, 'mirror'
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + {_KEEP_BEST_CURATED_OFFSET}, text, 'curated'
      FROM documents WHERE doc_id % 11 = 0
    ), g AS (
      SELECT md5(text) AS h, doc_id, source,
             CASE source WHEN 'curated' THEN 2
                         WHEN 'mirror' THEN 0
                         ELSE 1 END AS prio
      FROM aug
    ), r AS (
      SELECT h, doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY h
                                ORDER BY prio DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY h) AS n
      FROM g
    )
    SELECT h AS text_hash, doc_id AS keep_doc_id,
           source AS keep_source, CAST(n AS BIGINT) AS n_copies
    FROM r WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact dedup — the keep DECISION real curation
    pipelines make (Dolma/CCNet source preference): within each
    duplicate group keep the copy from the highest-priority source
    (curated > original corpus > mirror), tie-broken on the smallest
    doc_id — NOT blindly the smallest id (``q_dedup_exact``'s rule;
    the planted curated copies carry the LARGEST ids precisely so the
    two rules disagree and the oracle certifies the priority logic).

    Corpus augmentation (both engines, pure projection): every 7th
    document gains a 'mirror' copy (priority below everything — the
    re-crawl/mirror-site case) and every 11th a 'curated' copy
    (priority above — the hand-cleaned re-release case).

    Scale shape: the augmented corpus is a union of three projections
    of one scan (no extra shuffle); the group key is the 16-byte md5,
    never the text; the argmax folds into ONE aggregate pass as
    ``min(struct(-prio, doc_id, source))`` — Spark plans struct-min as
    SortAggregate (not hash-buffer-able) but keeps the map-side
    partial_min combine, so exactly one exchange moves (md5, struct,
    count) rows and the text never shuffles (plan-pinned in
    tests/test_plan_audit.py). Reference parity: the reference has no
    dedup at all (SURVEY §2 B.9 extension surface)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    mirror = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + _KEEP_BEST_MIRROR_OFFSET).alias("doc_id"),
        "text",
        F.lit("mirror").alias("source"),
    )
    curated = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + _KEEP_BEST_CURATED_OFFSET).alias("doc_id"),
        "text",
        F.lit("curated").alias("source"),
    )
    aug = d.unionAll(mirror).unionAll(curated)
    prio = (
        F.when(F.col("source") == "curated", 2)
        .when(F.col("source") == "mirror", 0)
        .otherwise(1)
    )
    best = F.min(
        F.struct(
            (-prio).alias("np"),
            F.col("doc_id").alias("d"),
            F.col("source").alias("s"),
        )
    )
    return (
        aug.groupBy(F.md5("text").alias("text_hash"))
        .agg(best.alias("b"), F.count("*").alias("n_copies"))
        .select(
            "text_hash",
            F.col("b.d").alias("keep_doc_id"),
            F.col("b.s").alias("keep_source"),
            "n_copies",
        )
    )
