"""Text expressions: tokenization and shingling (JVM-side)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "word_ngrams",
    "shingle_hashes",
    "cap_document_frequency",
    "minhash_band_signatures",
]


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (the fixtures are single-space separated)."""
    return F.split(text, " ")


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-grams as space-joined strings; empty array when the
    document has fewer than n tokens (sequence() would otherwise count
    backwards)."""
    size = F.size(toks)
    return F.when(
        size >= n,
        F.transform(
            F.sequence(F.lit(0), size - n),
            lambda i: F.concat_ws(" ", *[toks[i + k] for k in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hashes(df, text_col: str = "text", id_col: str = "doc_id", n: int = 3):
    """Distinct (id, xxhash64(word-n-gram)) rows — the 8-byte-key shingle
    set every Jaccard/MinHash operator joins and shuffles on (never the
    shingle strings themselves)."""
    toks = df.select(id_col, tokens(text_col).alias("_t"))
    return (
        toks.select(id_col, F.explode(word_ngrams(F.col("_t"), n)).alias("_sh"))
        .select(id_col, F.xxhash64("_sh").alias("h"))
        .distinct()
    )


def cap_document_frequency(
    sh, id_col: str = "doc_id", df_cap: int = 1000, key_col: str = "h"
):
    """Drop shingles that appear in more than ``df_cap`` documents
    before any shingle self-join — the skew guard every production
    near-dedup system applies (a stopword-ish shingle shared by k docs
    creates k² join rows in its bucket; one shingle in 10⁶ docs is
    10¹² pairs — a single-key job killer at corpus scale).

    Semantics: a shingle in >df_cap docs carries ~zero signal for
    near-duplicate detection (it is corpus boilerplate, not shared
    authorship), so dropping it barely moves Jaccard scores while
    bounding the worst bucket to df_cap² pairs. Input rows are distinct
    (id, key), so COUNT(*) per key IS the document frequency. The DF
    aggregate and the anti-join both key on ``key_col`` (default the
    hashed ``h``; the portable-MinHash path passes the raw ``shingle``
    string its cross-engine md5 hash derives from) — the same key the
    caller's self-join shuffles on — so the guard rides the existing
    partitioning rather than adding an independent shuffle chain."""
    hot = (
        sh.groupBy(key_col)
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") > df_cap)
        .select(key_col)
    )
    return sh.join(hot, key_col, "left_anti")


def minhash_band_signatures(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_minhash: int = 32,
    n_bands: int = 8,
    shingle_n: int = 3,
):
    """MinHash-LSH band signatures: (id, band, sig) — docs sharing any
    (band, sig) are near-dup candidates. Shared kernel of the batch
    `q_dedup_near` operator and the streaming incremental index
    (`streaming.neardup`): signatures are a pure function of the text,
    so batch and stream agree row-for-row."""
    sh = shingle_hashes(df, text_col, id_col, shingle_n)
    mins = sh.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"mh{i}")
            for i in range(n_minhash)
        ]
    )
    rows_per_band = n_minhash // n_bands
    return mins.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.hash(
                            *[
                                F.col(f"mh{bi * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("sig"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("_bs"),
    ).select(id_col, "_bs.band", "_bs.sig")
