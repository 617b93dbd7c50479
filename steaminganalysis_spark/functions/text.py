"""Text expressions: tokenization and shingling (JVM-side)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["tokens", "word_ngrams"]


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
