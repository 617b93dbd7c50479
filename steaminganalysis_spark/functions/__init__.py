"""Reusable JVM-side expression builders (all whole-stage-codegen'd
higher-order functions — no Python in any of these)."""

from steaminganalysis_spark.functions.vector import cosine, dot, norm, to_double_array
from steaminganalysis_spark.functions.text import (
    cap_document_frequency,
    minhash_band_signatures,
    shingle_hashes,
    tokens,
    word_ngrams,
)

__all__ = [
    "cosine",
    "dot",
    "norm",
    "to_double_array",
    "tokens",
    "word_ngrams",
    "shingle_hashes",
    "cap_document_frequency",
    "minhash_band_signatures",
]
