"""Vector expressions over array columns (embedding math without UDFs).

Determinism contract (shared with every DuckDB oracle): cast float →
double BEFORE any arithmetic, accumulate left-to-right with a plain
fold, and combine as dot / (norm_a * norm_b) — the exact association
order the oracles mirror.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["to_double_array", "dot", "norm", "cosine"]


def to_double_array(col: Column | str) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] via zip_with + fold (inputs must already be double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: Column, na: Column, b: Column, nb: Column) -> Column:
    """Cosine from precomputed norms: dot/(na*nb)."""
    return dot(a, b) / (na * nb)
