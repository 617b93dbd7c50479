"""Property-based cross-engine test for the repo's rounding/fixed-point
conventions — the exact bug class the round-4 sf0.1 sweep caught
(Spark's BigDecimal shortest-string rounding vs DuckDB's binary
rounding split on boundary doubles; fixed by the floor-based
``round_half_up`` / ``SQL_ROUND`` twins).

These tests feed ADVERSARIAL values — integer ratios, terminating
decimals one digit past the target scale, and random doubles — through
BOTH engines' spellings and require bit-identical results. A
convention drift that would silently split a driver value-hash shows
up here as a plain assertion."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import (
    SQL_DSUM,
    SQL_ROUND,
    dsum,
    round_half_up,
    to_cents,
)

# Integer ratios are where the two engines' native round() split:
# k/d is often a terminating decimal one digit past the scale.
RATIO = st.tuples(
    st.integers(min_value=0, max_value=10**9),
    st.integers(min_value=1, max_value=10**6),
)
DOUBLES = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


def _duck_eval(expr_sql: str, values: list[float], colname: str = "x") -> list:
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t ({colname} DOUBLE)")
    con.executemany(f"INSERT INTO t VALUES (?)", [(v,) for v in values])
    return [r[0] for r in con.execute(f"SELECT {expr_sql} FROM t ORDER BY rowid").fetchall()]


@settings(max_examples=10, deadline=None)
@given(st.lists(RATIO, min_size=1, max_size=25))
def test_round_half_up_matches_duckdb_on_ratios(spark, ratios):
    values = [k / d for k, d in ratios]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [
        r["y"]
        for r in df.select(round_half_up(F.col("x")).alias("y")).collect()
    ]
    want = _duck_eval(SQL_ROUND("x"), values)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(DOUBLES, min_size=1, max_size=25), st.integers(min_value=0, max_value=6))
def test_round_half_up_matches_duckdb_on_doubles(spark, values, scale):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [
        r["y"]
        for r in df.select(round_half_up(F.col("x"), scale).alias("y")).collect()
    ]
    want = _duck_eval(SQL_ROUND("x", scale), values)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=40))
def test_dsum_matches_duckdb_cents_sum(spark, cents):
    """``dsum`` (exact decimal accumulation of cents) and ``SQL_DSUM``
    must agree bit-for-bit on two-decimal money values — including
    negatives, where floor(x*100 + 0.5) is NOT symmetric truncation."""
    values = [c / 100.0 for c in cents]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = df.agg(dsum(F.col("x")).alias("s")).collect()[0]["s"]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    want = con.execute(f"SELECT {SQL_DSUM('x')} FROM t").fetchone()[0]
    assert got == want


def test_to_cents_boundary_values(spark):
    """Pinned boundary cases: terminating decimals exactly one digit
    past the scale (the q_text_quality/q_tpch_q2 class) and negative
    halves. Both engines floor(x*10^s + 0.5) — same IEEE ops, same
    longs."""
    values = [0.2534375, 1477.0125, 0.005, -0.005, 2.675, -2.675, 0.015]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [r["c"] for r in df.select(to_cents(F.col("x")).alias("c")).collect()]
    want = _duck_eval(
        "CAST(FLOOR(CAST(x AS DOUBLE) * 100.0 + 0.5) AS BIGINT)", values
    )
    assert got == want
