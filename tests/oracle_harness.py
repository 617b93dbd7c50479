"""Local replica of the driver's oracle-differential check
(SURVEY.md §5.2): run the registered Spark query and its DuckDB SQL
twin over the same parquet tables and compare row count, column names,
and an order-insensitive multiset of normalized row values.

Stricter than the driver can possibly be: values are compared EXACTLY
(no float tolerance) — if this passes, any reasonable value-hash
passes.
"""

from __future__ import annotations

import math
import os
from collections import Counter
from decimal import Decimal

import duckdb

from steaminganalysis_spark.schemas import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        # Exact comparison: canonical decimal string, NOT a lossy float
        # cast — a sub-double-ulp (or >2^53) decimal mismatch must fail.
        # normalize() strips trailing zeros so 1.10 == 1.1; a query
        # whose two sides disagree on decimal-vs-double typing now
        # surfaces as a schema/value mismatch instead of passing
        # silently (the determinism conventions cast both sides to
        # double, so decimals should not normally reach the compare).
        return format(v.normalize(), "f")
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if hasattr(v, "isoformat"):  # datetime/date — should not appear per conventions
        return v.isoformat()
    return v


def normalize_rows(rows, colnames):
    """Sort columns by name (the driver's comparison is column-name
    keyed), normalize values, return a multiset of tuples."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def _duck_type_class(t) -> str:
    """Coarse type class of a DuckDB type string — the granularity at
    which the driver's value hash is representation-sensitive. DuckDB
    promotes ANY integer SUM (plain or windowed) to HUGEINT/DECIMAL
    (arrow decimal128), whose pandas value is a ``Decimal`` — hashing
    differently from Spark's int64 even when the values are equal
    (round-2's q_tpch_q12 red row). fetchall() hides the difference by
    converting integer-valued HUGEINTs to Python int, so the value compare
    alone cannot catch this class; the type-class check does."""
    t = str(t).upper()
    if t.startswith("DECIMAL") or t == "HUGEINT":
        return "decimal"
    if t in {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}:
        return "int"
    if t in {"FLOAT", "REAL", "DOUBLE"}:
        return "float"
    if t == "VARCHAR":
        return "string"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return t


def _spark_type_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.ArrayType, T.StructType, T.MapType)):
        return "nested"
    return dt.simpleString()


def type_class_problems(sdf_schema, duck_cols, duck_types, name: str) -> list[str]:
    """Compare Spark and DuckDB output type classes column-by-column.
    Requires no query execution on either side — cheap enough to run
    over the whole registry."""
    problems = []
    duck_by_name = {c: t for c, t in zip(duck_cols, duck_types)}
    for f in sdf_schema.fields:
        if f.name not in duck_by_name:
            continue  # column-name mismatch reported elsewhere
        sc, dc = _spark_type_class(f.dataType), _duck_type_class(duck_by_name[f.name])
        if sc != dc:
            problems.append(
                f"{name}: column {f.name!r} type-class mismatch "
                f"spark={sc} ({f.dataType.simpleString()}) vs "
                f"oracle={dc} ({duck_by_name[f.name]}) — a driver "
                f"value-hash red even if values are equal"
            )
    return problems


def compare_query(spark, name: str, sf_dir: str, queries, oracle) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sdf = queries[name](spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns

    if name not in oracle:
        if len(srows) == 0 and name not in ALLOW_EMPTY:
            problems.append(f"{name}: rows-only check returned 0 rows")
        return problems

    con = duck_connect(sf_dir)
    orel = con.sql(oracle[name])
    ocols = orel.columns
    orows = orel.fetchall()

    if sorted(scols) != sorted(ocols):
        problems.append(f"{name}: columns {sorted(scols)} != oracle {sorted(ocols)}")
        return problems
    problems.extend(type_class_problems(sdf.schema, ocols, orel.types, name))
    if len(srows) != len(orows):
        problems.append(f"{name}: rowcount {len(srows)} != oracle {len(orows)}")
    sset = normalize_rows([tuple(r) for r in srows], scols)
    oset = normalize_rows(orows, ocols)
    if sset != oset:
        diff_s = list((sset - oset).items())[:3]
        diff_o = list((oset - sset).items())[:3]
        problems.append(
            f"{name}: value multiset mismatch; spark-only={diff_s} oracle-only={diff_o}"
        )
    return problems


# rows-only queries where an empty result is legitimate
ALLOW_EMPTY = {"q_dedup_simhash", "q_sim_ann_lsh"}  # (none currently empty at sf0.01)
