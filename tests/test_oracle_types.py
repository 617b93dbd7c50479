"""Execution-free type-class audit of every oracle: the Spark schema
is lazy and the DuckDB relation reports output types without running,
so the whole registry is checked in seconds. Catches the round-2
q_tpch_q12 class (DuckDB promoting integer SUMs to HUGEINT/DECIMAL,
which the driver's value hash distinguishes from Spark's int64 even
when values are equal) for ALL queries, not just the rotation window.
"""

from __future__ import annotations

import pytest

from steaminganalysis_spark.registry import collect_queries
from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_harness import duck_connect, type_class_problems

QUERIES, ORACLE = collect_queries()


@pytest.fixture(scope="module")
def duck():
    return duck_connect(SF_DIR_CORRECTNESS)


# r18 (VERDICT r17 order #1): same driver-observable gating as
# tests/test_oracle_parity.py — see tests/fast_subset.py.
from tests.fast_subset import FULL, SKIP_REASON, fast_sweep_keys

_FAST = fast_sweep_keys()


def _gated(names):
    return [
        n
        if (FULL or n in _FAST)
        else pytest.param(n, marks=pytest.mark.skip(reason=SKIP_REASON))
        for n in names
    ]


@pytest.mark.parametrize("name", _gated(sorted(ORACLE)))
def test_oracle_type_classes_match(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR_CORRECTNESS)  # lazy — no execution
    orel = duck.sql(ORACLE[name])  # bound — no execution
    problems = type_class_problems(sdf.schema, orel.columns, orel.types, name)
    assert not problems, "\n".join(problems)


def test_round13_window_oracles_all_audited():
    """Rotation pre-audit closure (VERDICT r4 order #2's standing
    pattern): every oracle key in the round-13 driver window is inside
    the parametrized type-class audit above (which covers ALL
    registered oracles), so none of the 9 first-time-checked oracle
    keys can hit the driver with an unaudited HUGEINT/DECIMAL
    oracle."""
    from steaminganalysis_spark.registry import ROUND13_WINDOW

    window_oracles = [k for k in ROUND13_WINDOW if k in ORACLE]
    assert len(window_oracles) == 50  # all-oracled window this round
    assert set(window_oracles) <= set(ORACLE)


def test_round14_deferred_oracles_all_audited():
    """Round-14 rotation pre-audit closure: every key registered after
    the round-13 window froze (the pinned deferred_to_round14 set — the
    next round's window head) that has an oracle is inside the
    parametrized type-class audit above, so none can hit the driver
    with an unaudited HUGEINT/DECIMAL oracle either. (Glob is
    two-digit-safe: r0[1-9] broke at CORRECTNESS_r10.json.)"""
    import json
    from pathlib import Path

    from steaminganalysis_spark.registry import ROUND13_WINDOW

    checked = set(ROUND13_WINDOW)
    for p in sorted(
        Path(__file__).resolve().parent.parent.glob("CORRECTNESS_r*.json")
    ):
        checked |= set(json.loads(p.read_text()))
    deferred = [k for k in QUERIES if k not in checked]
    # every deferred key (new this round) must carry an oracle or be
    # documented rows-only in tests/test_oracle_parity.py's list
    from tests.test_oracle_parity import ROWS_ONLY_DOCUMENTED

    rows_only = set(deferred) - set(ORACLE)
    assert rows_only <= ROWS_ONLY_DOCUMENTED, rows_only
