"""Driver-observable fast subset of the whole-registry oracle sweeps
(r18, VERDICT r17 order #1).

The full suite outgrew the grading driver's pytest window (~38-40 min;
the r17 driver run truncated at ~90% with zero failures, leaving the
gate blind). The two whole-registry parametrized sweeps —
tests/test_oracle_parity.py (393 keys × construct+execute+compare) and
tests/test_oracle_types.py (358 keys × construct+bind) — are the bulk
of that time and duplicate coverage that exists elsewhere: the driver
itself oracle-checks the 50-key window, and the freeze protocol runs
the FULL registry through tools/sweep.py at two SFs plus the full
suite with SPARK_GRAFT_FULL_TESTS=1.

Default (driver-observable) runs therefore sweep a representative
subset and SKIP the rest with an explicit reason — skipped, not
deleted: the parametrization stays visible, and
``SPARK_GRAFT_FULL_TESTS=1`` restores the whole registry. Every
non-parametrized pin test in the suite runs unconditionally either
way.

The subset is: the ROUND18_WINDOW 50 (what the driver stamps this
round), every bench key (headline + extended — the timed surface), and
one oracled representative per operator module so a module-wide helper
regression still fails fast."""

from __future__ import annotations

import os

FULL = bool(os.environ.get("SPARK_GRAFT_FULL_TESTS"))

SKIP_REASON = (
    "full-suite only (set SPARK_GRAFT_FULL_TESTS=1); whole-registry "
    "parity runs via tools/sweep.py at freeze and the driver stamps "
    "the 50-key window itself"
)


def fast_sweep_keys() -> set[str]:
    from bench import HEADLINE, HEADLINE_EXTENDED
    from steaminganalysis_spark.registry import (
        ROUND18_WINDOW,
        collect_queries,
    )

    queries, oracle = collect_queries()
    keep = set(ROUND18_WINDOW) | set(HEADLINE) | set(HEADLINE_EXTENDED)
    covered_modules = {
        queries[k].__module__ for k in keep if k in queries
    }
    for name, fn in queries.items():
        if fn.__module__ not in covered_modules and name in oracle:
            keep.add(name)
            covered_modules.add(fn.__module__)
    return keep
