"""Pins for operators/geo.py beyond oracle parity: the grid join's
COMPLETENESS against a brute-force all-pairs recompute (the property
the 3×3 neighborhood explode must guarantee), and the plan shapes that
make the family scale — equi-join candidates, broadcast POI side."""

from __future__ import annotations

import numpy as np
import pandas as pd

from steaminganalysis_spark.operators.geo import BOX, CELL, RADIUS2
from steaminganalysis_spark.plans import (
    assert_no_cartesian,
    count_exchanges,
    physical_plan,
)
from steaminganalysis_spark.registry import collect_queries

QUERIES, _ = collect_queries()
SF = "/root/testdata/sf0.001"


def _coords(keys: np.ndarray, mul: int, add: int = 0) -> np.ndarray:
    return (keys.astype(np.int64) * mul + add) % BOX


def test_radius_join_complete_vs_brute_force(spark):
    """Every within-radius pair the O(N²) scan finds, the grid join
    must find — including pairs that straddle cell boundaries — and
    the nearest/tie-break must agree exactly."""
    out = {r.id: r for r in QUERIES["q_geo_radius_join"](spark, SF).collect()}
    keys = pd.read_parquet(f"{SF}/customer.parquet")["c_custkey"].to_numpy()
    lat, lon = _coords(keys, 2654435761), _coords(keys, 976369)
    d2 = (lat[:, None] - lat[None, :]) ** 2 + (lon[:, None] - lon[None, :]) ** 2
    np.fill_diagonal(d2, RADIUS2 + 1)
    within = d2 <= RADIUS2
    expected_ids = set()
    for i in range(len(keys)):
        nbrs = np.flatnonzero(within[i])
        if not len(nbrs):
            continue
        expected_ids.add(int(keys[i]))
        row = out[int(keys[i])]
        assert row.n_neighbors == len(nbrs)
        best = min((int(d2[i, j]), int(keys[j])) for j in nbrs)
        assert (row.nearest_dist2, row.nearest_id) == best
    assert set(out) == expected_ids


def test_radius_join_no_cartesian(spark):
    """Candidates come from a cell equi-join — a cross join here is the
    N² plan the operator exists to avoid."""
    assert_no_cartesian(QUERIES["q_geo_radius_join"](spark, SF))


def test_radius_join_argmin_pack_hash_aggregate_and_fallback(spark):
    """r18 argmin pack pins: (a) with provable key bounds the packed
    path aggregates with HashAggregate — no SortAggregate, no Sort
    around the candidate exchange (the pack's whole point); (b) the
    struct-argmin FALLBACK (unprovable bounds) returns the identical
    result, so the runtime guard can take either branch safely."""
    from steaminganalysis_spark.operators import geo as GEO

    # sf0.01: the only fixture SF dense enough for within-radius pairs
    sf = "/root/testdata/sf0.01"
    packed_df = QUERIES["q_geo_radius_join"](spark, sf)
    plan = physical_plan(packed_df)
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan
    packed = {tuple(r) for r in packed_df.collect()}
    assert packed, "radius join empty at fixture SF — vacuous pin"

    # poison the cached bounds so the guard refuses the pack
    old = GEO._CUST_KEY_BOUNDS_CACHE.get(sf)
    GEO._CUST_KEY_BOUNDS_CACHE[sf] = (None, 0)
    try:
        fb_df = QUERIES["q_geo_radius_join"](spark, sf)
        assert "SortAggregate" in physical_plan(fb_df)
        assert {tuple(r) for r in fb_df.collect()} == packed
    finally:
        if old is None:
            GEO._CUST_KEY_BOUNDS_CACHE.pop(sf, None)
        else:
            GEO._CUST_KEY_BOUNDS_CACHE[sf] = old


def test_grid_density_smoothing_conserves_mass(spark):
    """Each cell scatters its count to 9 targets: summing n over every
    cell a point contributes to must equal 9 × total points minus the
    scatter that fell on UNOCCUPIED cells — checked exactly via a
    pandas recompute of the full scatter."""
    rows = QUERIES["q_geo_grid_density"](spark, SF).collect()
    keys = pd.read_parquet(f"{SF}/customer.parquet")["c_custkey"].to_numpy()
    cx = _coords(keys, 2654435761) // CELL
    cy = _coords(keys, 976369) // CELL
    counts: dict[tuple[int, int], int] = {}
    for x, y in zip(cx, cy):
        counts[(int(x), int(y))] = counts.get((int(x), int(y)), 0) + 1
    for r in rows:
        assert r.n == counts[(r.cx, r.cy)]
        expect = sum(
            counts.get((r.cx + dx, r.cy + dy), 0)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        )
        assert r.smoothed_n == expect
    assert len(rows) == len(counts)


def test_nearest_poi_broadcasts_poi_side(spark):
    """The declared brute-force shape: POI side broadcast into a
    nested-loop join (never a CartesianProduct — that would shuffle
    both sides), argmin as a partial aggregate, and the only shuffle
    is the final per-customer merge."""
    df = QUERIES["q_geo_nearest_poi"](spark, SF)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    assert count_exchanges(df) == 1
    assert df.count() == len(pd.read_parquet(f"{SF}/customer.parquet"))


def test_nearest_poi_grid_fallback_equals_broadcast(spark, monkeypatch):
    """The POI-outgrows-broadcast grid fallback (two-phase exact
    search) must return the IDENTICAL assignment as the broadcast
    argmin — same nearest suppkey, same distance, same tie-breaks —
    and its certified phase must actually resolve points (the 3×3
    pitch-cell guarantee is doing work, not everything falling through
    to the residue)."""
    from steaminganalysis_spark.operators.geo import GEO_POI_PITCH
    from steaminganalysis_spark.registry import collect_queries

    QUERIES, _ = collect_queries()
    sf = "/root/testdata/sf0.01"
    base = sorted(
        map(tuple, QUERIES["q_geo_nearest_poi"](spark, sf).collect())
    )
    monkeypatch.setenv("SPARK_GRAFT_POI_JOIN", "grid")
    grid = sorted(
        map(tuple, QUERIES["q_geo_nearest_poi"](spark, sf).collect())
    )
    assert grid == base
    # the certified phase resolves a meaningful share: points whose
    # nearest POI is within one pitch never reach the residue pass
    certified = sum(1 for _, _, d2 in grid if d2 <= GEO_POI_PITCH**2)
    assert certified >= len(grid) * 0.5, (certified, len(grid))


def test_nearest_poi_rejects_unknown_mode(spark, monkeypatch):
    import pytest as _pytest

    from steaminganalysis_spark.registry import collect_queries

    QUERIES, _ = collect_queries()
    monkeypatch.setenv("SPARK_GRAFT_POI_JOIN", "nope")
    with _pytest.raises(ValueError, match="SPARK_GRAFT_POI_JOIN"):
        QUERIES["q_geo_nearest_poi"](spark, "/root/testdata/sf0.001")
