"""Geospatial operators (round 5): grid-bucketed radius self-join,
spatial density rollup, and nearest-POI assignment.

The fixtures carry no coordinates, so each entity gets DETERMINISTIC
synthetic micro-degree coordinates — a multiplicative-hash formula over
its integer key, evaluated identically in Spark and the DuckDB oracle
(pure BIGINT multiply/modulo, no floats, no RNG). The box is ~1°×1°
(10⁶ µdeg per axis) so neighbor densities are realistic at every SF.
Geometry is PLANAR within the box (µdeg² distances, no wraparound) —
the operator family under test is the JOIN STRATEGY, not geodesy;
swapping in haversine changes one expression, not the plan.

Scale posture (the 100 TB story):
- ``q_geo_radius_join`` is the canonical spatial-join shape: bucket
  points into radius-sized grid cells, explode each probe point to its
  3×3 cell neighborhood (a fixed ×9 map-side blowup), equi-join on the
  cell key, then exact-distance filter. No cross join ever exists in
  the plan; candidate count per point is bounded by local density ×
  9 cells, independent of corpus size. This is the same
  candidates-by-equi-join discipline as the LSH dedup family.
- ``q_geo_grid_density`` aggregates points to cells FIRST (map-side
  partial combine), then runs the 3×3 smoothing as a ×9 explode over
  the CELL table — O(occupied cells), never O(points).
- ``q_geo_nearest_poi`` broadcasts the POI side (facilities/stores are
  thousands, not billions) and takes a map-side argmin per point —
  zero shuffle on the point table. For POI sets too big to broadcast
  the grid-bucketed fallback is CODED (round 11): an exact two-phase
  search — certified 3×3 pitch-cell candidates, then a residue-only
  broadcast — behind GEO_POI_BROADCAST_CAP / SPARK_GRAFT_POI_JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from steaminganalysis_spark.registry import query
from steaminganalysis_spark.sources import load

BOX = 1_000_000  # µdeg per axis (~1°)
CELL = 20_000  # grid pitch = radius → 3×3 neighborhood suffices
RADIUS2 = CELL * CELL  # squared µdeg radius

# Multiplicative-hash coordinates: odd constants spread keys uniformly
# over the box; customer and supplier families use different constants
# so the two point sets are uncorrelated.
_CUST_LAT = f"(c_custkey * 2654435761) % {BOX}"
_CUST_LON = f"(c_custkey * 976369) % {BOX}"
_SUPP_LAT = f"(s_suppkey * 69069 + 123457) % {BOX}"
_SUPP_LON = f"(s_suppkey * 48271 + 98765) % {BOX}"

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

# Nearest-POI strategy switch (round 11): broadcast the POI table
# below the cap (thousands of facilities — the realistic case), grid
# two-phase search above it. GEO_POI_PITCH is the grid pitch of the
# fallback — production tunes it to POI density so the certified
# phase resolves most points and the residue stays small.
GEO_POI_BROADCAST_CAP = 4_000_000
GEO_POI_PITCH = 100_000

# POI row count per sf_dir: the auto-mode strategy pick needs the
# cardinality once; without the cache every invocation ran a separate
# count() action just to choose a join strategy (ADVICE r11). Tiny and
# immutable per fixture dir, so a process-lifetime dict is safe; on a
# real deployment this is one catalog-statistics lookup.
_POI_COUNT_CACHE: dict[str, int] = {}


def _poi_count(spark: SparkSession, sf_dir: str) -> int:
    if sf_dir not in _POI_COUNT_CACHE:
        _POI_COUNT_CACHE[sf_dir] = load(spark, sf_dir, "supplier").count()
    return _POI_COUNT_CACHE[sf_dir]


# Customer-key bounds per sf_dir (r18): the radius-join argmin pack
# needs MIN/MAX of the key column once to prove the 34-bit packing
# safe. Answered from parquet FOOTER STATS (aggregate pushdown — no
# data scan) and cached like the POI count above; on a real deployment
# this is the same catalog-statistics lookup.
_CUST_KEY_BOUNDS_CACHE: dict[str, tuple[int | None, int]] = {}


def _cust_key_bounds(spark: SparkSession, sf_dir: str) -> tuple[int | None, int]:
    if sf_dir not in _CUST_KEY_BOUNDS_CACHE:
        row = (
            load(spark, sf_dir, "customer")
            .agg(F.min("c_custkey").alias("lo"), F.max("c_custkey").alias("hi"))
            .collect()[0]
        )
        _CUST_KEY_BOUNDS_CACHE[sf_dir] = (row["lo"], row["hi"] or 0)
    return _CUST_KEY_BOUNDS_CACHE[sf_dir]


def _customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS id",
        f"{_CUST_LAT} AS lat",
        f"{_CUST_LON} AS lon",
    )


@query(
    "q_geo_radius_join",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey AS id, {_CUST_LAT} AS lat, {_CUST_LON} AS lon
      FROM customer
    ),
    cells AS (SELECT *, lat // {CELL} AS cx, lon // {CELL} AS cy FROM pts),
    offs AS (SELECT a.dx, b.dy
             FROM (VALUES (-1),(0),(1)) a(dx), (VALUES (-1),(0),(1)) b(dy)),
    cand AS (
      SELECT a.id AS id, b.id AS nid,
             (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon) AS dist2
      FROM cells a
      JOIN offs ON TRUE
      JOIN cells b ON b.cx = a.cx + offs.dx AND b.cy = a.cy + offs.dy
                  AND a.id <> b.id
      WHERE (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon)
            <= {RADIUS2}
    )
    SELECT id, n_neighbors, nid AS nearest_id, dist2 AS nearest_dist2
    FROM (
      SELECT id, nid, dist2,
             CAST(COUNT(*) OVER (PARTITION BY id) AS BIGINT) AS n_neighbors,
             ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist2, nid) AS rn
      FROM cand
    ) WHERE rn = 1
    """,
)
def geo_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius self-join via grid bucketing: every customer point against
    every other within RADIUS µdeg, found by exploding each point to its
    3×3 cell neighborhood and EQUI-joining on the neighbor cell key —
    the plan contains no cross join and candidate volume scales with
    local density, not N². Emits per-point neighbor count plus the
    nearest neighbor (squared-distance argmin, id tie-break, all exact
    BIGINT arithmetic). Cell pitch == radius guarantees completeness:
    any pair within R is at most one cell apart on each axis.

    Argmin pack (r18, guide §2.3 — the butterfly packed-key recipe):
    ``min(struct(dist2, nid))`` forces a SortAggregate (struct
    aggregation buffers are not hash-aggregable), i.e. a full sort on
    BOTH sides of the candidate exchange. The candidate filter already
    bounds ``dist2 ≤ RADIUS2`` (< 2²⁹) at compile time, so when the
    neighbor ids are proven in ``[0, 2³⁴)`` (one footer-stats MIN/MAX
    probe on the key column — parquet aggregate pushdown, no data
    scan; cached per fixture dir like the POI-count statistics
    lookup), the ordered pair packs into ONE long
    ``(dist2 << 34) | nid`` whose natural order IS the lexicographic
    order — plain ``min`` over a long, HashAggregate on both sides of
    the exchange, zero sorts. Unpack restores the exact columns;
    unprovable key bounds keep the struct argmin."""
    pts = _customer_points(spark, sf_dir).selectExpr(
        "*", f"lat div {CELL} AS cx", f"lon div {CELL} AS cy"
    )
    probe = pts.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in _OFFSETS
                ]
            )
        ).alias("o"),
    ).selectExpr("id", "lat", "lon", "cx + o.dx AS ncx", "cy + o.dy AS ncy")
    build = pts.selectExpr("id AS nid", "lat AS nlat", "lon AS nlon", "cx", "cy")
    dist2 = (F.col("lat") - F.col("nlat")) * (F.col("lat") - F.col("nlat")) + (
        F.col("lon") - F.col("nlon")
    ) * (F.col("lon") - F.col("nlon"))
    cand = (
        probe.join(
            build,
            (F.col("ncx") == F.col("cx")) & (F.col("ncy") == F.col("cy")),
        )
        .filter(F.col("id") != F.col("nid"))
        .select("id", "nid", dist2.alias("dist2"))
        .filter(F.col("dist2") <= RADIUS2)
    )
    lo, hi = _cust_key_bounds(spark, sf_dir)
    if (
        lo is not None
        and lo >= 0
        and hi < (1 << 34)
        and RADIUS2 <= ((1 << 63) - 1) >> 34
    ):
        nid_dt = pts.schema["id"].dataType
        packed = (
            F.shiftleft(F.col("dist2").cast("long"), 34)
            + F.col("nid").cast("long")
        ).alias("pm")
        return (
            cand.select("id", packed)
            .groupBy("id")
            .agg(
                F.count("*").alias("n_neighbors"),
                F.min("pm").alias("m"),
            )
            .select(
                "id",
                "n_neighbors",
                F.col("m").bitwiseAND(F.lit((1 << 34) - 1)).cast(nid_dt).alias("nearest_id"),
                F.shiftrightunsigned(F.col("m"), 34).alias("nearest_dist2"),
            )
        )
    return (
        cand.groupBy("id")
        .agg(
            F.count("*").alias("n_neighbors"),
            F.min(F.struct("dist2", "nid")).alias("m"),
        )
        .select(
            "id",
            "n_neighbors",
            F.col("m.nid").alias("nearest_id"),
            F.col("m.dist2").alias("nearest_dist2"),
        )
    )


@query(
    "q_geo_grid_density",
    oracle=f"""
    WITH pts AS (
      SELECT ({_CUST_LAT}) // {CELL} AS cx, ({_CUST_LON}) // {CELL} AS cy
      FROM customer
    ),
    counts AS (SELECT cx, cy, CAST(COUNT(*) AS BIGINT) AS n
               FROM pts GROUP BY 1, 2),
    offs AS (SELECT a.dx, b.dy
             FROM (VALUES (-1),(0),(1)) a(dx), (VALUES (-1),(0),(1)) b(dy)),
    smoothed AS (
      SELECT c.cx + offs.dx AS cx, c.cy + offs.dy AS cy,
             CAST(SUM(n) AS BIGINT) AS smoothed_n
      FROM counts c JOIN offs ON TRUE
      GROUP BY 1, 2
    )
    SELECT c.cx, c.cy, c.n, s.smoothed_n
    FROM counts c JOIN smoothed s ON c.cx = s.cx AND c.cy = s.cy
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial density rollup with 3×3 neighborhood smoothing (a
    KDE-lite hot-spot surface): points collapse to grid-cell counts
    first — map-side partial combine, one fact shuffle at cell grain —
    then every cell scatters its count to its 9 neighbors and the
    scatter re-aggregates, so the smoothing pass costs O(occupied
    cells × 9) regardless of point volume. Emitted only for occupied
    cells (inner join back to the base counts)."""
    pts = _customer_points(spark, sf_dir).selectExpr(
        f"lat div {CELL} AS cx", f"lon div {CELL} AS cy"
    )
    counts = pts.groupBy("cx", "cy").agg(F.count("*").alias("n"))
    scattered = counts.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in _OFFSETS
                ]
            )
        ).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("tcx"),
        (F.col("cy") + F.col("o.dy")).alias("tcy"),
    )
    smoothed = scattered.groupBy("tcx", "tcy").agg(F.sum("n").alias("smoothed_n"))
    return counts.join(
        smoothed,
        (F.col("cx") == F.col("tcx")) & (F.col("cy") == F.col("tcy")),
    ).select("cx", "cy", "n", "smoothed_n")


@query(
    "q_geo_nearest_poi",
    oracle=f"""
    WITH c AS (
      SELECT c_custkey, {_CUST_LAT} AS lat, {_CUST_LON} AS lon FROM customer
    ),
    s AS (
      SELECT s_suppkey, {_SUPP_LAT} AS lat, {_SUPP_LON} AS lon FROM supplier
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, dist2 AS nearest_dist2
    FROM (
      SELECT c.c_custkey, s.s_suppkey,
             (c.lat-s.lat)*(c.lat-s.lat) + (c.lon-s.lon)*(c.lon-s.lon) AS dist2,
             ROW_NUMBER() OVER (
               PARTITION BY c.c_custkey
               ORDER BY (c.lat-s.lat)*(c.lat-s.lat)
                        + (c.lon-s.lon)*(c.lon-s.lon), s.s_suppkey
             ) AS rn
      FROM c CROSS JOIN s
    ) WHERE rn = 1
    """,
)
def geo_nearest_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility assignment: each customer mapped to its closest
    supplier by exact squared µdeg distance (suppkey tie-break). The
    POI side broadcasts while it fits — facilities number in the
    thousands at any realistic scale, so the point table never
    shuffles and the argmin is a map-side partial aggregate (the same
    brute-force-with-broadcast shape as ``q_sim_topk``).

    The POI-outgrows-broadcast fallback is CODED (round 11), not
    documented: above GEO_POI_BROADCAST_CAP (or under
    ``SPARK_GRAFT_POI_JOIN=grid``) the assignment becomes a two-phase
    EXACT grid search — (1) candidates by the radius-join discipline
    (points explode to their 3×3 GEO_POI_PITCH-cell neighborhood,
    equi-join on the cell key against the bucketed POI table; no cross
    join, candidate volume bounded by local POI density × 9); a
    candidate argmin with dist² ≤ pitch² is PROVABLY global (any POI
    outside the 3×3 block is > pitch away in L∞, hence in L2); (2)
    the residue — points whose 3×3 block holds no POI within pitch —
    re-runs the argmin with the RESIDUE side broadcast against the
    streaming POI table, so the big side never shuffles and the cross
    join is bounded by the residue count, which shrinks with POI
    density (production tunes the pitch to the density). Both paths
    pinned answer-identical; forced-grid oracle parity at 3 SFs."""
    import os

    mode = os.environ.get("SPARK_GRAFT_POI_JOIN", "auto")
    if mode not in ("auto", "broadcast", "grid"):
        raise ValueError(
            f"SPARK_GRAFT_POI_JOIN={mode!r}: expected 'auto', "
            "'broadcast' or 'grid'"
        )
    c = _customer_points(spark, sf_dir).selectExpr(
        "id AS c_custkey", "lat AS clat", "lon AS clon"
    )
    s = load(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey",
        f"{_SUPP_LAT} AS slat",
        f"{_SUPP_LON} AS slon",
    )
    dist2 = (F.col("clat") - F.col("slat")) * (F.col("clat") - F.col("slat")) + (
        F.col("clon") - F.col("slon")
    ) * (F.col("clon") - F.col("slon"))

    def argmin(pairs: DataFrame) -> DataFrame:
        return (
            pairs.select("c_custkey", "s_suppkey", dist2.alias("dist2"))
            .groupBy("c_custkey")
            .agg(F.min(F.struct("dist2", "s_suppkey")).alias("m"))
            .select(
                "c_custkey",
                F.col("m.s_suppkey").alias("nearest_suppkey"),
                F.col("m.dist2").alias("nearest_dist2"),
            )
        )

    if mode == "broadcast" or (
        mode == "auto" and _poi_count(spark, sf_dir) <= GEO_POI_BROADCAST_CAP
    ):
        return argmin(c.crossJoin(F.broadcast(s)))

    # ---- grid fallback: exact two-phase search, POIs never broadcast
    p = GEO_POI_PITCH
    sg = s.selectExpr("*", f"slat div {p} AS gx", f"slon div {p} AS gy")
    c9 = c.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                    for dx, dy in _OFFSETS
                ]
            )
        ).alias("o"),
    ).selectExpr(
        "c_custkey", "clat", "clon",
        f"clat div {p} + o.dx AS gx",
        f"clon div {p} + o.dy AS gy",
    )
    best_cand = argmin(c9.join(sg, ["gx", "gy"]))
    # dist² ≤ pitch² certifies the candidate argmin globally: any POI
    # outside the 3×3 block is at L∞ distance > pitch (integer µdeg:
    # ≥ pitch+1), hence strictly farther in L2.
    safe = best_cand.filter(F.col("nearest_dist2") <= p * p).localCheckpoint(
        eager=True
    )
    residue = c.join(safe.select("c_custkey"), "c_custkey", "left_anti")
    # the residue is the small side now — broadcast IT; POIs stream
    resolved_residue = argmin(s.crossJoin(F.broadcast(residue)))
    return safe.unionByName(resolved_residue)
