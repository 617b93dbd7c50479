"""Iterative graph analytics (operators/graph.py): invariants and plan
shapes the DuckDB oracle can't see — value equality is covered by the
oracle-parity sweep (q_graph_pagerank has an exact unrolled-CTE twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from steaminganalysis_spark.operators.graph import DAMPING
from steaminganalysis_spark.registry import collect_queries

QUERIES, ORACLE = collect_queries()
SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pagerank_bounds_and_node_domain(spark):
    """Every rank is >= (1-d) (the teleport floor), finite, and there
    is exactly one row per nation that participates in the trade graph
    — rank mass beyond the floor only ever comes from real edges."""
    pr = QUERIES["q_graph_pagerank"](spark, SF)
    rows = pr.collect()
    assert len(rows) > 0
    assert len({r["nation"] for r in rows}) == len(rows)
    for r in rows:
        assert r["pagerank"] >= (1.0 - DAMPING) - 1e-9
        assert r["pagerank"] == r["pagerank"]  # not NaN
    # Dangling mass is dropped, so total rank is at most V (the
    # no-dangling fixed point) and at least V*(1-d).
    n = len(rows)
    total = sum(r["pagerank"] for r in rows)
    assert n * (1.0 - DAMPING) - 1e-6 <= total <= n + 1e-6


def test_pagerank_fact_join_staged_once(spark):
    """The lineitem⋈orders edge build runs ONCE (staged), not once per
    iteration: the final executed plan reads the staged edge fractions
    and never re-scans the fact tables, and the five iteration joins
    are all broadcast joins (rank vector is O(V)) — no sort-merge join
    appears after staging."""
    pr = QUERIES["q_graph_pagerank"](spark, SF)
    plan = _plan(pr)
    assert "lineitem" not in plan
    assert "orders" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_pagerank_sink_nation_outranks_sources(spark):
    """A nation that only RECEIVES trade (a dst that is never a src)
    must outrank the uniform floor if it has in-edges; conversely every
    rank above the floor implies at least one in-edge — sanity that the
    edge direction (supplier→customer) made it through the plumbing."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey", "c_nationkey")
    s = spark.read.parquet(f"{SF}/supplier.parquet").select("s_suppkey", "s_nationkey")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .distinct()
    )
    dst_nations = {
        r["n_name"]
        for r in edges.join(n, edges.dst == n.n_nationkey).select("n_name").distinct().collect()
    }
    pr = {r["nation"]: r["pagerank"] for r in QUERIES["q_graph_pagerank"](spark, SF).collect()}
    floor = 1.0 - DAMPING
    for nation, rank in pr.items():
        if rank > floor + 1e-6:
            assert nation in dst_nations


def test_triangles_match_bruteforce(spark):
    """The distributed oriented-wedge count equals a driver-side
    brute-force enumeration of the same undirected edge set (ground
    truth at fixture scale), and the summary counts are consistent."""
    from itertools import combinations

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey", "c_nationkey")
    s = spark.read.parquet(f"{SF}/supplier.parquet").select("s_suppkey", "s_nationkey")
    edges = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .select(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .collect()
        )
    }
    nodes = {n for e in edges for n in e}
    tri = sum(
        1
        for a, b, ccc in combinations(sorted(nodes), 3)
        if (a, b) in edges and (b, ccc) in edges and (a, ccc) in edges
    )
    row = QUERIES["q_graph_triangles"](spark, SF).collect()[0]
    assert row["n_triangles"] == tri
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(edges)
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert row["n_wedges"] == sum(d * (d - 1) // 2 for d in deg.values())


def test_triangles_plan_staged_and_no_cartesian(spark):
    """The fact join that builds the edge set is staged once; the wedge
    joins are equi-joins (no CartesianProduct / BroadcastNestedLoop in
    the plan) — triangle counting must never degenerate to all-pairs."""
    plan = _plan(QUERIES["q_graph_triangles"](spark, SF))
    assert "lineitem" not in plan
    assert "CartesianProduct" not in plan
    # The only nested-loop joins allowed are the two 1-row × 1-row
    # summary cross-joins (edge count + triangle count onto the degree
    # summary); the wedge joins themselves must be hash equi-joins.
    assert plan.count("BroadcastNestedLoopJoin") <= 2
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_bfs_matches_bruteforce(spark):
    """Distributed min-plus BFS equals a driver-side BFS over the same
    directed edge set from the same source (smallest participating
    nationkey); unreached nodes are absent."""
    from collections import deque

    from steaminganalysis_spark.operators.graph import _directed_edges

    edges = [(r["src"], r["dst"]) for r in _directed_edges(spark, SF).collect()]
    nodes = {n for e in edges for n in e}
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    src = min(nodes)
    dist = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        for v in adj.get(u, []):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    nat = {
        r["n_nationkey"]: r["n_name"]
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    expect = {nat[n]: d for n, d in dist.items()}
    got = {
        r["nation"]: r["distance"]
        for r in QUERIES["q_graph_bfs"](spark, SF).collect()
    }
    assert got == expect


def test_bfs_plan_staged_and_broadcast_iterations(spark):
    """The fact join is staged once (no fact re-scan in the final
    plan); every relaxation round joins the broadcast distance vector —
    no sort-merge join, no cartesian."""
    plan = _plan(QUERIES["q_graph_bfs"](spark, SF))
    assert "lineitem" not in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_jaccard_neighbors_matches_python_brute_force(spark):
    """The top-k buyer-set Jaccard ranking must equal a Python
    brute-force recompute (sets from pandas, exact integer ppm, same
    integer-only tie-breaks) — pinning the candidate equi-join's
    completeness and the cap's replication."""
    import pandas as pd

    from steaminganalysis_spark.operators.graph import (
        JACCARD_TOPK,
        MAX_BUYER_BASKET,
    )

    got = [
        (r.part_a, r.part_b, r.common_buyers, r.union_buyers, r.jac_ppm)
        for r in QUERIES["q_graph_jaccard_neighbors"](spark, SF).collect()
    ]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    orders = pd.read_parquet(f"{SF}/orders.parquet")[["o_orderkey", "o_custkey"]]
    bought = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    buyers: dict[int, set] = {}
    parts_by_cust: dict[int, set] = {}
    for c, p in set(zip(bought["o_custkey"], bought["l_partkey"])):
        parts_by_cust.setdefault(c, set()).add(p)
    for c, ps in parts_by_cust.items():
        if len(ps) <= MAX_BUYER_BASKET:
            for p in ps:
                buyers.setdefault(p, set()).add(c)
    rows = []
    parts = sorted(buyers)
    seen_pairs = {}
    for c, ps in parts_by_cust.items():
        if len(ps) > MAX_BUYER_BASKET:
            continue
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                seen_pairs[(ps[i], ps[j])] = None
    for pa, pb in seen_pairs:
        common = len(buyers[pa] & buyers[pb])
        union = len(buyers[pa] | buyers[pb])
        rows.append((pa, pb, common, union, common * 1000000 // union))
    rows.sort(key=lambda r: (-r[4], -r[2], r[0], r[1]))
    assert got == rows[:JACCARD_TOPK]


def test_label_propagation_matches_python_sync_lpa(spark):
    """The fixed-round weighted LPA must equal a Python synchronous
    recompute with the identical (max weight, min label) rule, and
    every final label must be a node inside the same connected
    component (labels only travel along edges)."""
    import pandas as pd

    from steaminganalysis_spark.operators.graph import LPA_ROUNDS

    got = {
        r.part: r.community
        for r in QUERIES["q_graph_label_propagation"](spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    li = li.drop_duplicates()
    from collections import Counter, defaultdict

    pair_w = Counter()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_w[(ps[i], ps[j])] += 1
    adj = defaultdict(dict)
    for (pa, pb), w in pair_w.items():
        if w >= 2:
            adj[pa][pb] = w
            adj[pb][pa] = w
    lbl = {v: v for v in adj}
    for _ in range(LPA_ROUNDS):
        new = {}
        for v, nbrs in adj.items():
            tw = defaultdict(int)
            for u, w in nbrs.items():
                tw[lbl[u]] += w
            best = max(tw.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lbl = new
    assert got == lbl

    # labels stay inside the connected component
    comp = {v: v for v in adj}
    changed = True
    while changed:
        changed = False
        for v, nbrs in adj.items():
            m = min([comp[v]] + [comp[u] for u in nbrs])
            if m < comp[v]:
                comp[v] = m
                changed = True
    for v, c in got.items():
        assert comp[c] == comp[v], (v, c)


def test_k_core_matches_python_fixpoint_peel(spark):
    """The fixed-round k-core must equal the Python FIXPOINT peel on
    the fixture graph — pinning both correctness and the claim that
    K_CORE_ROUNDS covers the fixpoint at this SF (the round budget is
    semantics, so budget-too-small is a value bug, not a perf bug)."""
    import pandas as pd

    from steaminganalysis_spark.operators.graph import K_CORE_K

    got = {
        (r.part, r.core_degree)
        for r in QUERIES["q_graph_k_core"](spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    by_order: dict[int, set] = {}
    for o, p in set(zip(li["l_orderkey"], li["l_partkey"])):
        by_order.setdefault(o, set()).add(p)
    from collections import Counter

    pair_orders: Counter = Counter()
    for ps in by_order.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_orders[(ps[i], ps[j])] += 1
    adj: dict[int, set] = {}
    for (a, b), c in pair_orders.items():
        if c >= 2:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < K_CORE_K}
        if not drop:
            break
        alive -= drop
    expect = {(v, len(adj[v] & alive)) for v in alive}
    assert got == expect


def test_link_predict_non_edges_and_brute_force(spark):
    """Predicted pairs must (a) never be existing co-purchase edges and
    (b) equal the Python brute-force resource-allocation ranking with
    the same integer arithmetic and tie-breaks — pinning the two-hop
    candidate join's completeness and the anti-join."""
    import pandas as pd

    from steaminganalysis_spark.operators.graph import (
        LINK_PREDICT_TOPK,
        MAX_MIDDLE_DEGREE,
    )

    got = [
        (r.part_a, r.part_b, r.common_neighbors, r.ra_ppm)
        for r in QUERIES["q_graph_link_predict"](spark, SF).collect()
    ]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    by_order: dict[int, set] = {}
    for o, p in set(zip(li["l_orderkey"], li["l_partkey"])):
        by_order.setdefault(o, set()).add(p)
    from collections import Counter

    pair_orders: Counter = Counter()
    for ps in by_order.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_orders[(ps[i], ps[j])] += 1
    edges = {p for p, c in pair_orders.items() if c >= 2}
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores: dict[tuple, list] = {}
    for z, nbrs in adj.items():
        d = len(nbrs)
        if d > MAX_MIDDLE_DEGREE:
            continue
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                key = (ns[i], ns[j])
                s = scores.setdefault(key, [0, 0])
                s[0] += 1
                s[1] += 1000000 // d
    rows = [
        (a, b, cn, ra)
        for (a, b), (cn, ra) in scores.items()
        if (a, b) not in edges
    ]
    rows.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    assert got == rows[:LINK_PREDICT_TOPK]
    for a, b, _, _ in got:
        assert (a, b) not in edges


def test_sssp_delta_frontier_and_fixpoint(spark):
    """Min-plus relaxation behavior on a synthetic 6-node weighted
    chain 0→1→…→5 (plus a costly shortcut that a later round must
    undercut): (a) each round extends the settled frontier by exactly
    one node — the per-round improvement count is the delta frontier,
    so at billion-node scale a delta-frontier variant only re-joins
    the changed slice; (b) once the fixpoint is reached, further
    rounds improve ZERO rows (relaxation is monotone and idempotent);
    (c) the fixpoint distances are the true shortest paths, with the
    expensive direct edge 0→5 beaten by the cheap chain."""
    from steaminganalysis_spark.operators.graph import min_plus_round

    edges = [(i, i + 1, 10) for i in range(5)] + [(0, 5, 99)]
    we = spark.createDataFrame(edges, "src long, dst long, w long")
    nodes = list(range(6))
    dist = spark.createDataFrame(
        [(n, 0 if n == 0 else None) for n in nodes], "node long, dist long"
    )
    improved_per_round = []
    prev = {n: None for n in nodes}
    prev[0] = 0
    for _ in range(8):  # 5 rounds to fixpoint + 3 past it
        dist = min_plus_round(we, dist)
        cur = {r.node: r.dist for r in dist.collect()}
        improved = sum(
            1
            for n in nodes
            if cur[n] is not None and (prev[n] is None or cur[n] < prev[n])
        )
        improved_per_round.append(improved)
        prev = cur
    # round 1 improves {1, 5=99}; rounds 2-4 extend the chain frontier
    # by one node each; round 5 IMPROVES node 5 (50 < 99); then zero.
    assert improved_per_round == [2, 1, 1, 1, 1, 0, 0, 0]
    assert prev == {0: 0, 1: 10, 2: 20, 3: 30, 4: 40, 5: 50}


def test_sssp_fixpoint_inside_round_budget(spark):
    """The shipped SSSP_ROUNDS budget covers the true fixpoint at the
    fixture SF: one extra relaxation round changes nothing — the
    docstring's fixed-round determinism claim is real, not truncation."""
    from steaminganalysis_spark.operators.graph import min_plus_round
    from steaminganalysis_spark.sources import load
    from steaminganalysis_spark.staging import stage

    out = QUERIES["q_graph_sssp"](spark, SF)
    got = {r.nation: r.cost for r in out.collect()}
    # rebuild the edge/dist state and run SSSP_ROUNDS + 1 rounds
    from steaminganalysis_spark.operators.graph import SSSP_ROUNDS

    li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, SF, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, SF, "supplier").select("s_suppkey", "s_nationkey")
    we = stage(
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy(F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst"))
        .agg((F.lit(1) + F.expr("1000000 DIV COUNT(*)")).cast("long").alias("w")),
        "sssp_edges",
    )
    nodes = (
        we.select(F.col("src").alias("node"))
        .union(we.select(F.col("dst").alias("node")))
        .distinct()
    )
    src = nodes.agg(F.min("node").alias("s"))
    dist = nodes.join(F.broadcast(src)).select(
        "node",
        F.when(F.col("node") == F.col("s"), F.lit(0).cast("long")).alias("dist"),
    )
    for _ in range(SSSP_ROUNDS + 1):
        dist = min_plus_round(we, dist)
    nat = load(spark, SF, "nation")
    extra = {
        r.nation: r.cost
        for r in dist.filter(F.col("dist").isNotNull())
        .join(F.broadcast(nat), dist.node == nat.n_nationkey)
        .select(F.col("n_name").alias("nation"), F.col("dist").cast("long").alias("cost"))
        .collect()
    }
    assert extra == got


def test_cc_stars_matches_union_find_and_reaches_fixpoint(spark):
    """q_graph_cc_stars: (a) labels equal an independent Python
    union-find over the same co-purchase edge set (TRUE components,
    not budget-truncated ones); (b) one extra alternating star round
    changes nothing — the STAR_ROUNDS budget covers the fixpoint with
    margin; (c) every label is the component MINIMUM (a canonical
    property HashMin-at-budget does not guarantee)."""
    import duckdb

    from steaminganalysis_spark.operators.graph import (
        STAR_ROUNDS,
        _star_round,
    )
    from steaminganalysis_spark.staging import stage

    got = {
        r.part: r.component
        for r in QUERIES["q_graph_cc_stars"](spark, SF).collect()
    }

    edges = duckdb.sql(f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey
                FROM '{SF}/lineitem.parquet'),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2)
    SELECT pa, pb FROM pairs""").fetchall()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for a, b in edges:
        truth[a] = find(a)
        truth[b] = find(b)
    assert got == truth
    # every emitted label is its component's minimum member
    comp_min: dict = {}
    for node, c in truth.items():
        comp_min[c] = min(comp_min.get(c, node), node)
    assert all(c == comp_min[c] for c in got.values())

    # fixpoint: run STAR_ROUNDS + 1 over the same staged edges — the
    # label read-out must be identical
    sym = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
    cur = stage(
        spark.createDataFrame(sym, "src long, dst long"),
        "cc_stars_fixpoint_test",
        bucket_col="src",
    )
    from pyspark.sql import functions as F2

    for _ in range(STAR_ROUNDS + 1):
        cur = _star_round(cur, large=True)
        cur = _star_round(cur, large=False).localCheckpoint(eager=True)
    lbl = {
        r.src: r.component
        for r in cur.groupBy("src")
        .agg(F2.least(F2.min("dst"), F2.first("src")).alias("component"))
        .collect()
    }
    for node, c in truth.items():
        assert lbl.get(node, node) == c, node


def test_k_truss_fixpoint_inside_round_budget_and_coherence(spark):
    """The shipped K_TRUSS_ROUNDS budget covers the true cascade
    fixpoint at this SF: one more peel round leaves the edge set
    unchanged, so the fixed-round semantics and the true k-truss
    coincide on the fixtures. Coherence: every surviving edge closes
    >= K-2 triangles within the truss, and the truss is a subset of
    the K-core's surviving edge set restricted to... (truss ⊆ edges
    whose both endpoints have degree >= K-1 inside the truss — the
    classic containment)."""
    from steaminganalysis_spark.operators.graph import K_TRUSS_K, _truss_round

    df = QUERIES["q_graph_k_truss"](spark, SF)
    rows = df.collect()
    assert rows, "k-truss empty at fixture SF — vacuous key"
    edges = {(r.src, r.dst) for r in rows}
    # every reported support honors the truss condition
    for r in rows:
        assert r.support >= K_TRUSS_K - 2, r
    # one more round is a no-op (fixpoint reached inside the budget)
    e = spark.createDataFrame(sorted(edges), "a long, b long")
    kept, _ = _truss_round(e)
    assert {(r.a, r.b) for r in kept.collect()} == edges
    # containment: within-truss endpoint degrees are >= K-1
    import collections

    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    for a, b in edges:
        assert deg[a] >= K_TRUSS_K - 1 and deg[b] >= K_TRUSS_K - 1


def test_degree_orientation_wedge_bound_and_exact_enumeration(spark):
    """`_degree_oriented` delivers the O(m^1.5) wedge bound the truss/
    triangle docstrings promise: (a) THEOREM PIN — on the part
    co-purchase edge set, max out-deg² ≤ 2m (every out-neighbor has
    degree ≥ the center's, so 2m ≥ Σ_{v∈N⁺(u)} deg(v) ≥ out-deg(u)²);
    (b) the id-orientation counterfactual on the same edge set has a
    strictly larger Σ out-deg² wedge volume (non-vacuity: the guard
    changes the actual join intermediate, not just the constant);
    (c) `_oriented_triangles` enumerates exactly the triangle set of a
    Python brute force, each exactly once."""
    from itertools import combinations

    from steaminganalysis_spark.operators.graph import (
        _degree_oriented,
        _oriented_triangles,
        load,
    )

    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("a"), F.col("b.l_partkey").alias("b"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    m = edges.count()
    assert m > 0
    o = _degree_oriented(edges)
    out = o.groupBy("src").agg(F.count("*").alias("od"))
    mx = out.agg(F.max("od")).collect()[0][0]
    assert mx * mx <= 2 * m, (mx, m)
    # wedge volume Σ C(out-deg, 2): degree orientation vs id orientation
    vol_deg = out.agg(F.sum(F.expr("(od * (od - 1)) DIV 2"))).collect()[0][0]
    vol_id = (
        edges.groupBy("a")
        .agg(F.count("*").alias("od"))
        .agg(F.sum(F.expr("(od * (od - 1)) DIV 2")))
        .collect()[0][0]
    )
    assert vol_deg < vol_id, (vol_deg, vol_id)
    # exact enumeration vs Python brute force
    es = {(r.a, r.b) for r in edges.collect()}
    adj = {}
    for x, y in es:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    expected = {
        tuple(sorted(t))
        for x in adj
        for y, z in combinations(sorted(adj[x]), 2)
        if z in adj.get(y, ())
        for t in [(x, y, z)]
    }
    got = [tuple(sorted((r.u, r.v, r.w))) for r in _oriented_triangles(edges).collect()]
    assert len(got) == len(set(got)), "a triangle was enumerated twice"
    assert set(got) == expected


def test_butterfly_matches_customer_side_brute_force(spark):
    """q_graph_butterfly counts wedges centered on CUSTOMERS (pairs of
    parts per shared buyer); this brute force counts from the OPPOSITE
    orientation — for every customer pair with m common parts, each of
    those parts gains (m-1) butterflies from that pair — so agreement
    certifies the motif count independently of the wedge side chosen,
    plus the plan stays an equi-join (no cartesian fallback)."""
    from collections import defaultdict
    from itertools import combinations

    df = QUERIES["q_graph_butterfly"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    inc = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
        .collect()
    )
    parts_of = defaultdict(set)
    for r in inc:
        parts_of[r.o_custkey].add(r.l_partkey)
    expected: dict[int, int] = defaultdict(int)
    for c1, c2 in combinations(sorted(parts_of), 2):
        common = parts_of[c1] & parts_of[c2]
        m = len(common)
        if m >= 2:
            for p in common:
                expected[p] += m - 1
    got = {r.part: r.butterflies for r in df.collect()}
    assert got == {p: n for p, n in expected.items() if n > 0}


def _butterfly_inc(spark):
    from steaminganalysis_spark.operators.graph import load

    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .repartition(F.col("c"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )


def test_butterfly_hub_peel_and_center_choice_equivalence(spark, monkeypatch):
    """The two CODED skew guards leave the answer bit-identical:
    (a) hub peel — forcing BUTTERFLY_HUB_DEGREE_CAP down to 4 routes
    most fixture centers through the salted fragment-replicate pass
    (non-vacuity asserted) and the registered key still returns the
    unguarded result; (b) center-side choice — the part-centered
    attribution path (wedge join-back) equals the customer-centered
    explode path, under both the default and the forced-hub cap."""
    from steaminganalysis_spark.operators import graph as G

    base = {tuple(r) for r in QUERIES["q_graph_butterfly"](spark, SF).collect()}
    assert base, "butterfly empty at fixture SF — vacuous pin"

    inc = _butterfly_inc(spark)
    # non-vacuity: cap 4 must actually produce hub centers
    assert inc.groupBy("c").count().filter("count > 4").count() > 0
    for center in ("c", "p"):
        for cap in (G.BUTTERFLY_HUB_DEGREE_CAP, 4):
            got = {
                tuple(r) for r in G._butterfly_counts(inc, center, cap).collect()
            }
            assert got == base, (center, cap)

    # and the registered key end-to-end under the forced cap
    monkeypatch.setattr(G, "BUTTERFLY_HUB_DEGREE_CAP", 4)
    forced = {tuple(r) for r in QUERIES["q_graph_butterfly"](spark, SF).collect()}
    assert forced == base


def test_butterfly_packed_key_equivalence_both_pivots_and_int32(spark):
    """r18 pin for the packed 64-bit pair key (ADVICE r17, medium):
    (a) ``pack_keys=True`` equals ``pack_keys=False`` on BOTH pivots —
    the part-centered join-back packs too since r18; (b) with the
    incidence keys downcast to int32 (a plausible 100 TB producer
    encoding), the pack still matches, schema included. Spark's
    shiftleft on an IntegerType column masks the shift amount mod 32,
    so without the explicit ``.cast('long')`` before shifting the
    packed pair would silently collapse to e1 + e2 while the probe's
    value-bounds guard still passed — this is the test that fails if
    that cast is ever dropped."""
    from steaminganalysis_spark.operators import graph as G

    inc = _butterfly_inc(spark)
    inc32 = inc.select(
        F.col("c").cast("int").alias("c"), F.col("p").cast("int").alias("p")
    ).localCheckpoint(eager=True)
    cap = G.BUTTERFLY_HUB_DEGREE_CAP
    for tag, frame in (("long", inc), ("int32", inc32)):
        for center in ("c", "p"):
            plain_df = G._butterfly_counts(frame, center, cap)
            packed_df = G._butterfly_counts(frame, center, cap, pack_keys=True)
            assert [(f.name, f.dataType) for f in packed_df.schema.fields] == [
                (f.name, f.dataType) for f in plain_df.schema.fields
            ], (tag, center)
            plain = {tuple(r) for r in plain_df.collect()}
            packed = {tuple(r) for r in packed_df.collect()}
            assert plain, (tag, center, "vacuous pin")
            assert packed == plain, (tag, center)


def test_butterfly_hub_fragment_bound_sub_quadratic(spark):
    """The salted hub pass bounds per-join-key work: for every hub
    center (deg > cap) the fragment split s = ceil(deg/cap) with
    fragment id xxhash64(item) mod s must keep every fragment at
    most ~cap items — so a join key (center, ob_a, ob_b) never pairs
    more than O(cap²) rows and a viral hub becomes many normal tasks,
    never one quadratic straggler. Hash imbalance gets a
    balls-in-bins allowance (4×cap — at cap 4 the bins hold ~4 ± a
    few, measured max 12) but the quadratic failure mode (a fragment
    carrying ~deg items) is excluded by the mxdeg/2 splitting
    assertion."""
    cap = 4
    inc = _butterfly_inc(spark)
    frag = (
        inc.join(inc.groupBy("c").agg(F.count("*").alias("deg")), "c")
        .filter(F.col("deg") > cap)
        .withColumn("s", F.ceil(F.col("deg") / F.lit(cap)).cast("int"))
        .withColumn(
            "ob",
            F.pmod(F.xxhash64(F.lit("bf_frag"), F.col("p")), F.col("s")).cast(
                "int"
            ),
        )
        .groupBy("c", "ob")
        .agg(F.count("*").alias("frag_n"), F.max("deg").alias("deg"))
    )
    stats = frag.agg(
        F.max("frag_n").alias("mx"), F.max("deg").alias("mxdeg")
    ).collect()[0]
    assert stats["mx"] is not None, "no hub fragments — vacuous pin"
    assert stats["mx"] <= 4 * cap, stats
    assert stats["mx"] <= stats["mxdeg"] / 2, "fragmenting did not split the hub"


def test_scc_matches_kosaraju_and_budgets_cover_fixpoint(spark):
    """q_graph_scc: (a) labels equal an independent Python Kosaraju
    over the same thresholded directed edge set (TRUE strongly
    connected components, canonical min-id labels); (b) the shipped
    budgets cover the measured coloring fixpoint WITH margin — a
    Python replay of the exact same coloring schedule counts the hops
    and rounds actually needed and asserts both land strictly inside
    SCC_INNER_ROUNDS / SCC_OUTER_ROUNDS."""
    import duckdb

    from steaminganalysis_spark.operators.graph import (
        SCC_INNER_ROUNDS,
        SCC_OUTER_ROUNDS,
    )

    got = {
        r.nation: r.scc for r in QUERIES["q_graph_scc"](spark, SF).collect()
    }

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    edges = con.execute("""
    WITH pairs AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS c
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2)
    SELECT src, dst FROM pairs
    WHERE c >= (SELECT AVG(c) FROM pairs)""").fetchall()
    names = dict(con.execute("SELECT n_nationkey, n_name FROM nation").fetchall())

    # (a) Kosaraju: order by forward-DFS finish time, then assign
    # components along reverse edges in reverse finish order.
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    fwd: dict = {u: [] for u in nodes}
    rev: dict = {u: [] for u in nodes}
    for u, v in edges:
        fwd[u].append(v)
        rev[v].append(u)
    seen: set = set()
    order: list = []
    for start in nodes:
        if start in seen:
            continue
        stack = [(start, iter(fwd[start]))]
        seen.add(start)
        while stack:
            node, it = stack[-1]
            nxt = next((w for w in it if w not in seen), None)
            if nxt is None:
                order.append(node)
                stack.pop()
            else:
                seen.add(nxt)
                stack.append((nxt, iter(fwd[nxt])))
    comp: dict = {}
    for start in reversed(order):
        if start in comp:
            continue
        members = [start]
        comp[start] = start
        while members:
            node = members.pop()
            for w in rev[node]:
                if w not in comp:
                    comp[w] = start
                    members.append(w)
    roots: dict = {}
    for node, r in comp.items():
        roots[r] = min(roots.get(r, node), node)
    truth = {names[node]: roots[comp[node]] for node in nodes}
    assert got == truth

    # (b) replay the coloring schedule, counting real hop/round needs
    active, aedges = set(nodes), set(edges)
    outer = 0
    max_hops = 0
    while active:
        outer += 1
        color = {v: v for v in active}
        hops = 0
        while True:
            new = dict(color)
            for u, v in aedges:
                if color[u] < new[v]:
                    new[v] = color[u]
            if new == color:
                break
            color, hops = new, hops + 1
        max_hops = max(max_hops, hops)
        mark = {v for v in active if color[v] == v}
        hops = 0
        while True:
            add = {
                u
                for u, v in aedges
                if v in mark and u not in mark and color[u] == color[v]
            }
            if not add:
                break
            mark |= add
            hops += 1
        max_hops = max(max_hops, hops)
        active -= mark
        aedges = {(u, v) for u, v in aedges if u in active and v in active}
    assert max_hops < SCC_INNER_ROUNDS, max_hops
    assert outer < SCC_OUTER_ROUNDS, outer


def test_anf_monotone_saturating_and_near_exact_closure(spark):
    """q_graph_anf: (a) one row per radius 0..ANF_HOPS; (b) both the
    register mass and the estimate are monotone non-decreasing in h
    (counters only ever MAX-merge upward); (c) the ball saturates
    inside the hop budget (last two radii identical); (d) accuracy vs
    an exact Python closure: ~1% at h=0 and within the documented
    fixed-hash small-domain band at saturation — parity with the
    oracle is exact, so this pin is about ESTIMATOR quality, the one
    thing the oracle cannot certify."""
    import duckdb

    from steaminganalysis_spark.operators.graph import ANF_HOPS

    rows = sorted(
        QUERIES["q_graph_anf"](spark, SF).collect(), key=lambda r: r.h
    )
    assert [r.h for r in rows] == list(range(ANF_HOPS + 1))
    for a, b in zip(rows, rows[1:]):
        assert b.reg_mass >= a.reg_mass
        assert b.nf_est_milli >= a.nf_est_milli
    assert rows[-1].reg_mass == rows[-2].reg_mass
    assert rows[-1].nf_est_milli == rows[-2].nf_est_milli

    edges = duckdb.sql(f"""
    SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
    FROM '{SF}/lineitem.parquet' l
    JOIN '{SF}/orders.parquet' o   ON l.l_orderkey = o.o_orderkey
    JOIN '{SF}/customer.parquet' c ON o.o_custkey  = c.c_custkey
    JOIN '{SF}/supplier.parquet' s ON l.l_suppkey  = s.s_suppkey
    """).fetchall()
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    adj: dict = {u: set() for u in nodes}
    for u, v in edges:
        adj[u].add(v)
    ball = {u: {u} for u in nodes}
    truth = [sum(len(b) for b in ball.values())]
    for _ in range(ANF_HOPS):
        ball = {
            u: ball[u].union(*(ball[w] for w in adj[u])) if adj[u] else ball[u]
            for u in nodes
        }
        truth.append(sum(len(b) for b in ball.values()))
    ratios = [r.nf_est_milli / 1000.0 / t for r, t in zip(rows, truth)]
    assert 0.95 <= ratios[0] <= 1.05, ratios
    assert 0.70 <= ratios[-1] <= 1.40, ratios


def test_scc_condensation_matches_python_dag_and_budget_covers_depth(spark):
    """q_graph_scc_condensation vs an independent Python pipeline:
    Kosaraju labels (min-id canonicalized) → contracted edge set →
    longest-path levels by DP over a topological order. Pins (a) every
    output column exactly, (b) the relaxation budget strictly covers
    the true DAG depth, (c) level monotonicity along every condensation
    edge (acyclicity witness), (d) non-vacuity — at least two distinct
    levels and one component with successors."""
    import duckdb

    from steaminganalysis_spark.operators.graph import SCC_COND_ROUNDS

    got = {
        r.scc: (r.n_members, r.topo_level, r.n_succ)
        for r in QUERIES["q_graph_scc_condensation"](spark, SF).collect()
    }

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    edges = con.execute("""
    WITH pairs AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS c
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey  = c.c_custkey
      JOIN supplier s ON l.l_suppkey  = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2)
    SELECT src, dst FROM pairs
    WHERE c >= (SELECT AVG(c) FROM pairs)""").fetchall()

    # Kosaraju with min-id canonical labels
    nodes = sorted({u for u, v in edges} | {v for u, v in edges})
    fwd: dict = {u: [] for u in nodes}
    rev: dict = {u: [] for u in nodes}
    for u, v in edges:
        fwd[u].append(v)
        rev[v].append(u)
    seen: set = set()
    order: list = []
    for start in nodes:
        if start in seen:
            continue
        stack = [(start, iter(fwd[start]))]
        seen.add(start)
        while stack:
            node, it = stack[-1]
            nxt = next((w for w in it if w not in seen), None)
            if nxt is None:
                order.append(node)
                stack.pop()
            else:
                seen.add(nxt)
                stack.append((nxt, iter(fwd[nxt])))
    comp: dict = {}
    for start in reversed(order):
        if start in comp:
            continue
        members = [start]
        comp[start] = start
        while members:
            node = members.pop()
            for w in rev[node]:
                if w not in comp:
                    comp[w] = start
                    members.append(w)
    groups: dict = {}
    for n, c in comp.items():
        groups.setdefault(c, []).append(n)
    canon = {c: min(ms) for c, ms in groups.items()}
    label = {n: canon[c] for n, c in comp.items()}

    cond = {(label[u], label[v]) for u, v in edges if label[u] != label[v]}
    sccs = sorted({label[n] for n in nodes})
    # longest-path levels by iterating to fixpoint (DAG, so bounded)
    lvl = {s: 0 for s in sccs}
    depth_rounds = 0
    changed = True
    while changed:
        changed = False
        for u, v in cond:
            if lvl[u] + 1 > lvl[v]:
                lvl[v] = lvl[u] + 1
                changed = True
        if changed:
            depth_rounds += 1
        assert depth_rounds <= len(sccs), "cycle in condensation"
    n_succ = {s: 0 for s in sccs}
    for u, _v in cond:
        n_succ[u] += 1
    n_members = {s: 0 for s in sccs}
    for n in nodes:
        n_members[label[n]] += 1

    expected = {s: (n_members[s], lvl[s], n_succ[s]) for s in sccs}
    assert got == expected
    # budget strictly covers the measured depth
    true_depth = max(lvl.values())
    assert true_depth < SCC_COND_ROUNDS, (true_depth, SCC_COND_ROUNDS)
    # monotone levels along edges (acyclicity witness)
    for u, v in cond:
        assert got[v][1] >= got[u][1] + 1, (u, v)
    # non-vacuity
    assert len({t[1] for t in got.values()}) >= 2
    assert any(t[2] > 0 for t in got.values())


def test_ppr_seed_locality_mass_and_python_replay(spark):
    """q_graph_ppr invariants the oracle can't see as invariants:
    (a) exact Python power-iteration replay (same fractions, same
    teleport vector, same 5 rounds) matches to the rounding grain;
    (b) probability mass — Σ ppr ≤ 1 + ε (mass only leaks via dangling
    drop, never grows) and every value ≥ 0; (c) seed locality — the
    average seed nation carries strictly more mass than the average
    non-seed nation, and at least one NON-seed nation has ppr > 0
    (proximity actually propagates); (d) the personalized vector is
    genuinely different from global PageRank's ranking (non-vacuity of
    the personalization)."""
    import duckdb

    from steaminganalysis_spark.operators.graph import (
        DAMPING,
        ITERATIONS,
        PPR_SEED_REGION,
    )

    rows = QUERIES["q_graph_ppr"](spark, SF).collect()
    got = {r.nation: (r.is_seed, r.ppr) for r in rows}
    assert all(v[1] >= 0 for v in got.values())
    total = sum(v[1] for v in got.values())
    assert total <= 1.0 + 1e-6, total

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    frac = con.execute("""
      WITH e AS (
        SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2),
      ow AS (SELECT src, SUM(w) AS ow FROM e GROUP BY 1)
      SELECT e.src, e.dst, e.w / ow.ow FROM e JOIN ow ON ow.src = e.src
    """).fetchall()
    names = dict(con.execute("SELECT n_nationkey, n_name FROM nation").fetchall())
    region_seeds = {
        k
        for (k,) in con.execute(
            f"SELECT n_nationkey FROM nation WHERE n_regionkey = {PPR_SEED_REGION}"
        ).fetchall()
    }
    nodes = sorted({u for u, v, p in frac} | {v for u, v, p in frac})
    seeds = sorted(set(nodes) & region_seeds)
    b = {n: (1.0 / len(seeds) if n in seeds else 0.0) for n in nodes}
    pr = dict(b)
    for _ in range(ITERATIONS):
        m = {n: 0.0 for n in nodes}
        for u, v, p in frac:
            m[v] += pr[u] * p
        pr = {n: (1 - DAMPING) * b[n] + DAMPING * m[n] for n in nodes}
    import math

    expected = {
        names[n]: (1 if n in seeds else 0, math.floor(pr[n] * 1e6 + 0.5) / 1e6)
        for n in nodes
    }
    assert got == expected

    seed_vals = [v for s, v in got.values() if s]
    non_vals = [v for s, v in got.values() if not s]
    assert seed_vals and non_vals
    assert sum(seed_vals) / len(seed_vals) > sum(non_vals) / len(non_vals)
    assert any(v > 0 for v in non_vals)
    # personalization is not the global ranking
    global_pr = {
        r.nation: r.pagerank for r in QUERIES["q_graph_pagerank"](spark, SF).collect()
    }
    rank_ppr = sorted(got, key=lambda n: (-got[n][1], n))
    rank_glb = sorted(global_pr, key=lambda n: (-global_pr[n], n))
    assert rank_ppr != rank_glb


def test_harmonic_zero_set_and_accuracy_vs_exact_bfs(spark):
    """q_graph_harmonic: (a) the zero set is EXACTLY the nations whose
    forward ball never grows (BFS out-reach = {self}) — sketch noise
    can never invent centrality for a sink; (b) non-vacuity — most
    nations have positive centrality; (c) accuracy — per nonzero node
    the milli estimate is within 45% of the exact harmonic
    out-centrality from BFS distances (the ANF register lattice's
    documented fixed-hash small-domain bias is ~25-27% at saturation;
    this pins the centrality fold inherits it, not worse)."""
    from collections import deque

    from steaminganalysis_spark.operators.graph import ANF_HOPS, _directed_edges

    got = {
        r.nation: r.harmonic_milli
        for r in QUERIES["q_graph_harmonic"](spark, SF).collect()
    }
    edges = [(r.src, r.dst) for r in _directed_edges(spark, SF).collect()]
    nodes = sorted({u for e in edges for u in e})
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    nat = {
        r.n_nationkey: r.n_name
        for r in spark.read.parquet(f"{SF}/nation.parquet").collect()
    }
    exact = {}
    for v in nodes:
        dist = {v: 0}
        dq = deque([v])
        while dq:
            u = dq.popleft()
            if dist[u] >= ANF_HOPS:
                continue
            for w in adj.get(u, []):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    dq.append(w)
        exact[nat[v]] = sum(1.0 / d for u, d in dist.items() if d > 0)
    assert set(got) == set(exact)
    zeros_exact = {n for n, h in exact.items() if h == 0}
    zeros_got = {n for n, h in got.items() if h == 0}
    assert zeros_got == zeros_exact
    nonzero = [n for n in exact if exact[n] > 0]
    # sf0.001's thresholded graph keeps ~10 of 25 nations as sources
    assert len(nonzero) >= 5
    for n in nonzero:
        est = got[n] / 1000.0
        assert abs(est - exact[n]) <= 0.45 * exact[n], (n, est, exact[n])


def test_iter_vector_join_auto_cap_switches_strategy(spark):
    """iter_vector_join's auto mode must pick the physical join by the
    vector size: below ITER_VECTOR_BROADCAST_CAP the vector broadcasts
    (today's fixture fast path), above it the vector side becomes a
    SHUFFLE_HASH co-partitioned join — no O(V) broadcast (the round-11
    closure of the broadcast-vector-loop scale flag, VERDICT r10)."""
    from steaminganalysis_spark.operators.graph import (
        ITER_VECTOR_BROADCAST_CAP,
        iter_vector_join,
    )

    edges = spark.range(100).selectExpr("id AS src", "(id + 1) % 100 AS dst")
    vec = spark.range(100).selectExpr("id AS node", "CAST(1.0 AS DOUBLE) AS pr")

    small = iter_vector_join(edges, vec, edges.src == vec.node, n_nodes=100)
    small.collect()
    p_small = _plan(small)
    assert "BroadcastHashJoin" in p_small
    assert "ShuffledHashJoin" not in p_small

    big = iter_vector_join(
        edges, vec, edges.src == vec.node, n_nodes=ITER_VECTOR_BROADCAST_CAP + 1
    )
    big.collect()
    p_big = _plan(big)
    assert "ShuffledHashJoin" in p_big
    assert "BroadcastHashJoin" not in p_big
    assert "BroadcastExchange" not in p_big
    # the two physical paths agree on the answer
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect()))


def test_iter_join_copartition_mode_answers_identical_and_broadcast_free(
    spark, monkeypatch
):
    """Forcing SPARK_GRAFT_ITER_JOIN=copartition (the billion-node
    configuration) must leave every iterative-graph answer IDENTICAL
    to the broadcast path and produce a broadcast-free vector join —
    every per-iteration join is a ShuffledHashJoin; the only remaining
    broadcasts are the bounded dim skins (nation names). Run under an
    adversarial shuffle layout (3 partitions) so co-partitioning is
    exercised, not degenerate. The SHUFFLE_HASH hint takes precedence
    over auto-broadcast AND AQE's runtime broadcast conversion, which
    is what makes the guarantee pinnable."""
    keys = [
        "q_graph_pagerank",
        "q_graph_ppr",
        "q_graph_scc",
        "q_graph_scc_condensation",
        "q_graph_bfs",
        "q_graph_sssp",
        "q_graph_wcc",
        "q_graph_label_propagation",
    ]
    base = {k: sorted(map(tuple, QUERIES[k](spark, SF).collect())) for k in keys}

    monkeypatch.setenv("SPARK_GRAFT_ITER_JOIN", "copartition")
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        for k in keys:
            df = QUERIES[k](spark, SF)
            got = sorted(map(tuple, df.collect()))
            assert got == base[k], k
        # plan pin on the deepest loop: 5 iterations × 2 vector joins
        pr = QUERIES["q_graph_pagerank"](spark, SF)
        pr.collect()
        plan = _plan(pr)
        shj, bhj = plan.count("ShuffledHashJoin"), plan.count("BroadcastHashJoin")
        assert shj >= 10, f"expected >=10 ShuffledHashJoin, saw {shj}"
        # only the nation-name skin (and its AQE re-print) may broadcast
        assert bhj <= 2, f"expected <=2 BroadcastHashJoin (dim skins), saw {bhj}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_iter_join_mode_rejects_unknown_value(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ITER_JOIN", "bogus")
    import pytest as _pytest

    from steaminganalysis_spark.operators.graph import _iter_join_mode

    with _pytest.raises(ValueError, match="SPARK_GRAFT_ITER_JOIN"):
        _iter_join_mode()


def test_frontier_rounds_equal_full_relaxation_round_by_round(spark):
    """min_plus_frontier_rounds must be IDENTICAL to k synchronous
    min_plus_round applications after EVERY k — not just at the
    fixpoint — because the unrolled-CTE oracles are budget-exact
    (they state the k-round value, converged or not). Drive both on a
    weighted chain graph (worst case for frontier logic: the wave
    advances one node per round) and compare at k = 1..6. Also pin
    the delta property itself: the frontier after round k is exactly
    the newly-reached node, never the whole vector."""
    from pyspark.sql import functions as F

    from steaminganalysis_spark.operators.graph import (
        min_plus_frontier_rounds,
        min_plus_round,
    )

    edges = spark.createDataFrame(
        [(i, i + 1, 10 * (i + 1)) for i in range(8)], "src long, dst long, w long"
    ).localCheckpoint(eager=True)
    nodes = list(range(9))
    init = spark.createDataFrame(
        [(n, 0 if n == 0 else None) for n in nodes], "node long, dist long"
    ).localCheckpoint(eager=True)

    def snap(df):
        return sorted((r["node"], r["dist"]) for r in df.collect())

    full = init
    for k in range(1, 7):
        full = min_plus_round(edges, full)
        frontier_k = min_plus_frontier_rounds(
            edges, init, k, F.col("dist") + F.col("w")
        )
        assert snap(frontier_k) == snap(full), f"diverged at round {k}"
    # chain wave: after k rounds exactly nodes 0..k are reached
    reached = {n for n, d in snap(full) if d is not None}
    assert reached == set(range(7))


def test_random_walks_match_pure_python_and_are_edge_valid(spark):
    """Deterministic-walk pins: (a) the full (seed, step, node) table
    replayed in pure Python (independent lowbias32 + argmin) equals
    the engine's bit-for-bit; (b) every consecutive hop is a real
    directed edge OR a dead-end self-loop; (c) every walk is exactly
    WALK_LEN + 1 rows starting at its seed."""
    from steaminganalysis_spark.operators.graph import (
        WALK_EPOCH,
        WALK_LEN,
        _directed_edges,
    )
    from steaminganalysis_spark.registry import collect_queries

    sf = "/root/testdata/sf0.001"
    QUERIES, _ = collect_queries()
    got = [
        (r.seed, r.step, r.node)
        for r in QUERIES["q_graph_random_walks"](spark, sf).collect()
    ]

    edges = {}
    for r in _directed_edges(spark, sf).collect():
        edges.setdefault(r.src, []).append(r.dst)

    def lowbias32(x):
        x &= 0xFFFFFFFF
        for _ in range(2):
            x = (((x >> 16) ^ x) * 0x45D9F3B) % (1 << 32)
        return (x >> 16) ^ x

    expected = []
    for seed in sorted(edges):
        cur = seed
        expected.append((seed, 0, seed))
        for t in range(1, WALK_LEN + 1):
            outs = edges.get(cur)
            if outs:
                cur = min(
                    outs,
                    key=lambda d: lowbias32(
                        (cur * 1048573 + t * 8191 + d + WALK_EPOCH * 131071)
                        % (1 << 32)
                    )
                    * (1 << 30)
                    + d,
                )
            expected.append((seed, t, cur))
    assert got == expected  # (a) bit-for-bit

    walks = {}
    for seed, step, node in got:
        walks.setdefault(seed, {})[step] = node
    for seed, path in walks.items():
        assert sorted(path) == list(range(WALK_LEN + 1))  # (c) length
        assert path[0] == seed
        for t in range(1, WALK_LEN + 1):
            u, v = path[t - 1], path[t]
            assert v in edges.get(u, []) or (
                u == v and u not in edges
            ), (seed, t, u, v)  # (b) edge-valid or dead-end self-loop
