"""Graph-algorithm randomized-reference properties (hypothesis,
SURVEY §5): every iterative graph operator checked against a
brute-force pure-Python reference on arbitrary small digraphs.

Split out of test_properties.py in r11: the property layer outgrew a
single suite split (517 s measured vs the 590 s budget) and the
graph-reference tests are its heavy half — this file is suite split
6; see CLAUDE.md.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# deterministic, CI-friendly (same knobs as test_properties.py)
FAST = settings(max_examples=20, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])
SPARK_FAST = settings(max_examples=5, deadline=None,
                      suppress_health_check=[
                          HealthCheck.function_scoped_fixture])


@SPARK_FAST
@given(perm_seed=st.integers(0, 9999))
def test_assortativity_invariant_under_relabeling(spark, perm_seed):
    """Degree assortativity depends only on the degree structure — any
    id permutation leaves it unchanged."""
    import random
    from janusgraph_clickhouse_spark.graph.algorithms import (
        degree_assortativity)
    edges = [(1, 10), (1, 11), (2, 10), (3, 10), (3, 12), (3, 13)]
    ids = sorted({x for e in edges for x in e})
    rng = random.Random(perm_seed)
    shuffled = ids[:]
    rng.shuffle(shuffled)
    p = dict(zip(ids, shuffled))
    e1 = spark.createDataFrame(edges, ["src", "dst"])
    e2 = spark.createDataFrame([(p[u], p[v]) for u, v in edges],
                               ["src", "dst"])
    r1 = degree_assortativity(e1).collect()[0]
    r2 = degree_assortativity(e2).collect()[0]
    assert r1.assortativity == r2.assortativity
    assert (r1.n_edges, r1.sx, r1.sy) == (r2.n_edges, r2.sx, r2.sy)


@SPARK_FAST
@given(edges=st.sets(st.tuples(st.integers(0, 7), st.integers(0, 7))
                     .filter(lambda t: t[0] != t[1]),
                     min_size=1, max_size=16))
def test_betweenness_random_graphs_match_reference(spark, edges):
    import hashlib
    from janusgraph_clickhouse_spark.graph.algorithms import (
        betweenness_approx)
    from .test_graph_algorithms import _ref_micro_brandes
    sym = sorted({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    verts = sorted({v for p in sym for v in p})
    md5h = lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    sources = sorted(verts, key=lambda v: (md5h(v), v))[:4]
    want = _ref_micro_brandes(sym, sources)
    e = spark.createDataFrame(sym, "src long, dst long")
    got = {r.id: r.bc_micro
           for r in betweenness_approx(e, n_sources=4,
                                       max_levels=10).collect()}
    assert got == want


@SPARK_FAST
@given(edges=st.sets(st.tuples(st.integers(0, 5), st.integers(10, 14)),
                     min_size=1, max_size=20))
def test_bipartite_project_matches_reference(spark, edges):
    from collections import defaultdict
    from janusgraph_clickhouse_spark.graph.algorithms import (
        bipartite_project)
    e = spark.createDataFrame(sorted(edges), "p long, o long")
    got = {(r.p_a, r.p_b): r.weight
           for r in bipartite_project(e, left="p", right="o").collect()}
    by_right = defaultdict(set)
    for p, o in edges:
        by_right[o].add(p)
    want = defaultdict(int)
    for ps in by_right.values():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                want[(ps[i], ps[j])] += 1
    assert got == dict(want)


@SPARK_FAST
@given(edges=st.sets(st.tuples(st.integers(0, 5), st.integers(0, 5)),
                     min_size=1, max_size=14))
def test_scc_random_digraphs_match_reference(spark, edges):
    """SCC on arbitrary small digraphs (self-loops included) matches a
    brute-force Warshall transitive-closure reference: component =
    max id of the mutual-reachability class.  Guards the r9 batched
    single-consumption fixpoint restructure against every shape
    hypothesis can draw (multi-phase peels, DAG chains, nested
    cycles, isolated self-loop singletons)."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        strongly_connected_components)
    verts = sorted({v for p in edges for v in p})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    reach = [[False] * n for _ in range(n)]
    for a, b in edges:
        reach[idx[a]][idx[b]] = True
    for k in range(n):
        for i in range(n):
            if reach[i][k]:
                for j in range(n):
                    if reach[k][j]:
                        reach[i][j] = True
    want = {v: max(u for u in verts
                   if u == v or (reach[idx[v]][idx[u]]
                                 and reach[idx[u]][idx[v]]))
            for v in verts}
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r.id: r.component
           for r in strongly_connected_components(e).collect()}
    assert got == want


@SPARK_FAST
@given(edges=st.sets(st.tuples(st.integers(0, 5), st.integers(0, 5)),
                     min_size=1, max_size=14))
def test_scc_frontier_mode_matches_reference(spark, edges):
    """backward='frontier' (the r10 deep-cycle fallback: per-hop
    anti-join BFS instead of the dense lazily-batched reachability
    fixpoint) must produce the identical partition on arbitrary small
    digraphs — same Warshall reference as the dense-mode test, so a
    divergence between the two modes cannot hide behind a shared
    wrong answer."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        strongly_connected_components)
    verts = sorted({v for p in edges for v in p})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    reach = [[False] * n for _ in range(n)]
    for a, b in edges:
        reach[idx[a]][idx[b]] = True
    for k in range(n):
        for i in range(n):
            if reach[i][k]:
                for j in range(n):
                    if reach[k][j]:
                        reach[i][j] = True
    want = {v: max(u for u in verts
                   if u == v or (reach[idx[v]][idx[u]]
                                 and reach[idx[u]][idx[v]]))
            for v in verts}
    e = spark.createDataFrame(sorted(edges), "src long, dst long")
    got = {r.id: r.component
           for r in strongly_connected_components(
               e, backward="frontier").collect()}
    assert got == want


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                     min_size=1, max_size=16))
def test_lpa_random_graphs_match_reference(spark, pairs):
    """Synchronous LPA (4 supersteps, ties → smallest, no neighbors →
    keep) on arbitrary small undirected graphs matches a pure-Python
    reference — guards the r9 weight-0 self-loop vote form: the
    self-vote must never beat a real neighbor vote, never change an
    existing count, and must fire for isolated vertices."""
    from collections import Counter

    from hypothesis import assume

    from janusgraph_clickhouse_spark.graph.algorithms import (
        label_propagation)
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    assume(edges)
    verts = sorted({v for p in pairs for v in p})
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    labels = {v: v for v in verts}
    for _ in range(4):
        new = {}
        for v in verts:
            if not adj[v]:
                new[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in adj[v])
            top = max(counts.values())
            new[v] = min(c for c, n in counts.items() if n == top)
        labels = new
    # feed the RAW pairs (self-loops and orientations included):
    # undirected_edges() canonicalizes exactly like the reference
    g = graph_from_edge_list(spark, sorted(pairs))
    got = {r.id: r.community
           for r in label_propagation(g, max_iter=4).collect()}
    assert got == labels


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                     min_size=1, max_size=16),
       k=st.integers(1, 3))
def test_kcore_random_graphs_match_reference(spark, pairs, k):
    """k-core peeling on arbitrary small undirected graphs matches a
    pure-Python peel for k ∈ {1,2,3}: same survivor set AND the same
    degree-inside-core — guards the lazy probe-materialization form
    (r9) against every peel depth hypothesis can draw (long chains
    shed endpoints one round at a time, cliques survive whole,
    isolated self-loops vanish with the canonicalization)."""
    from hypothesis import assume

    from janusgraph_clickhouse_spark.graph.algorithms import k_core
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    edges = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    assume(edges)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive
                if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    want = {v: len(adj[v] & alive) for v in alive}
    g = graph_from_edge_list(spark, sorted(pairs))
    got = {r.id: r.core_degree for r in k_core(g, k=k).collect()}
    assert got == want, (sorted(pairs), k)


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 7), st.integers(0, 7)),
                     min_size=1, max_size=16))
def test_connected_components_random_graphs_match_reference(spark, pairs):
    """Min-id connected components on arbitrary small graphs matches a
    union-find reference — guards the pointer-jumping (path-halving)
    update against chains, stars, forests and self-loop singletons."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        connected_components)
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    verts = sorted({v for p in pairs for v in p})
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    roots = {}
    for v in verts:
        roots.setdefault(find(v), []).append(v)
    want = {v: min(mem) for mem in roots.values() for v in mem}
    g = graph_from_edge_list(spark, sorted(pairs))
    got = {r.id: r.component
           for r in connected_components(g).collect()}
    assert got == want, sorted(pairs)


@SPARK_FAST
@given(wedges=st.sets(st.tuples(st.integers(0, 5), st.integers(0, 5),
                                st.integers(1, 9)),
                      min_size=1, max_size=14))
def test_sssp_weighted_random_digraphs_match_reference(spark, wedges):
    """Weighted SSSP (sparse Bellman-Ford) on arbitrary small digraphs
    with positive integer weights matches a Dijkstra reference from
    the min vertex id: same reached set, same exact long distances.
    Parallel edges with different weights are legal input (min wins);
    unreached vertices must be ABSENT, not ∞."""
    import heapq

    from janusgraph_clickhouse_spark.graph.algorithms import sssp_weighted
    from janusgraph_clickhouse_spark.graph.model import PropertyGraph
    import pyspark.sql.functions as F
    verts = sorted({v for s, d, _ in wedges for v in (s, d)})
    source = verts[0]
    best = {}
    for s, d, w in wedges:
        best[(s, d)] = min(w, best.get((s, d), w))
    adj = {}
    for (s, d), w in best.items():
        adj.setdefault(s, []).append((d, w))
    dist = {source: 0}
    heap = [(0, source)]
    while heap:
        du, u = heapq.heappop(heap)
        if du > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = du + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    e = spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in sorted(wedges)],
        "src long, dst long, weight double")
    v = spark.createDataFrame([(int(x),) for x in verts], "id long")
    g = PropertyGraph(v, e)
    got = {r.id: r.dist
           for r in sssp_weighted(g, [source]).collect()}
    assert got == dist, (sorted(wedges), source)


@SPARK_FAST
@given(edges=st.sets(st.tuples(st.integers(0, 5), st.integers(0, 5)),
                     min_size=1, max_size=14))
def test_harmonic_random_digraphs_match_reference(spark, edges):
    """Bounded-horizon harmonic centrality (max_hops=3, directed) on
    arbitrary small digraphs matches a per-source BFS reference:
    C_H(s) = Σ_{0<d(s,v)≤3} 1/d(s,v), 6dp grid.  Guards the
    source-labeled multi-source frontier against cycles, self-loops
    (never distance 0 → never contribute) and sources with empty
    3-balls (must be ABSENT from the result, not 0)."""
    from collections import deque

    from hypothesis import assume

    from janusgraph_clickhouse_spark.graph.algorithms import (
        harmonic_centrality)
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    real = sorted({(a, b) for a, b in edges if a != b})
    verts = sorted({v for p in edges for v in p})
    assume(verts)
    adj = {}
    for a, b in real:
        adj.setdefault(a, set()).add(b)
    want = {}
    for s in verts:
        d = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if d[u] == 3:
                continue
            for v in adj.get(u, ()):  # noqa: B007
                if v not in d:
                    d[v] = d[u] + 1
                    q.append(v)
        score = sum(1.0 / h for v, h in d.items() if h > 0)
        if score:
            want[s] = round(score, 6)
    g = graph_from_edge_list(spark, sorted(edges))
    got = {r.id: r.harmonic
           for r in harmonic_centrality(g, verts, max_hops=3).collect()}
    assert set(got) == set(want), (sorted(edges),)
    for s in want:
        assert abs(got[s] - want[s]) <= 1e-6, (s, got[s], want[s])


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                     min_size=1, max_size=16),
       k=st.integers(3, 4))
def test_ktruss_random_graphs_match_reference(spark, pairs, k):
    """Bounded-iteration k-truss (iters=3) on arbitrary small graphs
    matches a pure-Python peel: same surviving canonical edge set AND
    the same recomputed support — guards the left-join+coalesce(0)
    triangle-free edge handling and the per-round checkpoint loop."""
    from hypothesis import assume

    from janusgraph_clickhouse_spark.graph.algorithms import k_truss
    E = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    assume(E)

    def sup(es):
        adj = {}
        for u, v in es:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        return {(u, v): len(adj[u] & adj[v]) for u, v in es}

    cur = set(E)
    for _ in range(3):
        s = sup(cur)
        cur = {e for e in cur if s[e] >= k - 2}
    want = sup(cur)
    df = spark.createDataFrame(sorted(pairs), "src long, dst long")
    got = {(r.src, r.dst): r.support for r in k_truss(df, k=k).collect()}
    assert got == want, (sorted(pairs), k)


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 7), st.integers(0, 7)),
                     min_size=1, max_size=16))
def test_mis_random_graphs_match_greedy_reference(spark, pairs):
    """The derandomized Luby MIS equals the greedy lexicographically-
    first MIS under the (md5(str(id))[:15] as base-16, id) total order
    — plus direct independence and maximality checks.  Guards the
    min-neighbor-struct round logic against stars, paths, cliques and
    self-loop-only vertices (which are never active)."""
    import hashlib

    from janusgraph_clickhouse_spark.graph.algorithms import (
        maximal_independent_set)
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    verts = sorted(adj)  # endpoints of real edges only

    def prio(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    want = set()
    for v in sorted(verts, key=lambda v: (prio(v), v)):
        if not (adj[v] & want):
            want.add(v)
    df = spark.createDataFrame(sorted(pairs), "src long, dst long")
    got = {r.id for r in maximal_independent_set(df).collect()}
    assert got == want, sorted(pairs)
    # independence + maximality, asserted directly (not via the ref)
    for u, v in pairs:
        if u != v:
            assert not (u in got and v in got), (u, v)
    for v in verts:
        assert v in got or (adj[v] & got), v


@SPARK_FAST
@given(tedges=st.sets(st.tuples(st.integers(0, 5), st.integers(0, 5),
                                st.integers(0, 9)),
                      min_size=1, max_size=14))
def test_temporal_reachability_matches_reference(spark, tedges):
    """Earliest-arrival time-respecting reachability on arbitrary
    small temporal digraphs matches a pure-Python monotone-min
    fixpoint: arrival(v) = min t over edges (u,v,t) with
    t >= arrival(u), sources at start_ts=0.  Unreached vertices must
    be ABSENT; a too-early edge must never relax (the property static
    BFS gets wrong)."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        temporal_reachability)
    verts = sorted({v for s, d, _ in tedges for v in (s, d)})
    source = verts[0]
    arr = {source: 0}
    changed = True
    while changed:
        changed = False
        for u, v, t in tedges:
            if u in arr and t >= arr[u] and t < arr.get(v, float("inf")):
                arr[v] = t
                changed = True
    df = spark.createDataFrame(
        [(int(s), int(d), int(t)) for s, d, t in sorted(tedges)],
        "src long, dst long, ts long")
    got = {r.id: r.arrival
           for r in temporal_reachability(df, [source]).collect()}
    assert got == arr, (sorted(tedges), source)


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                     min_size=1, max_size=16))
def test_pagerank_random_digraphs_match_reference(spark, pairs):
    """PageRank (5 fixed supersteps, damping 0.85, in-plan dangling
    redistribution) on arbitrary small digraphs matches a pure-Python
    power iteration to 1e-9 — guards the dangling-mass broadcast
    cross-join and the every-2-supersteps checkpoint cadence.
    Self-loops are REAL edges here (they add out-degree and
    self-contribution), exactly as the Spark side treats them."""
    from janusgraph_clickhouse_spark.graph.algorithms import pagerank
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    verts = sorted({v for p in pairs for v in p})
    n = len(verts)
    out_deg = {v: 0 for v in verts}
    for a, _ in pairs:
        out_deg[a] += 1
    r = {v: 1.0 for v in verts}
    d = 0.85
    for _ in range(5):
        msg = {v: 0.0 for v in verts}
        for a, b in sorted(pairs):
            msg[b] += r[a] / out_deg[a]
        dang = sum(r[v] for v in verts if out_deg[v] == 0)
        r = {v: (1 - d) + d * dang / n + d * msg[v] for v in verts}
    g = graph_from_edge_list(spark, sorted(pairs))
    got = {row.id: row.rank
           for row in pagerank(g, max_iter=5).collect()}
    assert set(got) == set(r)
    for v in verts:
        assert abs(got[v] - r[v]) <= 1e-9, (v, got[v], r[v])
    # conservation invariant, independent of the reference
    assert abs(sum(got.values()) - n) <= 1e-9


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 7), st.integers(0, 7)),
                     min_size=1, max_size=16),
       sparse=st.booleans())
def test_lcc_and_triangles_match_reference(spark, pairs, sparse):
    """Local clustering coefficient AND the global triangle count on
    arbitrary small graphs match a pure-Python reference — on BOTH
    routing paths: ids offset past DENSE_LCC_MAX_NODES force the
    degree-oriented wedge path, small ids take the numpy bitset path.
    Guards the dual-path routing against disagreeing."""
    from hypothesis import assume

    from janusgraph_clickhouse_spark.graph.algorithms import (
        DENSE_LCC_MAX_NODES, local_clustering, triangle_count)
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    off = DENSE_LCC_MAX_NODES + 1 if sparse else 0
    E = {(min(a, b) + off, max(a, b) + off)
         for a, b in pairs if a != b}
    assume(E)
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {v: sum(1 for u in adj[v] for w in adj[v]
                  if u < w and w in adj[u]) for v in adj}
    n_tri = sum(tri.values()) // 3
    want = {}
    for v in adj:
        deg = len(adj[v])
        want[v] = (deg, 0.0 if deg < 2
                   else round(2.0 * tri[v] / (deg * (deg - 1)), 6))
    shifted = sorted((a + off, b + off) for a, b in pairs)
    g = graph_from_edge_list(spark, shifted)
    assert triangle_count(g) == n_tri
    got = {r.id: (r.degree, r.lcc)
           for r in local_clustering(g).collect()}
    assert set(got) == set(want)
    for v, (deg, lcc) in want.items():
        assert got[v][0] == deg, (v, got[v], deg)
        assert abs(got[v][1] - lcc) <= 1e-6, (v, got[v], lcc)


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 7), st.integers(0, 7)),
                     min_size=1, max_size=16))
def test_diameter_double_sweep_matches_reference(spark, pairs):
    """The double-sweep diameter estimate is fully deterministic
    (min-id seed; farthest = max distance then min id) — a pure-Python
    replica must reproduce ALL five output fields, and the estimate
    must lower-bound the true diameter of the seed's component."""
    from collections import deque

    from hypothesis import assume

    from janusgraph_clickhouse_spark.graph.algorithms import (
        diameter_estimate)
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    assume(pairs)
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set())
        adj.setdefault(b, set())
        if a != b:
            adj[a].add(b)
            adj[b].add(a)

    def bfs(s):
        d = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in d:
                    d[v] = d[u] + 1
                    q.append(v)
        return d

    source = min(adj)
    d1 = bfs(source)
    ecc1 = max(d1.values())
    far1 = min(v for v, h in d1.items() if h == ecc1)
    d2 = bfs(far1)
    ecc2 = max(d2.values())
    far2 = min(v for v, h in d2.items() if h == ecc2)
    row = diameter_estimate(graph_from_edge_list(spark,
                                                 sorted(pairs))).first()
    assert (row.source_id, row.sweep1_far, row.sweep1_ecc,
            row.sweep2_far, row.diameter_estimate) == (
        source, far1, ecc1, far2, ecc2), sorted(pairs)
    # lower-bound property against brute-force all-pairs
    comp = d1.keys()
    true_diam = max(max(bfs(s).values()) for s in comp)
    assert ecc2 <= true_diam


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                     min_size=1, max_size=16))
def test_hits_random_digraphs_match_reference(spark, pairs):
    """HITS (4 unnormalized synchronous half-step pairs, one final L1
    normalization) on arbitrary small digraphs matches a pure-Python
    replica to 1e-9 — guards the deferred-normalization restructure
    and the message-aggregate-only loop (vertices absent from the
    carried aggregates are exactly the zero scores)."""
    from janusgraph_clickhouse_spark.graph.algorithms import hits
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    verts = sorted({v for p in pairs for v in p})
    h = {v: 1.0 for v in verts}
    for _ in range(4):
        a = {v: sum(h[u] for u, x in pairs if x == v) for v in verts}
        h = {v: sum(a[x] for u, x in pairs if u == v) for v in verts}
    ht, at = sum(h.values()), sum(a.values())
    want = {v: (h[v] / ht if ht > 0 else 0.0,
                a[v] / at if at > 0 else 0.0) for v in verts}
    g = graph_from_edge_list(spark, sorted(pairs))
    got = {r.id: (r.hub, r.authority)
           for r in hits(g, max_iter=4).collect()}
    assert set(got) == set(want)
    for v in verts:
        assert abs(got[v][0] - want[v][0]) <= 1e-9, (v, got[v], want[v])
        assert abs(got[v][1] - want[v][1]) <= 1e-9, (v, got[v], want[v])


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                     min_size=1, max_size=16))
def test_ppr_random_digraphs_match_reference(spark, pairs):
    """Personalized PageRank (6 fixed supersteps, dangling mass
    teleports to the SOURCES) on arbitrary small digraphs matches a
    pure-Python replica to 1e-9, and sum(rank) == 1 holds."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        personalized_pagerank)
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    verts = sorted({v for p in pairs for v in p})
    src = verts[0]
    out_deg = {v: 0 for v in verts}
    for a, _ in pairs:
        out_deg[a] += 1
    p = {v: (1.0 if v == src else 0.0) for v in verts}
    r = dict(p)
    d = 0.85
    for _ in range(6):
        msg = {v: 0.0 for v in verts}
        for a, b in sorted(pairs):
            msg[b] += r[a] / out_deg[a]
        dang = sum(r[v] for v in verts if out_deg[v] == 0)
        r = {v: ((1 - d) + d * dang) * p[v] + d * msg[v]
             for v in verts}
    g = graph_from_edge_list(spark, sorted(pairs))
    got = {row.id: row.rank
           for row in personalized_pagerank(g, [src]).collect()}
    assert set(got) == set(r)
    for v in verts:
        assert abs(got[v] - r[v]) <= 1e-9, (v, got[v], r[v])
    assert abs(sum(got.values()) - 1.0) <= 1e-9


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                     min_size=1, max_size=18))
def test_directed_modularity_matches_reference(spark, pairs):
    """Directed modularity (Leicht-Newman) of the id%3 partition on
    arbitrary small digraphs matches a pure-Python replica of the
    micro-quantized per-community sum (floor(term·1e9 + 0.5), summed
    as exact integers) — guards the full-outer degree join and the
    coalesce(0) within-edges handling."""
    import math

    from janusgraph_clickhouse_spark.graph.algorithms import (
        directed_modularity)
    m = len(pairs)
    comms = sorted({v % 3 for p in pairs for v in p})
    s = 0
    n_comm = 0
    for c in comms:
        ec = sum(1 for a, b in pairs if a % 3 == c and b % 3 == c)
        dout = sum(1 for a, _ in pairs if a % 3 == c)
        din = sum(1 for _, b in pairs if b % 3 == c)
        if dout == 0 and din == 0:
            continue
        n_comm += 1
        term = ec / m - (din / m) * (dout / m)
        s += math.floor(term * 1e9 + 0.5)
    e = spark.createDataFrame(sorted(pairs), "src long, dst long")
    verts = sorted({v for p in pairs for v in p})
    lab = spark.createDataFrame([(v, v % 3) for v in verts],
                                "id long, community long")
    row = directed_modularity(e, lab).first()
    assert (row.n_communities, row.n_edges) == (n_comm, m), sorted(pairs)
    assert abs(row.modularity - s / 1e9) <= 5.1e-7, (row.modularity, s)


@SPARK_FAST
@given(raw=st.sets(st.tuples(st.integers(0, 7), st.integers(0, 7)),
                   min_size=1, max_size=16))
def test_longest_path_levels_random_dags_match_reference(spark, raw):
    """Longest-path topological levels on random DAGs (edges oriented
    low→high, so acyclic by construction) match the ascending-order
    DP: level(v) = max over in-edges of level(u)+1, sources at 0."""
    from hypothesis import assume

    from janusgraph_clickhouse_spark.graph.algorithms import (
        longest_path_levels)
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    assume(edges)
    verts = sorted({v for p in edges for v in p})
    level = {v: 0 for v in verts}
    for v in verts:  # ascending id = topological order here
        for a, b in edges:
            if b == v:
                level[v] = max(level[v], level[a] + 1)
    g = graph_from_edge_list(spark, edges)
    got = {r.id: r.level for r in longest_path_levels(g).collect()}
    assert got == level, edges


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 5), st.integers(0, 5)),
                     min_size=1, max_size=14),
       pq=st.sampled_from([(1.0, 1.0), (2.0, 0.5), (0.5, 2.0)]))
def test_biased_walks_random_digraphs_match_reference(spark, pairs, pq):
    """node2vec biased walks (Efraimidis-Spirakis race keyed by
    md5(seed:walk:step:cand), 12dp-rounded, min (key, cand) wins) on
    arbitrary small digraphs match a pure-Python replica step for
    step — guards the (1/p, 1, 1/q) weight classification (NULL prev
    at step 1 → outward), the triangle left-join, and walk death at
    sink vertices."""
    import hashlib
    import math

    from janusgraph_clickhouse_spark.graph.algorithms import (
        biased_random_walks)
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    p, q = pq
    edgeset = set(pairs)
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    verts = sorted({v for e in pairs for v in e})
    sources = verts[:2]
    want = {(s, 0, s) for s in sources}
    state = {s: (None, s) for s in sources}  # walk -> (prev, cur)
    for t in range(1, 4):
        nxt = {}
        for walk, (prev, cur) in state.items():
            cands = adj.get(cur, [])
            if not cands:
                continue

            def race(c):
                hx = hashlib.md5(
                    f"w:{walk}:{t}:{c}".encode()).hexdigest()[:8]
                u = (int(hx, 16) + 1) / 4294967296.0
                if prev is not None and c == prev:
                    w = 1.0 / p
                elif prev is not None and (prev, c) in edgeset:
                    w = 1.0
                else:
                    w = 1.0 / q
                return round(-math.log(u) / w, 12)

            winner = min(cands, key=lambda c: (race(c), c))
            nxt[walk] = (cur, winner)
            want.add((walk, t, winner))
        state = nxt
    g = graph_from_edge_list(spark, sorted(pairs))
    got = {(r.walk_id, r.step, r.vertex)
           for r in biased_random_walks(g, sources, steps=3,
                                        p=p, q=q, seed="w").collect()}
    assert got == want, (sorted(pairs), pq)


@SPARK_FAST
@given(pairs=st.sets(st.tuples(st.integers(0, 4), st.integers(0, 4)),
                     min_size=1, max_size=10))
def test_motif_find_matches_brute_force(spark, pairs):
    """Motif matching compiled to joins on arbitrary small digraphs
    matches brute-force binding enumeration — the 2-path, the directed
    3-cycle (with and without isomorphic distinct-vertices filtering),
    and a disconnected pattern (the crossJoin arm)."""
    from itertools import product

    from janusgraph_clickhouse_spark.graph.motif import find
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    E = set(pairs)
    verts = sorted({v for p in pairs for v in p})
    g = graph_from_edge_list(spark, sorted(pairs))

    def brute(pattern, distinct_vertices=False):
        vs = sorted({v for s, _, d in pattern for v in (s, d)})
        out = set()
        for combo in product(verts, repeat=len(vs)):
            env = dict(zip(vs, combo))
            if distinct_vertices and len(set(combo)) < len(vs):
                continue
            if all((env[s], env[d]) in E for s, _, d in pattern):
                out.add(tuple(env[v] for v in vs))
        return out

    patterns = [
        ([("a", None, "b"), ("b", None, "c")], False),
        ([("x", None, "y"), ("y", None, "z"), ("z", None, "x")], False),
        ([("x", None, "y"), ("y", None, "z"), ("z", None, "x")], True),
        ([("a", None, "b"), ("c", None, "d")], False),  # disconnected
    ]
    for pattern, dv in patterns:
        got = {tuple(r) for r in find(g, pattern,
                                      distinct_vertices=dv).collect()}
        assert got == brute(pattern, dv), (sorted(pairs), pattern, dv)


@SPARK_FAST
@given(edges=st.sets(st.tuples(st.integers(0, 6), st.integers(0, 6)),
                     min_size=1, max_size=16),
       seed=st.integers(0, 999), times=st.integers(1, 3))
def test_repeat_traversal_matches_python_replica(spark, edges, seed,
                                                 times):
    """Traversal.repeat() vs python replicas on random digraphs, both
    modes (the g14 surface).  times=n is BAG semantics — the endpoint
    multiset counts every distinct n-edge walk; until=pred is
    BFS-with-SET semantics — stopped traversers exit at their current
    vertex, visited vertices never re-expand, result = the set of
    stop positions reachable under those rules."""
    from collections import Counter
    from pyspark.sql import functions as F
    from janusgraph_clickhouse_spark.graph.model import PropertyGraph
    from janusgraph_clickhouse_spark.graph.traversal import Traversal
    rng = np.random.RandomState(seed)
    verts = sorted({v for p in edges for v in p})
    labels = {v: ("stop" if rng.rand() < 0.4 else "go") for v in verts}
    vdf = spark.createDataFrame([(v, labels[v]) for v in verts],
                                "id long, label string")
    edf = spark.createDataFrame(sorted(edges),
                                "src long, dst long")
    g = PropertyGraph(vdf, edf.select("src", "dst",
                                      F.lit("e").alias("label")))
    starts = sorted(rng.choice(verts, size=min(2, len(verts)),
                               replace=False).tolist())
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    # times-mode: bag semantics, multiset of n-hop walk endpoints
    got_bag = Counter(r.id for r in Traversal.V(g, *starts).repeat(
        lambda t: t.out(), times=times).frontier.collect())
    frontier = Counter(starts)
    for _ in range(times):
        nxt = Counter()
        for v, c in frontier.items():
            for d in adj.get(v, []):
                nxt[d] += c
        frontier = nxt
    assert got_bag == frontier
    # until-mode: BFS set semantics, stop at label == 'stop'
    got_set = {r.id for r in Traversal.V(g, *starts).repeat(
        lambda t: t.out(),
        until=lambda t: t.has_label("stop")).frontier.collect()}
    cur, visited, done = set(starts), set(starts), set()
    for _ in range(20):
        stop = {v for v in cur if labels[v] == "stop"}
        done |= stop
        active = cur - stop
        nxt = {d for v in active for d in adj.get(v, [])} - visited
        if not nxt:
            break
        visited |= nxt
        cur = nxt
    assert got_set == done


@SPARK_FAST
@given(edges=st.sets(st.tuples(st.integers(0, 11), st.integers(0, 11))
                     .filter(lambda t: t[0] != t[1]),
                     min_size=4, max_size=30),
       offset=st.sampled_from([0, 9_999, 6_000_000_007]))
def test_adamic_adar_remap_paths_match_join_on_random_graphs(
        spark, edges, offset):
    """Late-r11 dense-id remap: on random graphs under random id
    offsets, the cardinality-routed bit-matrix paths must reproduce
    the join path exactly — scores, counts, ORIGINAL ids, cut order.
    offset=0 exercises the identity gates; the huge offset exercises
    the monotone remap (id VALUES must not matter — the scale-study
    finding)."""
    from janusgraph_clickhouse_spark.graph.algorithms import adamic_adar
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    g = graph_from_edge_list(
        spark, [(a + offset, b + offset) for a, b in sorted(edges)])
    def rows(**kw):
        return [(r.u, r.v, r.common_neighbors, r.adamic_adar)
                for r in adamic_adar(g, top=50, **kw).collect()]
    join = rows(dense_max_nodes=0, dist_max_nodes=0)
    dense = rows()
    dist = rows(dense_max_nodes=0)
    assert dense == join
    # tiny graphs pass the Σd² gate (n³ is small), so the dist tier
    # really runs; if the gate ever rejects, the join path answers —
    # either way the rows must match
    assert dist == join


@SPARK_FAST
@given(edges=st.sets(st.tuples(st.integers(0, 9), st.integers(0, 9))
                     .filter(lambda t: t[0] != t[1]),
                     min_size=3, max_size=24),
       offset=st.sampled_from([0, 7_000_000_001]))
def test_local_clustering_remap_matches_reference(spark, edges, offset):
    """LCC under random graphs + offsets: the routed dense/tile paths
    must equal a python reference on the canonical undirected graph."""
    from collections import defaultdict
    from janusgraph_clickhouse_spark.graph.algorithms import (
        local_clustering)
    from janusgraph_clickhouse_spark.graph.model import (
        graph_from_edge_list)
    canon = {(min(a, b), max(a, b)) for a, b in edges}
    nbrs = defaultdict(set)
    for a, b in canon:
        nbrs[a].add(b)
        nbrs[b].add(a)
    expect = {}
    for v, nv in nbrs.items():
        d = len(nv)
        tri = sum(len(nbrs[u] & nv) for u in nv) // 2
        expect[v + offset] = (d, 0.0 if d < 2 else
                              round(2.0 * tri / (d * (d - 1)), 6))
    g = graph_from_edge_list(
        spark, [(a + offset, b + offset) for a, b in sorted(edges)])
    got = {r.id: (r.degree, r.lcc)
           for r in local_clustering(g).collect()}
    assert got == expect
