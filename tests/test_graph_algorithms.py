"""Closed-form + invariant tests for the graph algorithms (SURVEY §5)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from janusgraph_clickhouse_spark.graph.algorithms import (
    bfs_distances,
    connected_components,
    pagerank,
    triangle_count,
)
from janusgraph_clickhouse_spark.graph.model import graph_from_edge_list
from janusgraph_clickhouse_spark.graph.traversal import Traversal


def test_cc_two_components(spark):
    # path 1-2-3 and pair 10-11: components {1,2,3}->1, {10,11}->10
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (10, 11)])
    cc = {r.id: r.component for r in connected_components(g).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_cycle(spark):
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 1)])
    cc = {r.id: r.component for r in connected_components(g).collect()}
    assert cc == {1: 1, 2: 1, 3: 1}


def test_bfs_path_graph(spark):
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    d = {r.id: r.distance for r in bfs_distances(g, [1], max_hops=3).collect()}
    assert d == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond max_hops


def test_bfs_undirected(spark):
    g = graph_from_edge_list(spark, [(2, 1), (2, 3)])
    d = {r.id: r.distance
         for r in bfs_distances(g, [1], max_hops=2, directed=False).collect()}
    assert d == {1: 0, 2: 1, 3: 2}


def test_triangle_count(spark):
    # one triangle + a dangling edge
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert triangle_count(g) == 1
    # K4 has 4 triangles
    k4 = graph_from_edge_list(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    assert triangle_count(k4) == 4


def test_dense_triangle_variants_match_generic(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import (
        co_occurrence_triangles, triangle_count_dense)
    # K5 minus one edge: C(5,3)=10 triangles minus the 3 through (1,2) = 7
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)
             if (a, b) != (1, 2)]
    g = graph_from_edge_list(spark, edges)
    expect = triangle_count(g)
    dense = triangle_count_dense(
        g.undirected_edges(), n_nodes=5).first()["triangles"]
    assert dense == expect == 7
    # co-occurrence: groups {0,1,2},{2,3,4} → two triangles
    inc = spark.createDataFrame(
        [(10, 0), (10, 1), (10, 2), (20, 2), (20, 3), (20, 4)], "g long, n long")
    co = co_occurrence_triangles(inc, "g", "n", n_nodes=5).first()["triangles"]
    assert co == 2


def test_pagerank_sum_invariant(spark):
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 1), (4, 1)])
    pr = pagerank(g, max_iter=15)
    total = pr.agg(F.sum("rank")).first()[0]
    assert math.isclose(total, 4.0, rel_tol=1e-6)


def test_pagerank_star_graph(spark):
    # star: spokes 2..5 all point at hub 1; hub is dangling.
    g = graph_from_edge_list(spark, [(2, 1), (3, 1), (4, 1), (5, 1)])
    pr = {r.id: r.rank for r in pagerank(g, max_iter=30).collect()}
    assert pr[1] > pr[2]
    assert math.isclose(sum(pr.values()), 5.0, rel_tol=1e-6)
    # spokes are symmetric
    assert math.isclose(pr[2], pr[5], rel_tol=1e-9)


def test_traversal_dsl_micro(spark):
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (1, 4)])
    assert sorted(
        r.id for r in Traversal.V(g, 1).out().to_df().collect()) == [2, 4]
    assert Traversal.V(g, 1).out().out().to_df().collect()[0].id == 3
    assert sorted(r.id for r in
                  Traversal.V(g).where_out().to_df().collect()) == [1, 2]
    assert sorted(r.id for r in
                  Traversal.V(g).not_out().to_df().collect()) == [3, 4]
    both = Traversal.V(g, 2).both().dedup().to_df()
    assert sorted(r.id for r in both.collect()) == [1, 3]


def test_repeat_times_matches_chained_hops(spark):
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 4), (1, 5), (5, 6)])
    chained = sorted(r.id for r in
                     Traversal.V(g, 1).out().out().to_df().collect())
    looped = sorted(r.id for r in
                    Traversal.V(g, 1).repeat(lambda t: t.out(), times=2)
                    .to_df().collect())
    assert looped == chained == [3, 6]


def test_repeat_emit_unions_every_frontier(spark):
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 4)])
    got = sorted(r.id for r in
                 Traversal.V(g, 1).repeat(lambda t: t.out(), times=3,
                                          emit=True).to_df().collect())
    assert got == [1, 2, 3, 4]  # start + each hop


def test_repeat_until_stops_at_predicate(spark):
    # path 1→2→3→4; stop at vertex 3: traverser exits there, never sees 4
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 4)])
    got = [r.id for r in
           Traversal.V(g, 1)
           .repeat(lambda t: t.out(),
                   until=lambda t: t.has("id", F.col("id") == 3))
           .to_df().collect()]
    assert got == [3]


def test_repeat_until_terminates_on_cycle(spark):
    # 1→2→3→1 cycle with no vertex satisfying until: visited-set pruning
    # must terminate the loop and return an empty frontier
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 1)])
    got = (Traversal.V(g, 1)
           .repeat(lambda t: t.out(),
                   until=lambda t: t.has("id", F.col("id") == 99),
                   max_iter=10)
           .to_df().collect())
    assert got == []


def test_weighted_shortest_paths(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import shortest_paths
    from janusgraph_clickhouse_spark.graph.model import PropertyGraph
    from pyspark.sql import functions as F
    # 1→2 (w=5), 1→3 (w=1), 3→2 (w=1): shortest 1→2 is 2 via 3, not 5
    e = spark.createDataFrame(
        [(1, 2, 5.0), (1, 3, 1.0), (3, 2, 1.0), (2, 4, 2.0)],
        "src long, dst long, w double")
    v = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 9)], "id long")
    g = PropertyGraph(v, e)
    d = {r.id: r.dist for r in shortest_paths(g, [1], "w").collect()}
    assert d == {1: 0.0, 3: 1.0, 2: 2.0, 4: 4.0}  # 9 unreachable, absent
    # unweighted defaults to hop counts (1→2 direct = 1 hop, 4 via 2)
    d2 = {r.id: r.dist for r in shortest_paths(g, [1]).collect()}
    assert d2[2] == 1.0 and d2[4] == 2.0


def test_motif_finding(spark):
    from janusgraph_clickhouse_spark.graph.motif import count_motif, find
    # triangle 1→2→3→1 plus chord 1→4
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 1), (1, 4)])
    chains = find(g, [("a", None, "b"), ("b", None, "c")]).collect()
    assert sorted(tuple(r) for r in chains) == [
        (1, 2, 3), (2, 3, 1), (3, 1, 2), (3, 1, 4)]
    cycles = count_motif(
        g, [("x", None, "y"), ("y", None, "z"), ("z", None, "x")],
        distinct_vertices=True).first()["matches"]
    assert cycles == 3  # the 3 rotations of the one directed triangle
    # repeated-variable pattern: out-and-back (none in this DAG-ish graph)
    assert count_motif(g, [("a", None, "b"), ("b", None, "a")]) \
        .first()["matches"] == 0


def test_traversal_edge_steps(spark):
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (1, 4)])
    oe = Traversal.V(g, 1).out_e().collect()
    assert sorted((r.src, r.dst) for r in oe) == [(1, 2), (1, 4)]
    ie = Traversal.V(g, 3).in_e().collect()
    assert [(r.src, r.dst) for r in ie] == [(2, 3)]


def test_cc_long_path_converges_fast(spark):
    """Pointer jumping: a 60-hop chain must resolve well under 60
    supersteps (label propagation alone would need the full diameter)."""
    g = graph_from_edge_list(spark, [(i, i + 1) for i in range(60)])
    cc = connected_components(g, max_iter=10).collect()
    assert {r.component for r in cc} == {0}
    assert len(cc) == 61


def test_graph_persistence_roundtrip(spark, sf_smoke, tmp_path):
    from janusgraph_clickhouse_spark.graph.model import star_schema_graph
    from janusgraph_clickhouse_spark.graph.persistence import (
        load_graph, save_graph)
    g = star_schema_graph(spark, sf_smoke, edge_labels={"placed"})
    path = str(tmp_path / "graph")
    save_graph(g, path, num_files=4)
    back = load_graph(spark, path)
    assert back.vertices.count() == g.vertices.count()
    assert back.edges.count() == g.edges.count()
    # adjacency slice on the clustered layout still answers correctly
    t = Traversal.V(back, 42 + 1_000_000_000).out("placed")
    want = Traversal.V(g, 42 + 1_000_000_000).out("placed")
    assert sorted(r.id for r in t.to_df().collect()) == \
        sorted(r.id for r in want.to_df().collect())


def test_props_map_column(spark, sf_smoke):
    from janusgraph_clickhouse_spark.graph.model import props_map
    from janusgraph_clickhouse_spark.sources import load_table
    c = load_table(spark, sf_smoke, "customer")
    v = c.select(F.col("c_custkey").alias("id"),
                 props_map("c_mktsegment", "c_acctbal").alias("props"))
    # dynamic property access: g.V().has('mktsegment', 'BUILDING')
    hit = v.filter(F.element_at("props", "c_mktsegment") == "BUILDING")
    want = c.filter(F.col("c_mktsegment") == "BUILDING").count()
    assert hit.count() == want
    row = v.first()
    assert set(row.props.keys()) == {"c_mktsegment", "c_acctbal"}


def test_longest_path_levels_micro(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import (
        longest_path_levels)
    # diamond with a long leg: 1→2→3→5, 1→4→5 — level(5) = 3 (longest)
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 5), (1, 4), (4, 5)])
    lv = {r.id: r.level for r in longest_path_levels(g).collect()}
    assert lv == {1: 0, 2: 1, 3: 2, 4: 1, 5: 3}


def test_bfs_no_broadcast_above_threshold(spark):
    """A frontier larger than broadcast_threshold must shuffle-join, not
    broadcast (the hub-fan-out driver-OOM guard): inspect the hop-join
    plan both ways."""
    from janusgraph_clickhouse_spark.graph.algorithms import _next_frontier

    g = graph_from_edge_list(spark, [(1, i) for i in range(2, 30)])
    edges = g.edges.select("src", "dst")
    frontier = spark.createDataFrame([(1, 0)], "id long, distance int")
    visited = frontier

    small = _next_frontier(edges, frontier, visited, 1, use_broadcast=True)
    assert "Broadcast" in small._jdf.queryExecution().executedPlan().toString()

    big = _next_frontier(edges, frontier, visited, 1, use_broadcast=False)
    plan = big._jdf.queryExecution().executedPlan().toString()
    # first join (frontier ⋈ edges) must be a shuffle join; the trailing
    # anti-join against tiny `visited` may still broadcast — locate the
    # frontier join node specifically
    first_join = [ln for ln in plan.splitlines() if "Join" in ln][-1]
    assert "Broadcast" not in first_join, plan

    # and both shapes give the same answer
    assert sorted(r.id for r in small.collect()) == \
        sorted(r.id for r in big.collect())


def test_bfs_shuffle_path_correct(spark):
    """bfs with broadcast_threshold=0 (always shuffle) equals default."""
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 4), (2, 5)])
    a = {(r.id, r.distance)
         for r in bfs_distances(g, [1], max_hops=3).collect()}
    b = {(r.id, r.distance)
         for r in bfs_distances(g, [1], max_hops=3,
                                broadcast_threshold=0).collect()}
    assert a == b == {(1, 0), (2, 1), (3, 2), (5, 2), (4, 3)}


def test_co_occurrence_or_reduce_single_matrix(spark):
    """The partial-adjacency OR-reduce must deliver exactly ONE matrix to
    the driver regardless of input partitioning (round-1 shape collected
    one n²-bit partial PER PARTITION)."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        co_occurrence_triangles)

    rows = [(g, n) for g in range(6) for n in range(g, g + 4)]
    inc = spark.createDataFrame(rows, "grp long, node long").repartition(16)
    out = co_occurrence_triangles(inc, "grp", "node", n_nodes=16)
    tri = out.collect()[0].triangles
    # each group of 4 nodes is a clique K4 (4 triangles); overlapping
    # groups share edges — verify against the generic join counter
    edges = (inc.alias("a").join(inc.alias("b"), "grp")
             .filter(F.col("a.node") < F.col("b.node"))
             .select(F.col("a.node").alias("src"),
                     F.col("b.node").alias("dst")).distinct())
    from janusgraph_clickhouse_spark.graph.model import PropertyGraph
    verts = (edges.select(F.col("src").alias("id"))
             .unionAll(edges.select(F.col("dst").alias("id"))).distinct()
             .withColumn("label", F.lit("v"))
             .withColumn("name", F.col("id").cast("string")))
    assert tri == triangle_count(PropertyGraph(verts, edges.withColumn(
        "label", F.lit("e")).withColumn("weight", F.lit(1.0))))


def test_pagerank_tol_early_exit(spark):
    """tol wiring: on a star graph pagerank converges in a few supersteps;
    with tol set it must stop early AND still satisfy the invariants."""
    g = graph_from_edge_list(spark, [(i, 99) for i in range(1, 11)])
    pr = {r.id: r.rank for r in pagerank(g, max_iter=50, tol=1e-9).collect()}
    assert abs(sum(pr.values()) - 11.0) < 1e-6
    # closed form: leaves all equal; hub dominated by leaf contributions
    leaves = [v for k, v in pr.items() if k != 99]
    assert max(leaves) - min(leaves) < 1e-9
    assert pr[99] > max(leaves)


def test_kcore_clique_with_pendant(spark):
    """K4 plus a pendant chain: the 2-core is exactly the clique (pendant
    path peels in two rounds), each survivor with degree 3 inside the
    core; the 4-core is empty."""
    from janusgraph_clickhouse_spark.graph.algorithms import k_core

    g = graph_from_edge_list(
        spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                (4, 5), (5, 6)])
    core = {r.id: r.core_degree for r in k_core(g, k=2).collect()}
    assert core == {1: 3, 2: 3, 3: 3, 4: 3}
    assert k_core(g, k=4).count() == 0


def test_kcore_whole_graph_is_core(spark):
    """A cycle is its own 2-core: nothing peels, degrees all 2."""
    from janusgraph_clickhouse_spark.graph.algorithms import k_core

    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    core = {r.id: r.core_degree for r in k_core(g, k=2).collect()}
    assert core == {1: 2, 2: 2, 3: 2, 4: 2}


def test_label_propagation_disjoint_triangles(spark):
    """Hand-computed sync LPA on a triangle: s0=(1,2,3) → (2,1,1) →
    (1,1,1) fixpoint (ties → smallest label).  Two disjoint triangles
    each converge to their own min-id community."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        label_propagation)

    g = graph_from_edge_list(
        spark, [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6)])
    comm = {r.id: r.community for r in
            label_propagation(g, max_iter=4).collect()}
    assert comm == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_adamic_adar_square(spark):
    """C4 cycle: the only non-adjacent pairs are the diagonals, each with
    both off-diagonal vertices (deg 2) as common neighbors —
    AA = 2/ln(2), common_neighbors = 2; adjacent pairs are excluded."""
    from janusgraph_clickhouse_spark.graph.algorithms import adamic_adar

    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    rows = {(r.u, r.v): (r.common_neighbors, r.adamic_adar)
            for r in adamic_adar(g).collect()}
    expect = round(2.0 / math.log(2.0), 6)
    assert rows == {(1, 3): (2, expect), (2, 4): (2, expect)}


def test_hits_star_graph(spark):
    """Directed star u_i → c (i=1..4): the center is the unique
    authority (1.0), leaves split hub mass equally (0.25 each), and the
    L1 invariants sum(hub) == sum(authority) == 1 hold."""
    from janusgraph_clickhouse_spark.graph.algorithms import hits

    g = graph_from_edge_list(spark, [(1, 9), (2, 9), (3, 9), (4, 9)])
    out = {r.id: (r.hub, r.authority) for r in hits(g, max_iter=4).collect()}
    assert abs(out[9][1] - 1.0) < 1e-9 and abs(out[9][0]) < 1e-9
    for leaf in (1, 2, 3, 4):
        assert abs(out[leaf][0] - 0.25) < 1e-9
        assert abs(out[leaf][1]) < 1e-9
    assert abs(sum(v[0] for v in out.values()) - 1.0) < 1e-9
    assert abs(sum(v[1] for v in out.values()) - 1.0) < 1e-9


def test_personalized_pagerank_mass_and_locality(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import (
        personalized_pagerank)
    # two disconnected paths: 1->2->3 and 10->11; source 1 — all mass
    # stays in 1's component, sum(rank) == 1
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (10, 11)])
    rows = {r.id: r.rank
            for r in personalized_pagerank(g, [1], max_iter=10).collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-9
    assert rows[10] == 0.0 and rows[11] == 0.0
    # restart bias: the source outranks its descendants' tail
    assert rows[1] > rows[3]


def test_personalized_pagerank_two_sources(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import (
        personalized_pagerank)
    # symmetric pair of sources on a symmetric graph → symmetric ranks
    g = graph_from_edge_list(spark, [(1, 2), (3, 2)])
    rows = {r.id: r.rank
            for r in personalized_pagerank(g, [1, 3], max_iter=8).collect()}
    assert abs(rows[1] - rows[3]) < 1e-12
    assert abs(sum(rows.values()) - 1.0) < 1e-9


def test_seeded_random_walks_valid_and_deterministic(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import (
        seeded_random_walks)
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    g = graph_from_edge_list(spark, edges)
    t1 = sorted((r.walk_id, r.step, r.vertex)
                for r in seeded_random_walks(g, [1], steps=3).collect())
    t2 = sorted((r.walk_id, r.step, r.vertex)
                for r in seeded_random_walks(g, [1], steps=3).collect())
    assert t1 == t2  # bit-identical re-run
    assert t1[0] == (1, 0, 1)
    # every consecutive (step t -> t+1) hop is a real directed edge
    bystep = {s: v for (_, s, v) in t1}
    eset = set(edges)
    for s in range(len(bystep) - 1):
        assert (bystep[s], bystep[s + 1]) in eset


def test_seeded_random_walks_sink_terminates(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import (
        seeded_random_walks)
    g = graph_from_edge_list(spark, [(1, 2)])
    rows = sorted((r.step, r.vertex)
                  for r in seeded_random_walks(g, [1], steps=5).collect())
    assert rows == [(0, 1), (1, 2)]  # dies at sink vertex 2


def test_clustered_interaction_matches_derivation(spark, sf_smoke):
    from janusgraph_clickhouse_spark.graph.model import (
        derive_interaction_graph, interaction_graph)
    g_c = interaction_graph(spark, sf_smoke, "10 minutes", clustered=True)
    g_d = derive_interaction_graph(spark, sf_smoke, "10 minutes")
    assert (sorted((r.src, r.dst) for r in g_c.edges.collect())
            == sorted((r.src, r.dst) for r in g_d.edges.collect()))
    assert (sorted(r.id for r in g_c.vertices.collect())
            == sorted(r.id for r in g_d.vertices.collect()))


def test_adamic_adar_dense_matches_join_path(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import adamic_adar
    # irregular graph: hub 0, chain, a square — enough non-adjacent pairs
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (4, 5),
             (5, 6), (6, 7), (7, 4), (3, 5)]
    g = graph_from_edge_list(spark, edges)
    dense = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
             for r in adamic_adar(g, top=50).collect()]
    join = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
            for r in adamic_adar(g, top=50, dense_max_nodes=0).collect()]
    assert dense == join and len(dense) > 0


def test_triangle_orientation_bounds_wedges_on_power_law(spark):
    """Degree-ordered orientation must keep wedge rows O(m^1.5) on a
    hub-dominated graph: a 200-leaf star plus a leaf ring.  The naive
    center-join materializes C(200,2)=19900 wedges through the hub; the
    oriented form emits none there (every leaf out-degree ≤ 3)."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        _degree_oriented_edges, _oriented_wedges)
    n = 200
    edges = [(0, i) for i in range(1, n + 1)]
    edges += [(i, i + 1) for i in range(1, n)] + [(n, 1)]
    g = graph_from_edge_list(spark, edges)
    # each ring edge closes a triangle through the hub; the ring itself
    # (length 200 > 3) adds none
    assert triangle_count(g) == n
    oriented = _degree_oriented_edges(g)
    wedge_rows = _oriented_wedges(oriented).count()
    m = len(edges)
    naive_wedges = sum(d * (d - 1) // 2
                       for d in [n] + [3] * n)  # hub degree n, leaves 3
    assert wedge_rows <= 2 * int(m ** 1.5)
    assert wedge_rows * 10 < naive_wedges  # hub wedges actually gone
    # orientation out-degree bound: no vertex fans out more than O(√m)
    max_out = (oriented.groupBy("a").count()
               .agg(F.max("count")).first()[0])
    assert max_out <= int(2 * m ** 0.5) + 1


def test_adamic_adar_hub_salting_matches_unsalted(spark):
    """Salting hub wedge centers must not change a single output row —
    same pairs, counts and scores as the unsalted join path."""
    from janusgraph_clickhouse_spark.graph.algorithms import adamic_adar
    edges = [(0, i) for i in range(1, 41)]           # hub 0, deg 40
    edges += [(i, i + 1) for i in range(1, 40, 3)]   # sparse cross edges
    g = graph_from_edge_list(spark, edges)
    salted = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
              for r in adamic_adar(g, top=1000, dense_max_nodes=0,
                                   hub_degree_threshold=10,
                                   hub_salt=4).collect()]
    plain = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
             for r in adamic_adar(g, top=1000, dense_max_nodes=0,
                                  hub_degree_threshold=10 ** 9).collect()]
    assert salted == plain and len(salted) > 0


def test_adamic_adar_negative_ids_use_join_path(spark):
    """Negative vertex ids must fall through to the join path — numpy
    fancy indexing in the dense path would silently WRAP them into
    wrong adjacency rows."""
    from janusgraph_clickhouse_spark.graph.algorithms import adamic_adar
    g = graph_from_edge_list(spark, [(-1, 2), (2, 3), (-1, 3), (3, 4)])
    rows = {(r.u, r.v): (r.common_neighbors, r.adamic_adar)
            for r in adamic_adar(g, top=10).collect()}
    # N(3) = {-1, 2, 4}: pairs (-1,4) and (2,4) share only w=3, deg 3
    score = round(1 / math.log(3), 6)
    assert rows == {(-1, 4): (1, score), (2, 4): (1, score)}


def test_adamic_adar_dense_tiling_matches_untiled(spark):
    """The block-tiled dense matmul must be exact for any tile size —
    including tiles that straddle the candidate pairs."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        _adamic_adar_dense, adamic_adar)
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (4, 5),
             (5, 6), (6, 7), (7, 4), (3, 5)]
    g = graph_from_edge_list(spark, edges)
    sym = g.undirected_edges()
    expect = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
              for r in adamic_adar(g, top=50, dense_max_nodes=0).collect()]
    for block in (3, 8, 1024):
        got = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
               for r in _adamic_adar_dense(sym, 8, top=50,
                                           block=block).collect()]
        assert got == expect, f"block={block}"


def test_seeded_random_walks_dataframe_sources(spark):
    """A sources DataFrame (the in-plan, no-collect form) must walk
    exactly like the literal id list."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        seeded_random_walks)
    edges = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (2, 5)]
    g = graph_from_edge_list(spark, edges)
    by_list = sorted((r.walk_id, r.step, r.vertex)
                     for r in seeded_random_walks(g, [1, 2],
                                                  steps=3).collect())
    src_df = spark.createDataFrame([(1,), (2,)], "id long")
    by_df = sorted((r.walk_id, r.step, r.vertex)
                   for r in seeded_random_walks(g, src_df,
                                                steps=3).collect())
    assert by_df == by_list and len(by_df) > 0


def test_harmonic_centrality_path_graph(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import (
        harmonic_centrality)
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (3, 4)])
    got = {r.id: r.harmonic for r in harmonic_centrality(
        g, [1], max_hops=3, directed=True).collect()}
    assert got == {1: round(1 + 0.5 + 1 / 3, 6)}
    # undirected from the middle; horizon clips nothing at hops=2
    got = {r.id: r.harmonic for r in harmonic_centrality(
        g, [2], max_hops=2, directed=False).collect()}
    assert got == {2: round(1 + 1 + 0.5, 6)}
    # bounded horizon actually clips: hops=1 sees only direct neighbors
    df_seeds = spark.createDataFrame([(1,), (2,)], "id long")
    got = {r.id: r.harmonic for r in harmonic_centrality(
        g, df_seeds, max_hops=1, directed=True).collect()}
    assert got == {1: 1.0, 2: 1.0}


def test_biased_walks_return_parameter_forces_oscillation(spark):
    """p → 0 makes the return weight 1/p dominate the race: after the
    first hop the walker must bounce source↔first-hop forever."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        biased_random_walks)
    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2)]
    g = graph_from_edge_list(spark, edges)
    tr = {r.step: r.vertex for r in biased_random_walks(
        g, [1], steps=5, p=1e-9, q=1.0).collect()}
    assert tr[0] == 1
    first = tr[1]
    for t in range(2, 6):
        assert tr[t] == (1 if t % 2 == 0 else first)


def test_biased_walks_q_steers_outward_moves(spark):
    """Vertex 4 is reachable ONLY via an outward (non-return,
    non-triangle) move from the 1-2-3 triangle: q=1e9 must never visit
    it, q=1e-9 must reach it immediately."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        biased_random_walks)
    tri = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2)]
    spikes = [(2, 4), (3, 4)]
    g = graph_from_edge_list(spark, tri + spikes)
    avoid = [r.vertex for r in biased_random_walks(
        g, [1], steps=6, p=1.0, q=1e9).collect()]
    assert 4 not in avoid and len(avoid) == 7
    seek = {r.step: r.vertex for r in biased_random_walks(
        g, [1], steps=2, p=1.0, q=1e-9).collect()}
    # step 1 is a uniform race (no prev); step 2 must take the outward
    # spike to 4 from either 2 or 3
    assert seek[2] == 4


def test_biased_walks_deterministic_and_edge_valid(spark):
    from janusgraph_clickhouse_spark.graph.algorithms import (
        biased_random_walks)
    edges = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 1), (3, 4)]
    g = graph_from_edge_list(spark, edges)
    a = sorted((r.walk_id, r.step, r.vertex)
               for r in biased_random_walks(g, [1, 2], steps=4,
                                            p=2.0, q=0.5).collect())
    b = sorted((r.walk_id, r.step, r.vertex)
               for r in biased_random_walks(g, [1, 2], steps=4,
                                            p=2.0, q=0.5).collect())
    assert a == b and len(a) == 10
    eset = set(edges)
    for wid in (1, 2):
        path = [v for (w, t, v) in a if w == wid]
        for x, y in zip(path, path[1:]):
            assert (x, y) in eset


# -- strongly connected components ------------------------------------------

def _scc_of(spark, edge_list):
    from janusgraph_clickhouse_spark.graph.algorithms import (
        strongly_connected_components)
    e = spark.createDataFrame(edge_list, "src long, dst long")
    return {r.id: r.component
            for r in strongly_connected_components(e).collect()}


def test_scc_two_cycles_bridged(spark):
    # cycle {1,2,3} → bridge → cycle {10,11}; bridge is one-way, so the
    # cycles are distinct SCCs; component = max member id
    scc = _scc_of(spark, [(1, 2), (2, 3), (3, 1), (3, 10),
                          (10, 11), (11, 10)])
    assert scc == {1: 3, 2: 3, 3: 3, 10: 11, 11: 11}


def test_scc_dag_is_all_singletons(spark):
    # pure DAG (including a decreasing chain, which needs an extra
    # peeling phase): every vertex is its own SCC
    scc = _scc_of(spark, [(5, 4), (4, 3), (3, 2), (1, 2), (2, 6)])
    assert scc == {i: i for i in (1, 2, 3, 4, 5, 6)}


def test_scc_mutual_vs_oneway_reach(spark):
    # 1⇄2 mutual; 2→3→4 one-way; 4⇄5 mutual: reachability alone would
    # merge everything — SCC must not
    scc = _scc_of(spark, [(1, 2), (2, 1), (2, 3), (3, 4), (4, 5), (5, 4)])
    assert scc == {1: 2, 2: 2, 3: 3, 4: 5, 5: 5}


def test_scc_figure_eight_single_component(spark):
    # two cycles sharing vertex 3 form ONE SCC
    scc = _scc_of(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)])
    assert scc == {i: 5 for i in (1, 2, 3, 4, 5)}


# -- local clustering coefficient -------------------------------------------

def test_local_clustering_triangle_with_pendant(spark):
    # triangle 1-2-3 plus pendant 3-4: lcc(1)=lcc(2)=1, lcc(3)=1/3,
    # lcc(4)=0 (degree 1)
    from janusgraph_clickhouse_spark.graph.algorithms import local_clustering
    g = graph_from_edge_list(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    rows = {r.id: (r.degree, r.lcc) for r in local_clustering(g).collect()}
    assert rows == {1: (2, 1.0), 2: (2, 1.0),
                    3: (3, round(1 / 3, 6)), 4: (1, 0.0)}


def test_local_clustering_dense_matches_wedge_path(spark):
    # same structure at small ids (dense bitset route) and shifted past
    # DENSE_LCC_MAX_NODES (oriented-wedge route) must agree exactly
    from janusgraph_clickhouse_spark.graph import algorithms as A
    base = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (2, 5)]
    off = A.DENSE_LCC_MAX_NODES + 7
    g_small = graph_from_edge_list(spark, base)
    g_big = graph_from_edge_list(spark, [(a + off, b + off)
                                         for a, b in base])
    small = {r.id: (r.degree, r.lcc)
             for r in A.local_clustering(g_small).collect()}
    big = {r.id - off: (r.degree, r.lcc)
           for r in A.local_clustering(g_big).collect()}
    assert small == big


# -- k-truss ----------------------------------------------------------------

def test_ktruss_clique_survives_bridge_dies(spark):
    """K4 {1,2,3,4} has every edge in 2 triangles (4-truss); a pendant
    triangle {4,5,6} has support-1 edges and a bridge 6-7 has none —
    only the K4 survives k=4, every surviving edge at support 2."""
    from janusgraph_clickhouse_spark.graph.algorithms import k_truss
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    extra = [(4, 5), (4, 6), (5, 6), (6, 7)]
    e = spark.createDataFrame(k4 + extra, "src long, dst long")
    out = {(r.src, r.dst): r.support for r in k_truss(e, k=4).collect()}
    assert out == {(a, b): 2 for a, b in k4}


def test_ktruss_k3_keeps_all_triangle_edges(spark):
    """k=3 (support >= 1) keeps exactly the edges in >= 1 triangle."""
    from janusgraph_clickhouse_spark.graph.algorithms import k_truss
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long")
    out = {(r.src, r.dst) for r in k_truss(e, k=3).collect()}
    assert out == {(1, 2), (2, 3), (1, 3)}


def test_ktruss_cascading_peel_needs_iterations(spark):
    """A triangle chain where removing the weakest edge strips the next:
    iters=1 is not enough, iters=3 converges — pins that the bounded
    iteration count is real peeling, not a single pass."""
    from janusgraph_clickhouse_spark.graph.algorithms import k_truss
    # two triangles sharing edge (2,3): (1,2,3) and (2,3,4); edge (2,3)
    # has support 2, all others 1.  k=4 kills the outer edges first,
    # then (2,3) loses its triangles and dies in the NEXT round.
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)], "src long, dst long")
    one = k_truss(e, k=4, iters=1).collect()
    assert {(r.src, r.dst) for r in one} == {(2, 3)}
    done = k_truss(e, k=4, iters=3).collect()
    assert done == []


def test_ktruss_k2_keeps_triangle_free_edges(spark):
    """k<=2 demands support >= 0: every edge (even triangle-free ones)
    survives — pins the LEFT-join form of the support filter."""
    from janusgraph_clickhouse_spark.graph.algorithms import k_truss
    e = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    out = {(r.src, r.dst): r.support for r in k_truss(e, k=2).collect()}
    assert out == {(1, 2): 0, (3, 4): 0}


def test_degree_assortativity_closed_form(spark):
    """Edges (1,a),(1,b),(2,a): endpoint-degree pairs over edges are
    (2,2),(2,1),(1,2) → Pearson r = -0.5 exactly; duplicate edges
    collapse first (distinct)."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        degree_assortativity)
    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 10)], ["src", "dst"])
    row = degree_assortativity(e).collect()[0]
    assert row.n_edges == 3
    assert (row.sx, row.sy) == (5, 5)
    assert row.assortativity == -0.5


def test_degree_assortativity_degenerate_is_null(spark):
    """A perfectly regular edge set has zero degree variance — the
    correlation is undefined and must surface as NULL, not a crash."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        degree_assortativity)
    e = spark.createDataFrame([(1, 10), (2, 11)], ["src", "dst"])
    row = degree_assortativity(e).collect()[0]
    assert row.assortativity is None


def test_diameter_estimate_exact_on_tree(spark):
    """Double sweep is exact on trees: a path 1-2-3-4-5 with a branch
    3-6 has diameter 4 (1..5); sweep 1 from min id reaches 5 at
    distance 4, sweep 2 confirms."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        diameter_estimate)
    from janusgraph_clickhouse_spark.graph.model import PropertyGraph
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (3, 6)], ["src", "dst"])
    v = spark.createDataFrame([(i,) for i in range(1, 7)], ["id"])
    g = PropertyGraph(vertices=v, edges=e.withColumn(
        "label", e.src * 0 + 1).select(
        "src", "dst", e.src.cast("string").alias("label")))
    row = diameter_estimate(g, max_hops=8).collect()[0]
    assert row.source_id == 1
    assert row.diameter_estimate == 4
    assert row.sweep1_ecc == 4


def test_diameter_estimate_raises_at_hop_bound(spark):
    """A sweep still expanding at max_hops must raise, not report a
    truncated eccentricity."""
    import pytest
    from janusgraph_clickhouse_spark.graph.algorithms import (
        diameter_estimate)
    from janusgraph_clickhouse_spark.graph.model import PropertyGraph
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["src", "dst"])
    v = spark.createDataFrame([(i,) for i in range(1, 9)], ["id"])
    g = PropertyGraph(vertices=v, edges=e.select(
        "src", "dst", e.src.cast("string").alias("label")))
    with pytest.raises(ValueError, match="max_hops"):
        diameter_estimate(g, max_hops=3)


def test_mis_independent_maximal_deterministic(spark):
    """MIS invariants on a closed-form graph: no two chosen vertices
    adjacent (independence), every unchosen vertex has a chosen
    neighbor (maximality), two runs identical (md5 priorities, no
    RNG)."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        maximal_independent_set)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (3, 6), (6, 7)],
        ["src", "dst"])
    a = sorted(tuple(r) for r in maximal_independent_set(e).collect())
    b = sorted(tuple(r) for r in maximal_independent_set(e).collect())
    assert a == b and len(a) >= 2
    ids = {r[0] for r in a}
    edges = [(u, v) for u, v in
             [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (3, 6), (6, 7)]]
    und = edges + [(v, u) for u, v in edges]
    assert not any(u in ids and v in ids for u, v in edges)
    for v in {x for p in edges for x in p}:
        assert v in ids or any(n in ids for u, n in und if u == v)


def test_mis_raises_when_round_bound_too_small(spark):
    """A path whose md5 priorities strictly INCREASE along it resolves
    one vertex every two positions per round — constructed by sorting
    ids by md5, so the first round picks only the head.  max_rounds=1
    must raise, never return a partial (non-maximal) set."""
    import hashlib
    import pytest
    from janusgraph_clickhouse_spark.graph.algorithms import (
        maximal_independent_set)
    ids = sorted(range(1, 13),
                 key=lambda i: int(hashlib.md5(str(i).encode())
                                   .hexdigest()[:15], 16))
    e = spark.createDataFrame(
        [(ids[k], ids[k + 1]) for k in range(len(ids) - 1)],
        ["src", "dst"])
    with pytest.raises(ValueError, match="not converged"):
        maximal_independent_set(e, max_rounds=1)


def test_bipartite_project_closed_form(spark):
    """K_{2,2} plus a pendant: parts {1,2} share orders {10,20} → one
    pair with weight 2; part 3 only in order 30 → no pairs."""
    from janusgraph_clickhouse_spark.graph.algorithms import bipartite_project
    e = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 20), (2, 20), (3, 30)], "p long, o long")
    rows = bipartite_project(e, left="p", right="o").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.p_a, r.p_b, r.weight) == (1, 2, 2)


def test_bipartite_project_hub_cap(spark):
    """A right-side hub above max_right_degree contributes no pairs;
    the bounded rights still project."""
    from janusgraph_clickhouse_spark.graph.algorithms import bipartite_project
    hub = [(p, 99) for p in range(10)]           # degree-10 hub order
    ok = [(1, 10), (2, 10)]                       # bounded order
    e = spark.createDataFrame(hub + ok, "p long, o long")
    rows = bipartite_project(e, left="p", right="o",
                             max_right_degree=5).collect()
    assert len(rows) == 1 and rows[0].weight == 1
    uncapped = bipartite_project(e, left="p", right="o").count()
    assert uncapped == 45 + 1 - 1  # C(10,2) hub pairs + (1,2) merged once


def test_directed_modularity_two_cliques(spark):
    """Two disjoint symmetric triangles with the perfect partition:
    Q = 2 * (6/12 - (6/12)^2) = 0.5."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        directed_modularity)
    tri = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]
    edges = tri + [(b, a) for a, b in tri]
    e = spark.createDataFrame(edges, "src long, dst long")
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, community long")
    r = directed_modularity(e, labels).collect()[0]
    assert r.n_edges == 12 and r.n_communities == 2
    assert abs(r.modularity - 0.5) < 1e-9
    # the all-in-one-community partition scores 0
    one = spark.createDataFrame([(i, 0) for i in range(6)],
                                "id long, community long")
    r1 = directed_modularity(e, one).collect()[0]
    assert r1.modularity == 0.0


def _ref_micro_brandes(edges_sym, sources, micro=10**6):
    """Independent Python implementation of the micro-quantized
    source-sampled Brandes used by betweenness_approx."""
    import collections
    adj = collections.defaultdict(list)
    for u, w in edges_sym:
        adj[u].append(w)
    total = collections.Counter()
    for s in sources:
        from collections import deque
        level, sigma, q = {s: 0}, {s: 1}, deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in level:
                    level[w] = level[u] + 1
                    sigma[w] = 0
                    q.append(w)
                if level[w] == level[u] + 1:
                    sigma[w] += sigma[u]
        d = {v: 0 for v in level}
        for v in sorted(level, key=lambda x: -level[x]):
            for w in adj[v]:
                if level.get(w) == level[v] + 1:
                    d[v] += (sigma[v] * (micro + d[w])) // sigma[w]
        for v in level:
            if v != s and d[v] > 0:
                total[v] += d[v]
    return dict(total)


def test_betweenness_matches_reference_on_small_graphs(spark):
    import hashlib
    from janusgraph_clickhouse_spark.graph.algorithms import (
        betweenness_approx)

    def md5h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    for und in ([(0, 1), (1, 2), (2, 3)],                    # path P4
                [(0, 1), (0, 2), (0, 3), (0, 4)],            # star
                [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]):   # lollipop
        sym = und + [(b, a) for a, b in und]
        verts = sorted({v for p in sym for v in p})
        sources = sorted(verts, key=lambda v: (md5h(v), v))[:4]
        want = _ref_micro_brandes(sym, sources)
        e = spark.createDataFrame(sym, "src long, dst long")
        got = {r.id: r.bc_micro
               for r in betweenness_approx(e, n_sources=4).collect()}
        assert got == want, (und, got, want)


def test_betweenness_raises_on_truncated_bfs(spark):
    import pytest
    from janusgraph_clickhouse_spark.graph.algorithms import (
        betweenness_approx)
    und = [(i, i + 1) for i in range(6)]   # path P7, depth 6 > 2
    sym = und + [(b, a) for a, b in und]
    e = spark.createDataFrame(sym, "src long, dst long")
    with pytest.raises(ValueError, match="still expanding"):
        betweenness_approx(e, n_sources=1, max_levels=2)


def test_k_core_raises_on_deep_peel(spark):
    """A 12-vertex path at k=2 sheds only endpoints per round (peel
    depth 6); with max_iter=3 the peel cannot reach its fixpoint and
    must raise LOUDLY instead of returning a non-k-core (r7 review —
    the true 2-core of a path is EMPTY)."""
    import pytest
    from janusgraph_clickhouse_spark.graph.algorithms import k_core
    from janusgraph_clickhouse_spark.graph.model import PropertyGraph
    edges = spark.createDataFrame(
        [(i, i + 1, "e") for i in range(11)], "src long, dst long, label string")
    verts = spark.createDataFrame([(i,) for i in range(12)], "id long")
    g = PropertyGraph(vertices=verts, edges=edges)
    with pytest.raises(ValueError, match="fixpoint"):
        k_core(g, k=2, max_iter=3)
    # and with enough rounds, the converged answer is the empty core
    assert k_core(g, k=2, max_iter=10).count() == 0


def test_scc_keeps_self_loop_singletons(spark):
    """A vertex whose only edge is a self-loop is a legitimate
    singleton SCC and must appear in the output (r7 review fix)."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        strongly_connected_components)
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (7, 7)], "src long, dst long")
    out = {r.id: r.component for r in
           strongly_connected_components(edges).collect()}
    assert out[7] == 7
    assert out[1] == out[2] == 2


def test_ppr_duplicate_sources_keep_unit_mass(spark, sf_smoke):
    """Duplicated source ids must not scale total rank mass below 1
    (isin() dedupes; p0 must be computed over the distinct set)."""
    from pyspark.sql import functions as F
    from janusgraph_clickhouse_spark.graph.algorithms import (
        personalized_pagerank)
    from janusgraph_clickhouse_spark.graph.model import interaction_graph
    g = interaction_graph(spark, sf_smoke, "10 minutes")
    src = int(g.vertices.agg(F.min("id")).first()[0])
    dup = personalized_pagerank(g, [src, src], max_iter=2)
    total = dup.agg(F.sum("rank")).first()[0]
    assert abs(total - 1.0) < 1e-9


def test_hits_edgeless_graph_zero_scores(spark):
    """Vertices with no edges: HITS returns defined 0.0 scores, never
    NULL from a 0/0 normalization (r7 review fix)."""
    from janusgraph_clickhouse_spark.graph.algorithms import hits
    from janusgraph_clickhouse_spark.graph.model import PropertyGraph
    verts = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame([], "src long, dst long, label string")
    out = hits(PropertyGraph(vertices=verts, edges=edges),
               max_iter=2).collect()
    assert len(out) == 2
    for r in out:
        assert r.hub == 0.0 and r.authority == 0.0


def test_hits_zero_iterations_is_uniform(spark):
    """max_iter=0 must return the normalized initial vector (1/n each)
    — pins the loop-boundary semantics of the r8 aggregate-only
    restructure (the last-step checkpoint branch never fires)."""
    from janusgraph_clickhouse_spark.graph.algorithms import hits
    from janusgraph_clickhouse_spark.graph.model import PropertyGraph
    verts = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id long")
    edges = spark.createDataFrame([(1, 2, "e")],
                                  "src long, dst long, label string")
    out = hits(PropertyGraph(vertices=verts, edges=edges),
               max_iter=0).collect()
    assert len(out) == 4
    for r in out:
        assert abs(r.hub - 0.25) < 1e-12
        assert abs(r.authority - 0.25) < 1e-12


def test_dense_triangle_cap_raises_loudly(spark):
    """Past DENSE_TRI_MAX_NODES the bit-matrix path refuses (driver
    would unpack ~8*n^2 bytes) instead of OOMing."""
    import pytest
    from janusgraph_clickhouse_spark.graph.algorithms import (
        DENSE_TRI_MAX_NODES, co_occurrence_triangles)
    inc = spark.createDataFrame([(1, 1)], "g long, n long")
    with pytest.raises(ValueError, match="dense bit-matrix"):
        co_occurrence_triangles(inc, "g", "n", DENSE_TRI_MAX_NODES + 1)


def test_scc_probe_every_one_matches_default(spark):
    """probe_every=1 (per-round probing, the documented 100 TB dial)
    must produce the identical partition as the batched default — the
    batching is an execution schedule, never a semantics change."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        strongly_connected_components)
    edges = [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 10),
             (5, 5), (7, 8)]
    e = spark.createDataFrame(edges, "src long, dst long")
    want = {1: 3, 2: 3, 3: 3, 10: 11, 11: 11, 5: 5, 7: 7, 8: 8}
    got_default = {r.id: r.component
                   for r in strongly_connected_components(e).collect()}
    got_one = {r.id: r.component
               for r in strongly_connected_components(
                   e, probe_every=1).collect()}
    assert got_default == got_one == want


def test_scc_fixpoint_inside_final_batch(spark):
    """r9 ADVICE regression: max_iter bounds PROGRESS rounds, not the
    confirming probe.  On a directed 6-cycle with probe_every=4 and
    max_iter=5, both fixpoints (color sum at round 5, backward count
    at hop 5) land INSIDE the final batch — progress since the last
    probe means the batch's own probe reads a changed sum/count, so
    the pre-fix loops exited unconverged and raised RuntimeError
    despite actual convergence.  The confirmation-only round beyond
    max_iter now certifies both; max_iter=4 must still refuse loudly
    (genuine non-convergence: round 5 makes real progress)."""
    import pytest
    from janusgraph_clickhouse_spark.graph.algorithms import (
        strongly_connected_components)
    e = spark.createDataFrame([(i, (i + 1) % 6) for i in range(6)],
                              "src long, dst long")
    got = {r.id: r.component
           for r in strongly_connected_components(
               e, max_iter=5, probe_every=4).collect()}
    assert got == {i: 5 for i in range(6)}
    with pytest.raises(RuntimeError, match="did not converge"):
        strongly_connected_components(e, max_iter=4, probe_every=4)


def test_scc_frontier_mode_deep_cycle_and_bounds(spark):
    """backward='frontier' exists FOR deep cycles: a 40-cycle (class
    diameter ≫ probe_every) resolves with total backward data work
    Σ|frontier| = 40 instead of the dense form's 40 × |E_same|.  Both
    modes must agree on the mixed graph; max_iter bounds progress
    hops only (a 6-cycle needs 5 progress rounds + 1 confirmation in
    BOTH loops, so max_iter=5 passes and max_iter=4 refuses loudly —
    the forward color loop trips first); an unknown mode is a loud
    ValueError."""
    import pytest
    from janusgraph_clickhouse_spark.graph.algorithms import (
        strongly_connected_components)
    deep = [(i, (i + 1) % 40) for i in range(40)]
    mixed = deep + [(40, 41), (41, 40), (100, 100), (7, 50)]
    e = spark.createDataFrame(mixed, "src long, dst long")
    dense = {r.id: r.component
             for r in strongly_connected_components(e).collect()}
    frontier = {r.id: r.component
                for r in strongly_connected_components(
                    e, backward="frontier").collect()}
    assert dense == frontier
    assert frontier[0] == 39 and frontier[40] == 41
    assert frontier[100] == 100 and frontier[50] == 50
    six = spark.createDataFrame([(i, (i + 1) % 6) for i in range(6)],
                                "src long, dst long")
    got = {r.id: r.component
           for r in strongly_connected_components(
               six, max_iter=5, backward="frontier").collect()}
    assert got == {i: 5 for i in range(6)}
    with pytest.raises(RuntimeError, match="raise max_iter"):
        strongly_connected_components(six, max_iter=4,
                                      backward="frontier")
    with pytest.raises(ValueError, match="backward"):
        strongly_connected_components(six, backward="eager")


def test_hits_periodic_checkpoint_boundary(spark):
    """max_iter crossing the every-10-iteration lineage truncation
    (r9): results must equal the un-truncated recurrence.  On a
    2-cycle the normalized scores are exactly (0.5, 0.5) at EVERY
    iteration count, so max_iter=12 (the truncation fires once, at
    t=9) must reproduce max_iter=8 (never fires) bit-for-bit."""
    from janusgraph_clickhouse_spark.graph.algorithms import hits
    g = graph_from_edge_list(spark, [(1, 2), (2, 1)])
    for mi in (8, 12):
        out = {r.id: (r.hub, r.authority)
               for r in hits(g, max_iter=mi).collect()}
        assert out == {1: (0.5, 0.5), 2: (0.5, 0.5)}, f"max_iter={mi}"



def test_dense_id_index_monotone_and_bounded(spark):
    """The sorted dense index must be monotone (ids[i] < ids[j] ⟺
    i < j — the property that makes dense-path results relabel back
    exactly) and refuse (None) past the cap with a bounded fetch."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        _dense_id_index)
    e = spark.createDataFrame(
        [(7_000_000_009, 12), (5, 7_000_000_001), (12, 5)],
        "src long, dst long")
    map_df, ids = _dense_id_index(e, ["src", "dst"], cap=10)
    assert ids == sorted(ids) == [5, 12, 7_000_000_001, 7_000_000_009]
    got = {r.orig: r.idx for r in map_df.collect()}
    assert got == {x: i for i, x in enumerate(ids)}
    assert _dense_id_index(e, ["src", "dst"], cap=3) is None


def test_dense_id_index_declines_null_ids(spark):
    """A NULL id anywhere must DECLINE the remap (return None) so the
    caller keeps the degraded-but-working join path — the pre-remap
    min/max gates silently ignored NULLs and fell through; int(None)
    in the remap was a hard TypeError (r11 ADVICE).  The check is
    sound under limit(cap+1): at cardinality ≤ cap+1 the limit returns
    ALL distinct values, NULL included."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        _dense_id_index)
    e = spark.createDataFrame([(1, 2), (2, None), (3, 1)],
                              "src long, dst long")
    assert _dense_id_index(e, ["src", "dst"], cap=10) is None
    ok = spark.createDataFrame([(1, 2), (3, 1)], "src long, dst long")
    assert _dense_id_index(ok, ["src", "dst"], cap=10) is not None


def test_adamic_adar_identity_range_routes_by_cardinality(
        spark, monkeypatch):
    """A sparsely populated identity range [0, n) whose CARDINALITY
    fits the driver-dense tier must route driver-dense even when the
    RANGE only fits the tile tier and the cost gate would accept tiles
    (r11 ADVICE: the acceptance branch skipped the cardinality probe
    and paid tile FLOPs at n = max_id+1).  Near-complete K24 spread
    over [0, 58): Σd²·1000 ≈ 1.3e7 ≫ 58³ ≈ 2e5, so the old flow
    accepted tiles at n=58; the fix must pick driver-dense at n=24."""
    import janusgraph_clickhouse_spark.graph.algorithms as GA
    calls = []
    real = GA._adamic_adar_dense

    def spy(sym, n_nodes, top, **kw):
        calls.append(n_nodes)
        return real(sym, n_nodes, top, **kw)

    monkeypatch.setattr(GA, "_adamic_adar_dense", spy)
    ids = [i * 5 // 2 for i in range(24)]  # 24 distinct ids in [0, 58)
    edges = [(ids[i], ids[j]) for i in range(24) for j in range(i + 1, 24)]
    del edges[0], edges[-1]  # two non-adjacent pairs → non-empty output
    g = graph_from_edge_list(spark, edges)
    out = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
           for r in GA.adamic_adar(g, top=50, dense_max_nodes=32,
                                   dist_max_nodes=64).collect()]
    assert calls == [24], calls  # cardinality routed, not max_id+1
    join = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
            for r in GA.adamic_adar(g, top=50, dense_max_nodes=0,
                                    dist_max_nodes=0).collect()]
    assert out == join and len(out) > 0


def test_adamic_adar_sparse_ids_dense_remap_matches_join_path(spark):
    """Sparse/offset vertex ids over a small dimension must route
    through the dense bit-matrix via the monotone remap and reproduce
    the join path EXACTLY — original ids in the output, same (rounded
    score desc, u, v) cut.  Before the r11 fix the dense path gated on
    id VALUES and silently fell back (the scale-study g17 finding)."""
    from janusgraph_clickhouse_spark.graph.algorithms import adamic_adar
    off = 7_000_000_000
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (4, 5),
             (5, 6), (6, 7), (7, 4), (3, 5)]
    g = graph_from_edge_list(spark, [(a + off, b + off)
                                     for a, b in edges])
    dense = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
             for r in adamic_adar(g, top=50).collect()]
    join = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
            for r in adamic_adar(g, top=50, dense_max_nodes=0).collect()]
    assert dense == join and len(dense) > 0
    assert all(u >= off and v >= off for u, v, _, _ in dense)


def test_local_clustering_identity_range_routes_by_cardinality(
        spark, monkeypatch):
    """LCC symmetry of the adamic_adar probe-order fix: a sparsely
    populated identity range [0, 58) with 4 distinct vertices must hit
    the mask path at n = CARDINALITY (4), not n = max_id+1 (58) — and
    match the closed form."""
    import janusgraph_clickhouse_spark.graph.algorithms as GA
    calls = []
    real = GA._triangles_per_vertex_dense

    def spy(sym, n_nodes):
        calls.append(n_nodes)
        return real(sym, n_nodes)

    monkeypatch.setattr(GA, "_triangles_per_vertex_dense", spy)
    # square 0-19-38-57 plus diagonal (0,38): tri = 2, sparse in [0,58)
    ids = [0, 19, 38, 57]
    edges = [(ids[0], ids[1]), (ids[1], ids[2]), (ids[2], ids[3]),
             (ids[3], ids[0]), (ids[0], ids[2])]
    g = graph_from_edge_list(spark, edges)
    got = {r.id: (r.degree, r.lcc)
           for r in GA.local_clustering(g).collect()}
    assert calls == [4], calls
    assert got == {ids[0]: (3, round(2 / 3, 6)), ids[1]: (2, 1.0),
                   ids[2]: (3, round(2 / 3, 6)), ids[3]: (2, 1.0)}


def test_local_clustering_sparse_ids_dense_remap(spark, monkeypatch):
    """local_clustering with offset ids: the remapped dense path must
    equal both the closed form and the join path (cap forced to 0)."""
    import janusgraph_clickhouse_spark.graph.algorithms as GA
    off = 9_000_000_000
    # square 0-1-2-3 plus diagonal (0,2): tri = {0,1,2}, {0,2,3}
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    g = graph_from_edge_list(spark, [(a + off, b + off)
                                     for a, b in edges])
    dense = {r.id: (r.degree, r.lcc)
             for r in GA.local_clustering(g).collect()}
    expect = {off + 0: (3, round(2 / 3, 6)), off + 1: (2, 1.0),
              off + 2: (3, round(2 / 3, 6)), off + 3: (2, 1.0)}
    assert dense == expect
    monkeypatch.setattr(GA, "DENSE_LCC_MAX_NODES", 0)  # force join path
    joinp = {r.id: (r.degree, r.lcc)
             for r in GA.local_clustering(g).collect()}
    assert joinp == expect


def test_g03_dense_remap_sparse_supplier_ids(spark, tmp_path):
    """The registered g03 on a lineitem whose supplier ids are offset
    into a sparse space must still take the bit-matrix path (max-key
    probe fails, cardinality remap succeeds) and return the identical
    triangle count — relabel invariance end-to-end."""
    from janusgraph_clickhouse_spark.plans.graph_queries import (
        g03_supplier_triangles)
    src = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    base = g03_supplier_triangles(spark, src).first()["triangles"]
    shifted = li.withColumn(
        "l_suppkey", F.col("l_suppkey") + F.lit(6_000_000_000))
    shifted.write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet"))
    got = g03_supplier_triangles(spark, str(tmp_path)).first()["triangles"]
    assert got == base > 0


def test_adamic_adar_distributed_tiles_match_all_paths(spark):
    """The distributed tile path (dense_max_nodes=0 forces it for any
    graph under the dist cap) must reproduce the driver-dense and join
    paths row-for-row — same float64 sums, 6dp rounding, tiebreaks."""
    from janusgraph_clickhouse_spark.graph.algorithms import adamic_adar
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (4, 5),
             (5, 6), (6, 7), (7, 4), (3, 5), (1, 6), (2, 7)]
    g = graph_from_edge_list(spark, edges)

    def rows(**kw):
        return [(r.u, r.v, r.common_neighbors, r.adamic_adar)
                for r in adamic_adar(g, top=50, **kw).collect()]

    dense = rows()
    dist = rows(dense_max_nodes=0)
    join = rows(dense_max_nodes=0, dist_max_nodes=0)
    assert dense == dist == join and len(dense) > 0


def test_adamic_adar_distributed_sparse_ids_remap(spark):
    """Sparse/offset ids + a forced-zero driver-dense cap must route
    remap → distributed tiles and still emit ORIGINAL ids in join-path
    order."""
    from janusgraph_clickhouse_spark.graph.algorithms import adamic_adar
    off = 8_800_000_000
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 4), (4, 0),
             (1, 4)]
    g = graph_from_edge_list(spark, [(a + off, b + off)
                                     for a, b in edges])
    dist = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
            for r in adamic_adar(g, top=50, dense_max_nodes=0).collect()]
    join = [(r.u, r.v, r.common_neighbors, r.adamic_adar)
            for r in adamic_adar(g, top=50, dense_max_nodes=0,
                                 dist_max_nodes=0).collect()]
    assert dist == join and len(dist) > 0
    assert all(u >= off and v >= off for u, v, _, _ in dist)


def test_triangles_per_vertex_tile_path_matches_mask_path(spark):
    """The distributed tile form of per-vertex triangle counts must
    equal the per-edge-mask form on a randomized canonical edge set
    (the tile form exists for the regime where per-edge masks ship
    |E|*n/8 bytes through Arrow — the r11 scale-study g24 timeout)."""
    import random
    from janusgraph_clickhouse_spark.graph.algorithms import (
        _triangles_per_vertex_dense, _triangles_per_vertex_dense_dist)
    rng = random.Random(411)
    n = 60
    edges = sorted({(a, b) for a, b in
                    ((rng.randrange(n), rng.randrange(n))
                     for _ in range(400)) if a < b})
    sym = spark.createDataFrame(edges, "src long, dst long")
    mask = {r.id: r.triangles
            for r in _triangles_per_vertex_dense(sym, n).collect()}
    tile = {r.id: r.triangles
            for r in _triangles_per_vertex_dense_dist(sym, n).collect()}
    # the mask path emits a row per edge endpoint (0-credit rows
    # included); the tile path emits only positive credits — compare on
    # the union with 0 default
    allv = set(mask) | set(tile)
    assert {v: mask.get(v, 0) for v in allv} == \
           {v: tile.get(v, 0) for v in allv}
    assert sum(tile.values()) > 0


def test_prefer_dense_tiles_gate(spark):
    """Cost gate: near-complete graphs route to tiles, sparse graphs to
    the join path; both measured regimes sit orders of magnitude clear
    of the n^3/1000 boundary (PERF.md r11 calibration)."""
    from janusgraph_clickhouse_spark.graph.algorithms import (
        _prefer_dense_tiles, _sum_deg_sq)
    # sparse 15k-vertex (deg~10): join wins (measured 5.3 s vs 64.5 s)
    assert not _prefer_dense_tiles(1_900_000, 15_000)
    # near-complete block-diagonal 15k: tiles win (50 s vs broadcast
    # death)
    assert _prefer_dense_tiles(34_000_000_000, 15_000)
    # Σ deg² really is the wedge-row count: square 0-1-2-3, all deg 2
    sym = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long")
    assert _sum_deg_sq(sym) == 4 * 4
