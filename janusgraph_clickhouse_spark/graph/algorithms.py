"""GraphX-style analytics on the DataFrame property graph (SURVEY §2.3).

The reference system computes these by exporting the edgestore to an
external graph computer (JanusGraph's SparkGraphComputer path); here they
are native DataFrame iteration via the pregel kernel:

- degrees          — one hash aggregate
- pagerank         — score-push iteration, damping 0.85
- connected_components — min-id label propagation (converges to the
                     minimum vertex id per component)
- bfs_distances    — frontier expansion with min-distance aggregation
- triangle_count   — self-join on canonical undirected edges
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import PropertyGraph
from .pregel import pregel


def pagerank(graph: PropertyGraph, max_iter: int = 10,
             damping: float = 0.85) -> DataFrame:
    """PageRank over the directed edges; returns (id, rank).

    Dangling mass is redistributed uniformly each superstep so
    sum(rank) == |V| holds (the invariant the tests check).
    """
    v = graph.vertices.select("id")
    n_total = v.count()  # scalar; one tiny job, reused every superstep
    deg = graph.degrees("out").withColumnRenamed("degree", "out_deg")
    # state: id, rank, out_deg (out_deg=0 → dangling)
    state = (v.join(deg, "id", "left")
              .fillna(0, subset=["out_deg"])
              .withColumn("rank", F.lit(1.0)))
    edges = graph.edges.select("src", "dst")

    def make_messages(st: DataFrame, e: DataFrame) -> DataFrame:
        contrib = (st.filter(F.col("out_deg") > 0)
                     .select(F.col("id").alias("src"),
                             (F.col("rank") / F.col("out_deg")).alias("msg")))
        return e.join(contrib, "src").select("dst", "msg")

    def agg_messages(msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("dst").agg(F.sum("msg").alias("msg_sum"))

    def update(st: DataFrame, agg: DataFrame) -> DataFrame:
        # dangling mass this round: sum of ranks at out_deg=0 vertices
        dangling = (st.filter(F.col("out_deg") == 0)
                      .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                      .first()[0])
        base = (1.0 - damping) + damping * dangling / n_total
        return (st.select("id", "out_deg")
                  .join(agg.withColumnRenamed("dst", "id"), "id", "left")
                  .fillna(0.0, subset=["msg_sum"])
                  .withColumn("rank", F.lit(base)
                              + F.lit(damping) * F.col("msg_sum"))
                  .select("id", "rank", "out_deg"))

    out = pregel(state, edges, make_messages, agg_messages, update,
                 max_iter=max_iter)
    return out.select("id", "rank")


def connected_components(graph: PropertyGraph, max_iter: int = 20) -> DataFrame:
    """Undirected connected components; returns (id, component) where
    component == min vertex id in the component.

    Min-id label propagation over the symmetrized edge set; converges in
    O(diameter) supersteps with an early-exit probe (changed-count == 0).
    For graphs with huge diameter swap in large-star/small-star; the star
    schema graphs here have diameter ≤ 4.
    """
    sym = graph.undirected_edges()
    edges = sym.unionAll(sym.select(F.col("dst").alias("src"),
                                    F.col("src").alias("dst")))
    state = graph.vertices.select("id", F.col("id").alias("component"))

    def make_messages(st: DataFrame, e: DataFrame) -> DataFrame:
        return (e.join(st.select(F.col("id").alias("src"), "component"), "src")
                 .select("dst", F.col("component").alias("msg")))

    def agg_messages(msgs: DataFrame) -> DataFrame:
        return msgs.groupBy("dst").agg(F.min("msg").alias("min_nbr"))

    def update(st: DataFrame, agg: DataFrame) -> DataFrame:
        return (st.join(agg.withColumnRenamed("dst", "id"), "id", "left")
                  .select("id", F.least(
                      F.col("component"),
                      F.coalesce(F.col("min_nbr"), F.col("component"))
                  ).alias("component")))

    def converged(old: DataFrame, new: DataFrame) -> bool:
        changed = (old.select("id", F.col("component").alias("c_old"))
                   .join(new, "id")
                   .filter(F.col("component") != F.col("c_old"))
                   .limit(1).count())
        return changed == 0

    return pregel(state, edges, make_messages, agg_messages, update,
                  max_iter=max_iter, converged=converged)


def bfs_distances(graph: PropertyGraph, source_ids: list[int],
                  max_hops: int, directed: bool = True) -> DataFrame:
    """Unweighted shortest-path hop counts from the source set; returns
    (id, distance) for vertices reached within max_hops.

    Frontier-join iteration: only the most-recently-discovered frontier is
    joined against edges each round (not the whole visited set), and the
    frontier is broadcast while small — the Spark analog of the
    reference's per-frontier-vertex slice loop (SURVEY §2.3 multi-hop)."""
    edges = graph.edges.select("src", "dst")
    if not directed:
        edges = edges.unionAll(edges.select(F.col("dst").alias("src"),
                                            F.col("src").alias("dst")))
    spark = graph.vertices.sparkSession
    visited = spark.createDataFrame(
        [(int(s), 0) for s in source_ids], "id long, distance int")
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (edges.join(F.broadcast(frontier.withColumnRenamed("id", "src")),
                          "src")
               .select(F.col("dst").alias("id"))
               .distinct()
               .join(visited.select("id"), "id", "left_anti")
               .withColumn("distance", F.lit(hop)))
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def triangle_count(graph: PropertyGraph) -> int:
    """Global triangle count on the canonical undirected edge set.

    Classic two-join enumeration on (src<dst) edges: wedges a<b<c with
    (a,b),(b,c) closed by (a,c).  Each edge participates once per triangle
    orientation, so the count needs no /3 correction.  At scale, AQE's
    skew-join splitting handles high-degree wedge centers; degree-ordered
    orientation (order by (degree, id)) is the upgrade path for power-law
    graphs."""
    e = graph.undirected_edges().select("src", "dst").cache()
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    tri = wedges.join(e3, ["a", "c"])
    n = tri.count()
    e.unpersist()
    return n


def triangles_per_vertex(graph: PropertyGraph) -> DataFrame:
    """Per-vertex triangle participation; returns (id, triangles)."""
    e = graph.undirected_edges().select("src", "dst").cache()
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    per = (tri.select(F.col("a").alias("id"))
           .unionAll(tri.select(F.col("b").alias("id")))
           .unionAll(tri.select(F.col("c").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("triangles")))
    e.unpersist()
    return per
