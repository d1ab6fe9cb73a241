"""Gremlin-style traversal DSL compiling to DataFrame plans (SURVEY §2.3).

Each step is a thin wrapper emitting declarative DataFrame ops, so the
whole traversal is ONE Catalyst plan — filters push to scans, adjacency
expansions are equi-joins, `where(out(...))`/`not(out(...))` are
semi/anti joins.  Contrast the reference path: every step is a separate
synchronous getSlice round trip per frontier vertex
(ClickhouseKeyColumnValueStore.java:78-95 driven by JanusGraph, SURVEY §3
EP1).

Example:
    t = Traversal.V(g).has("label", "customer").has("name", "Customer#000000042")
    t.out("placed").out("contains").dedup().count()
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import PropertyGraph


class Traversal:
    """A frontier DataFrame (column `id`, optional `path` ARRAY<LONG>)
    flowing through graph steps."""

    def __init__(self, graph: PropertyGraph, frontier: DataFrame,
                 with_path: bool = False):
        self.graph = graph
        self.frontier = frontier
        self.with_path = with_path

    # -- starts ------------------------------------------------------------
    @classmethod
    def V(cls, graph: PropertyGraph, *ids: int,
          with_path: bool = False) -> "Traversal":
        f = graph.vertices
        if ids:
            f = f.filter(F.col("id").isin(list(ids)))
        if with_path:
            f = f.withColumn("path", F.array(F.col("id")))
        return cls(graph, f, with_path)

    # -- filters -----------------------------------------------------------
    def has(self, column: str, value) -> "Traversal":
        """g.V().has(k, v): plain or predicate filter (pass a Column for
        predicate forms, e.g. has('age', F.col('age') > 30))."""
        from pyspark.sql import Column
        cond = value if isinstance(value, Column) else (F.col(column) == value)
        return Traversal(self.graph, self.frontier.filter(cond), self.with_path)

    def has_label(self, label: str) -> "Traversal":
        return self.has("label", label)

    # -- adjacency expansion ----------------------------------------------
    def _edges(self, label: str | None) -> DataFrame:
        e = self.graph.edges
        return e.filter(F.col("label") == label) if label else e

    def _expand(self, from_col: str, to_col: str,
                label: str | None) -> "Traversal":
        e = self._edges(label).select(F.col(from_col).alias("id"),
                                      F.col(to_col).alias("_next"))
        cols = [F.col("_next").alias("id")]
        if self.with_path:
            cols.append(F.array_append(F.col("path"), F.col("_next")).alias("path"))
        joined = self.frontier.join(e, "id").select(*cols)
        nxt = joined.join(self.graph.vertices.drop("path"), "id") \
            if not self.with_path else \
            joined.join(self.graph.vertices, "id").select(
                "id", "label", "name", "path")
        return Traversal(self.graph, nxt, self.with_path)

    def out(self, label: str | None = None) -> "Traversal":
        return self._expand("src", "dst", label)

    def in_(self, label: str | None = None) -> "Traversal":
        return self._expand("dst", "src", label)

    def both(self, label: str | None = None) -> "Traversal":
        o = self._expand("src", "dst", label)
        i = self._expand("dst", "src", label)
        return Traversal(self.graph, o.frontier.unionByName(i.frontier),
                         self.with_path)

    def out_e(self, label: str | None = None) -> DataFrame:
        """outE(): edge rows leaving the frontier."""
        e = self._edges(label)
        return e.join(self.frontier.select(F.col("id").alias("src")),
                      "src", "left_semi")

    def in_e(self, label: str | None = None) -> DataFrame:
        e = self._edges(label)
        return e.join(self.frontier.select(F.col("id").alias("dst")),
                      "dst", "left_semi")

    # -- semi/anti sub-traversal filters ----------------------------------
    def where_out(self, label: str | None = None) -> "Traversal":
        """where(out(label)): keep frontier vertices with ≥1 such edge."""
        e = self._edges(label).select(F.col("src").alias("id"))
        return Traversal(self.graph, self.frontier.join(e, "id", "left_semi"),
                         self.with_path)

    def not_out(self, label: str | None = None) -> "Traversal":
        """not(out(label)): anti-join."""
        e = self._edges(label).select(F.col("src").alias("id"))
        return Traversal(self.graph, self.frontier.join(e, "id", "left_anti"),
                         self.with_path)

    # -- terminal / shaping steps -----------------------------------------
    def dedup(self) -> "Traversal":
        cols = ["id"] if not self.with_path else self.frontier.columns
        return Traversal(self.graph, self.frontier.dropDuplicates(["id"])
                         if not self.with_path else self.frontier.dropDuplicates(cols),
                         self.with_path)

    def order_by(self, *cols) -> "Traversal":
        return Traversal(self.graph, self.frontier.orderBy(*cols), self.with_path)

    def limit(self, n: int) -> "Traversal":
        return Traversal(self.graph, self.frontier.limit(n), self.with_path)

    def union(self, other: "Traversal") -> "Traversal":
        return Traversal(self.graph,
                         self.frontier.unionByName(other.frontier),
                         self.with_path)

    def values(self, *cols: str) -> DataFrame:
        return self.frontier.select(*cols)

    def count(self) -> int:
        return self.frontier.count()

    def group_count(self, by: str = "label") -> DataFrame:
        return self.frontier.groupBy(by).agg(F.count(F.lit(1)).alias("cnt"))

    def to_df(self) -> DataFrame:
        return self.frontier
