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

    # -- lazy vertex-prop resolution --------------------------------------
    def _resolve(self, *needed: str) -> DataFrame:
        """Frontier with the named columns available, joining the vertex
        table only if they're missing.  Expansion keeps the frontier as
        bare ids (+path), so an N-hop traversal does N edge joins and AT
        MOST one vertex-prop join at the terminal step — not one per hop
        (2N joins was the round-1 shape)."""
        missing = [c for c in needed if c not in self.frontier.columns]
        if not missing:
            return self.frontier
        return self.frontier.join(self.graph.vertices, "id")

    # -- filters -----------------------------------------------------------
    def has(self, column: str, value) -> "Traversal":
        """g.V().has(k, v): plain or predicate filter (pass a Column for
        predicate forms, e.g. has('age', F.col('age') > 30))."""
        from pyspark.sql import Column
        cond = value if isinstance(value, Column) else (F.col(column) == value)
        return Traversal(self.graph, self._resolve(column).filter(cond),
                         self.with_path)

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
        # no vertex join here — props resolve lazily at terminal steps
        # (_resolve), so expansion is ONE equi-join per hop
        return Traversal(self.graph, self.frontier.join(e, "id").select(*cols),
                         self.with_path)

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

    # -- bounded loops -----------------------------------------------------
    def repeat(self, step, times: int | None = None, until=None,
               emit: bool = False, max_iter: int = 20,
               checkpoint_every: int = 2) -> "Traversal":
        """Gremlin repeat()/times()/until()/emit() — the bounded-loop step
        (the reference surface's multi-hop slices, SURVEY §2.3 multi-hop
        row).  `step` is a sub-traversal fn (Traversal -> Traversal, e.g.
        ``lambda t: t.out()``) compiled per iteration into the same
        one-join-per-hop plans; lineage is cut with an eager
        localCheckpoint every `checkpoint_every` iterations (the pregel
        discipline — without it the plan doubles per hop).

        times=n: exactly n applications.  emit=True returns the union of
        every intermediate frontier (including the start), not just the
        final one.

        until=fn: fn(t) -> Traversal selecting the STOPPING subset (e.g.
        ``lambda t: t.has_label('region')``); stopped traversers exit with
        their current position, the rest keep stepping.  Variable-depth
        traversals use SET semantics: the frontier dedups per iteration
        and already-visited vertices are not re-expanded (guarantees
        termination on cycles; each vertex is processed once, the BFS
        work bound).  The per-iteration emptiness probe runs on the
        checkpointed frontier, so it re-reads a materialized result
        rather than re-running the join chain.  Bounded by max_iter.
        """
        if (times is None) == (until is None):
            raise ValueError("exactly one of times/until must be given")
        loop_cols = ["id", "path"] if self.with_path else ["id"]
        if times is not None:
            cur = self
            # emitted frontiers union on the loop schema (id/path): the
            # start frontier may carry resolved prop columns the hop
            # frontiers don't have
            parts = [cur.frontier.select(*loop_cols)] if emit else []
            for i in range(times):
                cur = step(cur)
                f = cur.frontier
                if (i + 1) % checkpoint_every == 0 and i + 1 < times:
                    f = f.localCheckpoint(eager=True)
                cur = Traversal(self.graph, f, self.with_path)
                if emit:
                    parts.append(cur.frontier.select(*loop_cols))
            if emit:
                out = parts[0]
                for p in parts[1:]:
                    out = out.unionByName(p)
                return Traversal(self.graph, out, self.with_path)
            return cur

        cols = loop_cols
        cur = self.frontier.select(*cols).dropDuplicates(["id"])
        visited = cur.select("id")
        done = None
        for i in range(max_iter):
            t = Traversal(self.graph, cur, self.with_path)
            stop = until(t).frontier.select(*cols)
            done = stop if done is None else done.unionByName(stop)
            active = cur.join(stop.select("id"), "id", "left_anti")
            nxt = (step(Traversal(self.graph, active, self.with_path))
                   .frontier.select(*cols).dropDuplicates(["id"])
                   .join(visited, "id", "left_anti")
                   .localCheckpoint(eager=True))
            if not nxt.take(1):
                break
            visited = visited.unionByName(nxt.select("id")) \
                             .localCheckpoint(eager=True)
            cur = nxt
        return Traversal(self.graph,
                         done.dropDuplicates(["id"]), self.with_path)

    # -- terminal / shaping steps -----------------------------------------
    def dedup(self) -> "Traversal":
        cols = ["id"] if not self.with_path else self.frontier.columns
        return Traversal(self.graph, self.frontier.dropDuplicates(["id"])
                         if not self.with_path else self.frontier.dropDuplicates(cols),
                         self.with_path)

    def order_by(self, *cols) -> "Traversal":
        f = self._resolve(*[c for c in cols if isinstance(c, str)])
        return Traversal(self.graph, f.orderBy(*cols), self.with_path)

    def limit(self, n: int) -> "Traversal":
        return Traversal(self.graph, self.frontier.limit(n), self.with_path)

    def union(self, other: "Traversal") -> "Traversal":
        # frontiers may differ in resolved prop columns (one side expanded,
        # one not) — align on the shared columns (id/path at minimum)
        common = [c for c in self.frontier.columns
                  if c in other.frontier.columns]
        return Traversal(self.graph,
                         self.frontier.select(*common)
                         .unionByName(other.frontier.select(*common)),
                         self.with_path)

    def values(self, *cols: str) -> DataFrame:
        return self._resolve(*cols).select(*cols)

    def count(self) -> int:
        return self.frontier.count()

    def group_count(self, by: str = "label") -> DataFrame:
        return (self._resolve(by).groupBy(by)
                .agg(F.count(F.lit(1)).alias("cnt")))

    def to_df(self) -> DataFrame:
        return self._resolve(*self.graph.vertices.columns)
