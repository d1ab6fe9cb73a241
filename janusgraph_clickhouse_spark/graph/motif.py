"""Motif finding: GraphFrames-style structural pattern matching compiled
to joins (the declarative face of multi-hop traversal, SURVEY §2.3).

A pattern is a sequence of directed edge triples
``(src_var, edge_label_or_None, dst_var)``; the result is one row per
binding of the variables, columns named by the variables.  Example:

    find(g, [("a", "placed", "b"), ("b", "contains", "c")])
      → DataFrame(a, b, c)   # customer, order, part ids

    find(g, [("x", None, "y"), ("y", None, "z"), ("z", None, "x")])
      → directed 3-cycles

Compilation: one equi-join per triple against the (label-filtered) edge
relation, re-using already-bound variables as join keys — so Catalyst
sees a single join tree it can reorder, broadcast, and push filters
into.  Repeated variables express cycles; `distinct_vertices` adds
pairwise != filters (isomorphic matching).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import PropertyGraph


def find(graph: PropertyGraph, pattern: list[tuple[str, str | None, str]],
         distinct_vertices: bool = False) -> DataFrame:
    """Match the motif; returns one column per variable (vertex id)."""
    if not pattern:
        raise ValueError("empty pattern")
    result: DataFrame | None = None
    bound: set[str] = set()
    for i, (sv, label, dv) in enumerate(pattern):
        e = graph.edges
        if label is not None:
            e = e.filter(F.col("label") == label)
        e = e.select(F.col("src").alias(sv), F.col("dst").alias(dv))
        if result is None:
            result = e
        else:
            keys = [v for v in (sv, dv) if v in bound]
            if keys:
                result = result.join(e, keys)
            else:  # disconnected component of the pattern → cross product
                result = result.crossJoin(e)
        bound.update((sv, dv))
    if distinct_vertices:
        for a, b in combinations(sorted(bound), 2):
            result = result.filter(F.col(a) != F.col(b))
    return result.select(*sorted(bound))


def count_motif(graph: PropertyGraph,
                pattern: list[tuple[str, str | None, str]],
                distinct_vertices: bool = False) -> DataFrame:
    return (find(graph, pattern, distinct_vertices)
            .agg(F.count(F.lit(1)).alias("matches")))
