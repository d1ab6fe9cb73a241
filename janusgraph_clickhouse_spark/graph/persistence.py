"""Graph persistence: the warehouse layout for vertices/edges.

The reference's edgestore is one MergeTree table clustered ORDER BY
(k,c) (QueryHelper.java:57) — rows for one vertex are physically
adjacent, so adjacency slices are index scans.  The Spark-native
equivalent writes edges clustered by `src` (repartition + sort-within),
so: (a) row-group min/max stats prune point lookups; (b) frontier joins
on src read co-located data; (c) label is a secondary sort key, making
label-restricted expansions (the reference's column-prefix ranges)
contiguous within each src run.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..sources.layout import write_sorted_parquet
from .model import PropertyGraph


def save_graph(graph: PropertyGraph, path: str,
               num_files: int | None = None) -> None:
    """Persist vertices/edges as clustered parquet under `path`."""
    write_sorted_parquet(graph.vertices, os.path.join(path, "vertices"),
                         sort_cols=["id"], repartition_col="id",
                         num_files=num_files)
    write_sorted_parquet(graph.edges, os.path.join(path, "edges"),
                         sort_cols=["src", "label", "dst"],
                         repartition_col="src", num_files=num_files)


def load_graph(spark: SparkSession, path: str) -> PropertyGraph:
    return PropertyGraph(
        spark.read.parquet(os.path.join(path, "vertices")),
        spark.read.parquet(os.path.join(path, "edges")))
