"""Graph persistence: the warehouse layout for vertices/edges.

The reference's edgestore is one MergeTree table clustered ORDER BY
(k,c) (QueryHelper.java:57) — rows for one vertex are physically
adjacent, so adjacency slices are index scans.  The Spark-native
equivalent layers the same two ideas:

- **partition pruning** — edges partitioned by edge set (`etype`),
  vertices by `label`: a label-restricted traversal reads only its
  partitions' files, the analog of the reference's per-store tables /
  column-prefix ranges;
- **clustering** — within each partition, files are repartitioned by
  `src` and sorted (src, dst), so parquet row-group min/max stats act
  like the MergeTree primary index: a seeded expansion (frontier join on
  src) prunes row groups before decoding anything.

`ensure_clustered_graph` builds this layout ONCE per sf_dir (cached
under a content-keyed directory) and every `star_schema_graph` call
reads it — graph queries start from one narrow pre-derived table
instead of re-deriving vertices/edges from the star schema per query.
On a real cluster the same writes go through `layout.
write_clustered_table` (bucketBy) so frontier/pregel joins on src are
additionally co-partitioned with zero exchange; plain sorted parquet is
used here because bucketed tables need a (driver-owned) catalog.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.layout import write_sorted_parquet
from .model import (PropertyGraph, _FACT_EDGE_SETS, _KNOWN_EDGE_SETS,
                    derive_star_graph)


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


# -- clustered star-schema adjacency (build once per sf_dir) ----------------

# bump when the persisted layout/schema changes so stale caches rebuild
LAYOUT_VERSION = 1

# tables the star-schema graph derives from — their on-disk identity is
# part of the cache key
_SOURCE_TABLES = ("customer", "nation", "region", "orders", "lineitem",
                  "supplier", "part")


def _source_fingerprint(sf_dir: str) -> str:
    """Cheap stat-based identity of the source parquet: (size, mtime) per
    file.  If the fixture directory is regenerated — same path, new
    content — the fingerprint changes and the cache rebuilds instead of
    silently serving a stale graph."""
    parts = []
    for t in _SOURCE_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        paths = [p]
        if os.path.isdir(p):
            paths = sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if not f.startswith("_") and not f.startswith("."))
        for f in paths:
            try:
                st = os.stat(f)
                parts.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
            except OSError:
                parts.append(f"{f}:absent")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def clustered_graph_path(sf_dir: str, base_dir: str | None = None) -> str:
    root = base_dir or os.path.join(tempfile.gettempdir(), "jcs_graph_cache")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:v{LAYOUT_VERSION}"
        f":{_source_fingerprint(sf_dir)}".encode()
    ).hexdigest()[:12]
    return os.path.join(root, key)


def ensure_clustered_graph(spark: SparkSession, sf_dir: str,
                           base_dir: str | None = None,
                           num_files: int = 8) -> str:
    """Build the clustered adjacency for `sf_dir` if absent; return path.

    Concurrent builders race safely: each writes to a pid-suffixed temp
    dir and atomically renames into place; the loser discards its copy.
    """
    path = clustered_graph_path(sf_dir, base_dir)
    marker = os.path.join(path, "_BUILT")
    if os.path.exists(marker):
        return path

    g = derive_star_graph(spark, sf_dir, None, with_etype=True)
    tmp = f"{path}.tmp{os.getpid()}"
    (g.edges.repartition(num_files, "src")
     .sortWithinPartitions("etype", "src", "dst")
     .write.mode("overwrite").partitionBy("etype")
     .parquet(os.path.join(tmp, "edges")))
    (g.vertices.repartition(num_files, "id")
     .sortWithinPartitions("label", "id")
     .write.mode("overwrite").partitionBy("label")
     .parquet(os.path.join(tmp, "vertices")))
    open(os.path.join(tmp, "_BUILT"), "w").close()
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race; reuse winner
    return path


def clustered_star_graph(spark: SparkSession, sf_dir: str,
                         edge_labels: set[str] | None = None,
                         base_dir: str | None = None) -> PropertyGraph:
    """star_schema_graph served from the persisted clustered layout,
    restricted to `edge_labels` with the SAME semantics as the in-plan
    derivation (etype — not label — is the restriction key, so
    supplier→nation edges don't leak into `in_nation` selections; the
    vertex universe matches the derivation's table-skipping rule)."""
    path = ensure_clustered_graph(spark, sf_dir, base_dir)
    edges = spark.read.parquet(os.path.join(path, "edges"))
    verts = spark.read.parquet(os.path.join(path, "vertices"))
    if edge_labels is not None:
        want = edge_labels & _KNOWN_EDGE_SETS
        edges = edges.filter(F.col("etype").isin(sorted(want)))
        vlabels = {"customer", "nation", "region"}
        if want & _FACT_EDGE_SETS:
            vlabels |= {"order", "part", "supplier"}
        verts = verts.filter(F.col("label").isin(sorted(vlabels)))
    return PropertyGraph(verts.select("id", "label", "name"),
                         edges.select("src", "dst", "label", "weight"))
