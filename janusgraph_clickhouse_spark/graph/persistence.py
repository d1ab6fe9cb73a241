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
The build also writes the edge set as a BUCKETED external table
(CLUSTERED BY src, SORTED BY (src, dst) — `_write_bucketed_edges`), the
full analog of the reference's primary-index scan: full-graph reads
(`clustered_star_graph` with no label restriction) serve edges through
it, so every per-superstep pregel/frontier join on `src` runs with NO
Exchange on the edge side.  The catalog entry is session-scoped DDL over
persistent bucket files (`bucketed_edges` re-registers per session).
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
LAYOUT_VERSION = 4  # v4: dual-orientation bucketed edges — a second
# bucketed table CLUSTERED BY (dst) SORTED BY (dst, src) beside the src
# one, so dst-keyed message joins (the HITS hub half-step, reverse-edge
# fixpoints) also run Exchange-free off disk layout instead of paying an
# in-memory repartition per algorithm invocation (the CSR + CSC dual).
# (v3: unit-adaptive events.ts read — caches built by the hard-coded ns
# loader against the µs fixture derived a 1000×-compressed timeline; the
# source fingerprint alone can't see a LOADER bug, so the version bump
# orphans them.)

# bucket count for the bucketed edge table.  MUST equal the session's
# shuffle width (session.py sets spark.sql.shuffle.partitions = cpus=32):
# the pregel state side is hash-partitioned at the shuffle width, and
# when the two sides' partition counts differ EnsureRequirements
# re-shuffles one of them — matching counts make the whole message join
# Exchange-free.  Consumers verify the width at runtime and fall back to
# an explicit repartition when it differs (algorithms.pagerank).  On a
# real cluster this is the executor-core width, chosen at build time.
EDGE_BUCKETS = 32

# tables the star-schema graph derives from — their on-disk identity is
# part of the cache key
_SOURCE_TABLES = ("customer", "nation", "region", "orders", "lineitem",
                  "supplier", "part")


def _stat_fingerprint(roots: list[str]) -> str:
    """THE stat-based content identity (shared by the star-schema and
    interaction caches so their staleness behavior cannot drift):
    (path, size, ns-mtime) of every LEAF file, walked recursively — a
    one-level listing would fingerprint nested/partitioned layouts by
    directory stat, which an in-place leaf rewrite can leave unchanged
    (the silent-stale failure this fingerprint exists to prevent)."""
    parts = []
    for root in roots:
        files = [root]
        if os.path.isdir(root):
            files = []
            for d, dirs, names in os.walk(root):
                dirs[:] = sorted(x for x in dirs
                                 if not x.startswith(("_", ".")))
                files.extend(os.path.join(d, n) for n in sorted(names)
                             if not n.startswith(("_", ".")))
        for f in files:
            try:
                st = os.stat(f)
                # ns mtime: a fixture regenerated in-place within the same
                # second at identical size must still change the key
                parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
            except OSError:
                parts.append(f"{f}:absent")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:12]


def _source_fingerprint(sf_dir: str) -> str:
    return _stat_fingerprint(
        [os.path.join(sf_dir, f"{t}.parquet") for t in _SOURCE_TABLES])


def _build_token() -> str:
    """Uniqueness token for temp dirs and build tables: pid alone is NOT
    unique inside one driver — two threads building concurrently would
    share a temp dir and a catalog table name and corrupt each other."""
    import uuid
    return f"{os.getpid()}_{uuid.uuid4().hex[:8]}"


def _sweep_stale_tmp(path: str) -> None:
    """Best-effort reclaim of crash-leftover build temp dirs for this
    cache key (age-gated so a LIVE concurrent builder's tmp survives)."""
    import glob
    import time
    for d in glob.glob(f"{path}.tmp*"):
        try:
            if time.time() - os.path.getmtime(d) > 3600:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass


def _publish(tmp: str, path: str) -> None:
    """Atomic publish: rename tmp into place.  On failure, discard tmp
    ONLY if a finished winner exists at the destination — any other
    rename error (permissions, missing parent) re-raises instead of
    deleting the only good copy and returning a path that doesn't
    exist."""
    try:
        os.rename(tmp, path)
    except OSError:
        if os.path.exists(os.path.join(path, "_BUILT")):
            shutil.rmtree(tmp, ignore_errors=True)  # lost the race
        else:
            # non-race failure (permissions, missing parent): leave tmp
            # on disk — it is the only good copy and _sweep_stale_tmp
            # age-gates its reclaim — and propagate the error
            raise


def clustered_graph_path(sf_dir: str, base_dir: str | None = None) -> str:
    root = base_dir or os.path.join(tempfile.gettempdir(), "jcs_graph_cache")
    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:v{LAYOUT_VERSION}:b{EDGE_BUCKETS}"
        f":{_source_fingerprint(sf_dir)}".encode()
    ).hexdigest()[:12]
    return os.path.join(root, key)


def ensure_clustered_graph(spark: SparkSession, sf_dir: str,
                           base_dir: str | None = None,
                           num_files: int = 8) -> str:
    """Build the clustered adjacency for `sf_dir` if absent; return path.

    Concurrent builders (threads OR processes) race safely: each writes
    to a (pid, uuid)-suffixed temp dir and atomically renames into
    place; the loser discards its copy.  `num_files` applies at BUILD
    time only — a warm cache serves whatever granularity its builder
    chose (it is deliberately not part of the cache key: content is
    identical either way)."""
    path = clustered_graph_path(sf_dir, base_dir)
    marker = os.path.join(path, "_BUILT")
    if os.path.exists(marker):
        return path

    _sweep_stale_tmp(path)
    g = derive_star_graph(spark, sf_dir, None, with_etype=True)
    tmp = f"{path}.tmp{_build_token()}"
    (g.edges.repartition(num_files, "src")
     .sortWithinPartitions("etype", "src", "dst")
     .write.mode("overwrite").partitionBy("etype")
     .parquet(os.path.join(tmp, "edges")))
    (g.vertices.repartition(num_files, "id")
     .sortWithinPartitions("label", "id")
     .write.mode("overwrite").partitionBy("label")
     .parquet(os.path.join(tmp, "vertices")))
    # bucketed table fed from the JUST-WRITTEN partitioned edges, not a
    # third re-derivation of the star-schema lineage — cheaper AND
    # guarantees the two layouts are bit-identical
    written = spark.read.parquet(os.path.join(tmp, "edges"))
    _write_bucketed_edges(spark, written, tmp)
    open(os.path.join(tmp, "_BUILT"), "w").close()
    _publish(tmp, path)
    return path


def _edge_cols_ddl(df: DataFrame) -> str:
    fields = [f for f in df.schema.fields
              if f.name in ("src", "dst", "label", "weight")]
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)


# the two persisted bucket orientations (the CSR/CSC dual): src-keyed
# joins (pregel message sends) and dst-keyed joins (HITS hub half-step,
# reverse-edge fixpoints) each read their own Exchange-free layout
_BUCKET_ORIENTATIONS = {"src": ("", "src", "src, dst"),
                        "dst": ("_dst", "dst", "dst, src")}


def _write_bucketed_edges(spark: SparkSession, edges: DataFrame,
                          tmp_dir: str) -> None:
    """Write the edge set as BUCKETED external tables inside the build's
    temp dir (they ride ensure_clustered_graph's atomic rename — one
    builder, one race mechanism).  Bucketing on src is the full analog of
    the reference's MergeTree `ORDER BY (k,c)` primary index
    (QueryHelper.java:57): every pregel/frontier join on src reads
    co-partitioned buckets with NO Exchange on the edge side, vs the
    sorted-parquet layout which gives pruning + row-group skipping only.
    The dst orientation is the same index for the reverse direction —
    2× the (small, fixed-width) edge footprint buys every dst-keyed
    half-step the same Exchange-free read.  The catalog entries are
    session-scoped metadata (re-registered per session); the bucket
    FILES are what persist."""
    e = edges.select("src", "dst", "label", "weight")
    for suffix, key, sort in _BUCKET_ORIENTATIONS.values():
        loc = os.path.join(tmp_dir, f"edges_bucketed{EDGE_BUCKETS}{suffix}")
        os.makedirs(loc, exist_ok=True)  # CREATE TABLE…LOCATION stats it
        tname = f"jcs_build_{_build_token()}"
        spark.sql(f"DROP TABLE IF EXISTS {tname}")
        spark.sql(
            f"CREATE TABLE {tname} ({_edge_cols_ddl(e)}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({sort}) "
            f"INTO {EDGE_BUCKETS} BUCKETS LOCATION '{loc}'")
        e.write.mode("overwrite").insertInto(tname)
        spark.sql(f"DROP TABLE {tname}")  # metadata only; files stay


def _bucketed_table(spark: SparkSession, sf_dir: str, orientation: str,
                    base_dir: str | None) -> DataFrame:
    path = ensure_clustered_graph(spark, sf_dir, base_dir)
    suffix, key, sort = _BUCKET_ORIENTATIONS[orientation]
    loc = os.path.join(path, f"edges_bucketed{EDGE_BUCKETS}{suffix}")
    # the table name keys on the FULL location (not just the basename):
    # the same sf_dir cached under two base_dirs shares a basename key,
    # and the first registration would otherwise serve its location to
    # every later caller
    table = ("jcs_edges_"
             + hashlib.md5(os.path.abspath(loc).encode()).hexdigest()[:12])
    if not spark.catalog.tableExists(table):
        cols = _edge_cols_ddl(spark.read.parquet(loc))
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {table} ({cols}) USING parquet "
            f"CLUSTERED BY ({key}) SORTED BY ({sort}) "
            f"INTO {EDGE_BUCKETS} BUCKETS LOCATION '{loc}'")
    return spark.table(table)


def bucketed_edges(spark: SparkSession, sf_dir: str,
                   base_dir: str | None = None) -> DataFrame:
    """The clustered edge set served through its src-BUCKETED catalog
    table: joins/aggregations keyed on src skip the edge-side Exchange
    entirely (tests/test_plans.py pins the plan shape).  Registers the
    external table in this session's catalog if absent — a pure-DDL step
    over the already-built bucket files."""
    return _bucketed_table(spark, sf_dir, "src", base_dir)


def bucketed_edges_by_dst(spark: SparkSession, sf_dir: str,
                          base_dir: str | None = None) -> DataFrame:
    """The same edge set served through the dst-BUCKETED orientation:
    joins/aggregations keyed on dst (the HITS hub half-step, in-degree
    style folds inside iterative loops) skip the edge-side Exchange —
    previously those consumers paid an in-memory repartition(dst) per
    algorithm invocation."""
    return _bucketed_table(spark, sf_dir, "dst", base_dir)


def clustered_star_graph(spark: SparkSession, sf_dir: str,
                         edge_labels: set[str] | None = None,
                         base_dir: str | None = None) -> PropertyGraph:
    """star_schema_graph served from the persisted clustered layout,
    restricted to `edge_labels` with the SAME semantics as the in-plan
    derivation (etype — not label — is the restriction key, so
    supplier→nation edges don't leak into `in_nation` selections; the
    vertex universe matches the derivation's table-skipping rule)."""
    path = ensure_clustered_graph(spark, sf_dir, base_dir)
    verts = spark.read.parquet(os.path.join(path, "vertices"))
    if edge_labels is None:
        # full-graph reads (pagerank/bfs/sssp) serve edges from the
        # BUCKETED table: message joins on src run Exchange-free.  The
        # dst orientation rides along for algorithms with dst-keyed
        # half-steps (hits) — registration is pure DDL, the scan is lazy
        g = PropertyGraph(verts.select("id", "label", "name"),
                          bucketed_edges(spark, sf_dir, base_dir)
                          .select("src", "dst", "label", "weight"),
                          src_partitioned=True)
        g.edges_by_dst = (bucketed_edges_by_dst(spark, sf_dir, base_dir)
                          .select("src", "dst", "label", "weight"))
        return g
    edges = spark.read.parquet(os.path.join(path, "edges"))
    want = edge_labels & _KNOWN_EDGE_SETS
    edges = edges.filter(F.col("etype").isin(sorted(want)))
    vlabels = {"customer", "nation", "region"}
    if want & _FACT_EDGE_SETS:
        vlabels |= {"order", "part", "supplier"}
    verts = verts.filter(F.col("label").isin(sorted(vlabels)))
    return PropertyGraph(verts.select("id", "label", "name"),
                         edges.select("src", "dst", "label", "weight"))


# -- clustered interaction graph (events-derived; build once per window) ----

def _events_fingerprint(sf_dir: str) -> str:
    return _stat_fingerprint([os.path.join(sf_dir, "events.parquet")])


def interaction_graph_path(sf_dir: str, window: str,
                           base_dir: str | None = None) -> str:
    root = base_dir or os.path.join(tempfile.gettempdir(), "jcs_graph_cache")
    key = hashlib.md5(
        f"ig:{os.path.abspath(sf_dir)}:w{window}:v{LAYOUT_VERSION}"
        f":{_events_fingerprint(sf_dir)}".encode()
    ).hexdigest()[:12]
    return os.path.join(root, key)


def ensure_interaction_graph(spark: SparkSession, sf_dir: str,
                             window: str = "10 minutes",
                             base_dir: str | None = None,
                             num_files: int = 8) -> str:
    """Materialize the events-derived interaction graph ONCE per
    (sf_dir, window): the distinct + window self-join is a full pass over
    the event log, which k-core / LPA / link-prediction / degree queries
    would otherwise each repeat.  Persisted as (src, dst)-sorted clustered
    parquet (row-group pruning on src), same build discipline as the
    star-schema cache: content fingerprint key, pid-suffixed temp dir,
    atomic rename."""
    path = interaction_graph_path(sf_dir, window, base_dir)
    marker = os.path.join(path, "_BUILT")
    if os.path.exists(marker):
        return path
    from .model import derive_interaction_graph
    _sweep_stale_tmp(path)
    g = derive_interaction_graph(spark, sf_dir, window)
    tmp = f"{path}.tmp{_build_token()}"
    save_graph(g, tmp, num_files=num_files)
    open(os.path.join(tmp, "_BUILT"), "w").close()
    _publish(tmp, path)
    return path


def clustered_interaction_graph(spark: SparkSession, sf_dir: str,
                                window: str = "10 minutes",
                                base_dir: str | None = None) -> PropertyGraph:
    path = ensure_interaction_graph(spark, sf_dir, window, base_dir)
    return load_graph(spark, path)
