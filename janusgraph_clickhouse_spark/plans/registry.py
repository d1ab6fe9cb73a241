"""Query registry: the declared operator inventory.

Every operator claimed done in SURVEY §2 registers here with
- a Spark plan builder ``(spark, sf_dir) -> DataFrame``;
- where SQL-expressible, an equivalent ANSI-SQL oracle for DuckDB.

Column names are aligned between both sides (the driver sorts columns by
name before hashing values).  Floating aggregates are rounded identically
on both sides so cross-engine summation order can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver runs a rows-only check."""
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# The correctness driver evaluates only the FIRST 50 entries of
# ``queries()`` in dict order (round-1 lesson: registration order put all
# llm/streaming queries past the cut — 20 queries got no correctness row).
# These 50 names are emitted first: every family represented, every
# oracle-backed query in-window, near-duplicate relational variants
# (q02/q04/q05 ~ q01/q03, q22-q25/q27/q28/q31-q34 overlap other TPC-H /
# window shapes already driver-evidenced in round 1) deferred to the
# tail.  A typo here would silently drop a query
# from the window — get_queries() asserts every name resolves.
DRIVER_PRIORITY: list[str] = [
    # relational: KCVS core + one representative per distinct surface
    "q01_slice_point", "q03_key_range_scan", "q06_agg_pricing_summary",
    "q08_customer_top_parts", "q13_predicate_library",
    "q17_scalar_functions", "q18_json_extract", "q19_mutate_upsert",
    "q20_group_collect", "q21_array_functions", "q26_rollup", "q29_pivot",
    "q30_percentiles", "q35_range_step",
    # graph: all
    "g01_out_degree", "g02_two_hop_parts", "g03_supplier_triangles",
    "g04_connected_components", "g05_bfs_distances", "g06_pagerank",
    "g07_traversal_semi_anti", "g08_path_query", "g09_in_traversal",
    "g10_weighted_sssp", "g11_interaction_degree", "g12_motif_count",
    "g13_topo_levels",
    # llm pipeline: all
    "l01_exact_dedup", "l02_jaccard_pairs", "l03_minhash_lsh_pairs",
    "l04_simhash_pairs", "l05_cosine_topk", "l06_cosine_near_dup",
    "l07_text_stats", "l08_language_id", "l09_fingerprint",
    "l10_multimodal_meta", "l11_ann_lsh_topk", "l12_ivf_ann_topk",
    "l13_hash_split", "l14_groupwise_normalize", "l15_label_centroids",
    "l16_pipeline_composed",
    # streaming: all
    "s01_tumbling_window", "s02_sliding_window", "s03_session_window",
    "s04_dedup_keep_first", "s05_asof_join", "s06_time_rollup",
    "s07_interval_join",
]


def _ordered(d: dict) -> dict:
    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"
    out = {n: d[n] for n in DRIVER_PRIORITY if n in d}
    for n, v in d.items():
        if n not in out:
            out[n] = v
    return out


def get_queries() -> dict[str, QueryFn]:
    return _ordered(QUERIES)


def get_oracles() -> dict[str, str]:
    return _ordered(ORACLES)
