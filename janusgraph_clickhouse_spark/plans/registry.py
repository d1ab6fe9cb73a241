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
#
# ROTATION POLICY (round 3+): with >50 registered queries the window must
# rotate every round so no query's newest driver row is >1 round old.
# Each round the window is rebuilt from, in order of precedence:
#   1. queries with NO driver row from the previous round (the stale set);
#   2. queries whose implementation/oracle changed this round;
#   3. queries red or no_oracle in the previous round's CORRECTNESS;
#   4. newly registered queries;
#   5. family sentinels (≥2 per q/g/l/s family) from last round's greens.
# Everything else goes to the tail — it keeps local pytest parity
# coverage (tests/test_oracle_parity.py sweeps ALL queries) and returns
# to the window next round under rule 1.
#
# Round-3 window: the 21 relational queries stale since r1 (rule 1);
# g03/g04/g06/l04/s05 changed this round (rule 2); l11/l12 newly oracled
# (rule 3); q20/q21/g08 r1-red fixes kept one more round; sentinels +
# this round's new queries fill to 50.  A typo here would silently drop
# a query from the window — get_queries() asserts every name resolves.
DRIVER_PRIORITY: list[str] = [
    # rule 1: relational tail stale since round 1
    "q02_slice_multikey", "q04_multi_range_scan", "q05_unordered_scan_topk",
    "q07_group_count", "q09_semi_join", "q10_anti_join",
    "q11_shipping_priority", "q12_region_revenue", "q14_union_dedup",
    "q15_per_group_topk", "q16_distinct_pairs", "q22_left_outer_distribution",
    "q23_having", "q24_correlated_min", "q25_count_distinct",
    "q27_set_operations", "q28_sql_surface", "q31_statistics",
    "q32_cross_nation_volume", "q33_large_order_customers",
    "q34_window_analytics",
    # rule 2: implementation changed in round 3
    "g03_supplier_triangles", "g04_connected_components", "g06_pagerank",
    "l04_simhash_pairs", "s05_asof_join",
    # rule 3: newly oracled this round
    "l11_ann_lsh_topk", "l12_ivf_ann_topk",
    # rule 4: new queries registered in round 3 (never driver-checked —
    # strictly higher value than re-confirming r2 greens, so the r1-red
    # fixes q20/q21/g08 and three l-sentinels, all green in r2, rotate
    # to the tail and return next round under rule 1)
    "g14_repeat_until", "l17_lsh_blocked_near_dup",
    "g15_kcore", "g16_label_propagation", "g17_link_prediction",
    "l18_dedup_clusters", "l19_knn_join", "l20_vocab_topk",
    "g18_hits", "l21_decontaminate",
    "l22_domain_mixture", "l23_repetition_stats",
    "g19_personalized_pagerank", "g20_random_walks",
    "l24_sequence_packing", "l25_tfidf_topk", "l26_bigram_lm_score",
    "q36_cube_grouping", "l27_semantic_dedup_clusters",
    "l28_user_event_sequences", "l29_length_band_filter",
    # rule 5: family sentinel (r2-green spot check; q/g/l already have
    # ≥10 in-window rows each via rules 1-4)
    "s01_tumbling_window",
]
assert len(DRIVER_PRIORITY) == 50, len(DRIVER_PRIORITY)


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
