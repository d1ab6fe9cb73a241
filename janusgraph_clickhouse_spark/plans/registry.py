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
# Round-4 window: the 42 tail queries whose newest driver row is r2
# (rule 1 — the entire r3 tail; r3's window went 50/50 green so its
# members rotate out); g03/g17/g20/l04 change this round (rule 2:
# degree-orientation, hub salting + dense-memory fix, in-plan walk
# sources, sub_bands default); sentinels from r3 greens fill to 50.
# New queries registered this round MUST displace sentinels into this
# window (a new query in the tail has no prior driver row and trips
# test_driver_window_rotation_policy).  A typo here would silently drop
# a query from the window — get_queries() asserts every name resolves.
DRIVER_PRIORITY: list[str] = [
    # rule 1: the 42 queries whose newest driver row is round 2
    "q01_slice_point", "q03_key_range_scan", "q06_agg_pricing_summary",
    "q08_customer_top_parts", "q13_predicate_library",
    "q17_scalar_functions", "q18_json_extract", "q19_mutate_upsert",
    "q20_group_collect", "q21_array_functions", "q26_rollup",
    "q29_pivot", "q30_percentiles", "q35_range_step",
    "g01_out_degree", "g02_two_hop_parts", "g05_bfs_distances",
    "g07_traversal_semi_anti", "g08_path_query", "g09_in_traversal",
    "g10_weighted_sssp", "g11_interaction_degree", "g12_motif_count",
    "g13_topo_levels",
    "l01_exact_dedup", "l02_jaccard_pairs", "l03_minhash_lsh_pairs",
    "l05_cosine_topk", "l06_cosine_near_dup", "l07_text_stats",
    "l08_language_id", "l09_fingerprint", "l10_multimodal_meta",
    "l13_hash_split", "l14_groupwise_normalize", "l15_label_centroids",
    "l16_pipeline_composed",
    "s02_sliding_window", "s03_session_window", "s04_dedup_keep_first",
    "s06_time_rollup", "s07_interval_join",
    # rule 2: implementation changes this round
    "g03_supplier_triangles", "g17_link_prediction", "g20_random_walks",
    "l04_simhash_pairs",
    # rule 4: new queries registered this round (all four displaced the
    # rule-5 sentinels s01/q02/g06/l17 — every family keeps ≥2 in-window
    # members via rules 1-2, so the sentinels were the right casualties)
    "l30_incremental_dedup", "q37_geo_within",
    "g21_harmonic_centrality", "l31_boilerplate_score",
]
# ROUND-5 ROTATION, pre-derived (the rotation test goes red the moment
# the driver drops CORRECTNESS_r04.json — rebuild DRIVER_PRIORITY then):
# rule 1 = the 46 tail names below (every query whose newest driver row
# is r3); rule 2/4 slots = anything changed in r5 + the three operators
# queued for registration (biased_random_walks, containment_pairs,
# scrub_pii); fill any rest with r4-green sentinels (≥2 per family).
#   q02 q04 q05 q07 q09 q10 q11 q12 q14 q15 q16 q22 q23 q24 q25 q27
#   q28 q31 q32 q33 q34 q36, g04 g06 g14 g15 g16 g18 g19, l11 l12 l17
#   l18 l19 l20 l21 l22 l23 l24 l25 l26 l27 l28 l29, s01 s05
# (46 names; 50 − 46 = 4 slots before anything must displace rule-1.)
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
