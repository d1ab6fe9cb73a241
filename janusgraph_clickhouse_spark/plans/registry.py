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
# Round-6 window.  CORRECTNESS_r05.json NEVER LANDED (driver gate
# hiccup — the round-5 window of 46-stale+l02+g22/l32/l33 got no
# driver rows).  The rotation test measures staleness in FILES
# (union of greens over the last ceil(N/50)=3 CORRECTNESS files), so
# with r5's file missing the r3 rows of the old window names stay
# "recent" one extra round — the binding constraint is instead the 82
# names whose newest (possibly virtual) row is r4: the 49 r4-greens
# from the r4 window plus all 33 REGISTERED_ROUND=5 names (virtual r4;
# g22/l32/l33 were windowed in r5 but, with the file missing, never
# got a REAL row either).  Stalest-first among those: the 33 virtuals
# (zero real driver evidence, rule 4) then 17 of the 49 reals chosen
# for plan complexity + family spread; the remaining 32 reals spill
# to round 7.  This choice stays inside the staleness bound in BOTH
# contingencies: if r5's file never appears, r7 must (and can) window
# the 47 old-window names (their r3 file leaves the 3-file horizon
# once r7's file lands) + 3 spills, r8 the other 29 spills; if the
# file appears late, the 47 are r5-fresh and r7 windows the 32 spills
# with 18 slots spare.  A typo here would silently drop a query from
# the window — get_queries() asserts every name resolves.
DRIVER_PRIORITY: list[str] = [
    # rule 4/1: the 33 round-5 registrations with no real driver row
    "g22_biased_walks", "l32_containment_pairs", "l33_pii_scrub",
    "g23_scc", "g24_local_clustering", "g25_ktruss",
    "g26_assortativity", "g27_diameter", "g28_mis",
    "l34_bloom_decontaminate", "l35_sq8_topk", "l36_domain_cap",
    "l37_shared_spans", "l38_cdc_chunk_dedup", "l39_gopher_rules",
    "l40_pq_topk", "l41_dsir_weights", "l42_weighted_sample",
    "l43_bpe_merges", "l44_curation_pipeline", "l45_bpe_token_counts",
    "l46_lsh_banding_audit",
    "q38_argmax_latest", "q39_window_funnel", "q40_retention",
    "q41_hll_distinct", "q42_cms_heavy_hitters",
    "s08_trending_topk", "s09_interval_left_join", "s10_scd2_versions",
    "s11_stateful_running_totals", "s12_incremental_rollup",
    "s13_decayed_score",
    # rule 1 (within the r4-row cohort): 17 of the 49 r4-greens,
    # complex-plan/high-risk picks with ≥2 per family
    "q01_slice_point", "q06_agg_pricing_summary", "q17_scalar_functions",
    "q19_mutate_upsert",
    "g03_supplier_triangles", "g05_bfs_distances",
    "g17_link_prediction", "g20_random_walks", "g21_harmonic_centrality",
    "l01_exact_dedup", "l03_minhash_lsh_pairs", "l04_simhash_pairs",
    "l10_multimodal_meta", "l30_incremental_dedup", "l31_boilerplate_score",
    "s06_time_rollup", "s07_interval_join",
]
# SATURATION AMENDMENT (late r5): the registry crossed 100 queries
# (g23/g24/l34 registered mid-round, landing in the TAIL — the r5
# window was already the mandated 46-stale+l02+3-new set).  At N
# registered queries and a 50-query driver window, every query can get
# a driver row at most every ceil(N/50) rounds, so the rotation test
# now enforces staleness ≤ ceil(N/50) rounds (still 1 while N ≤ 100)
# instead of a flat 1 — exactly the relaxation CLAUDE.md's saturation
# warning pre-announced.  Queries registered mid-round carry their
# registration round in REGISTERED_ROUND and are treated as having a
# virtual driver row from the round before registration (they are
# parity-swept locally from the moment they register).  The full
# every-round local sweep (test_oracle_parity) remains the invariant
# that makes the longer driver cadence safe.
REGISTERED_ROUND: dict[str, int] = {
    "g22_biased_walks": 5, "l32_containment_pairs": 5, "l33_pii_scrub": 5,
    "g23_scc": 5, "g24_local_clustering": 5, "l34_bloom_decontaminate": 5,
    "l35_sq8_topk": 5, "l36_domain_cap": 5, "g25_ktruss": 5,
    "l37_shared_spans": 5, "l38_cdc_chunk_dedup": 5,
    "l39_gopher_rules": 5, "s08_trending_topk": 5, "l40_pq_topk": 5,
    "s09_interval_left_join": 5,
    "q38_argmax_latest": 5, "g26_assortativity": 5,
    "l41_dsir_weights": 5, "l42_weighted_sample": 5,
    "s10_scd2_versions": 5, "q39_window_funnel": 5, "q40_retention": 5,
    "l43_bpe_merges": 5, "g27_diameter": 5, "q41_hll_distinct": 5,
    "q42_cms_heavy_hitters": 5, "s11_stateful_running_totals": 5,
    "s12_incremental_rollup": 5, "l44_curation_pipeline": 5,
    "l45_bpe_token_counts": 5, "g28_mis": 5, "s13_decayed_score": 5,
    "l46_lsh_banding_audit": 5,
    # round-6 registrations (virtual r5 row; real row due by round 8)
    "q43_kmv_set_ops": 6, "q44_delta_sum": 6,
    "s14_gap_fill": 6, "s15_pit_enrich": 6,
    "g29_copurchase_lift": 6,
    "l47_entropy_quality": 6, "l48_url_canonical_dedup": 6,
    "l49_fuzzy_linkage": 6, "l50_knn_classify": 6,
    "g30_modularity": 6, "l51_hard_negatives": 6,
    "s16_lttb_downsample": 6, "g31_betweenness": 6,
    "q45_ttl_partition_prune": 6, "l52_source_report": 6,
}

# ROUND-7 ROTATION, pre-derived (contingent on whether the missing
# CORRECTNESS_r05.json ever appears):
# - r5 file still missing (expected): the 47 round-5-window names
#   (newest real row r3) lose coverage the moment r7's file lands
#   (the 3-file horizon becomes {r4,r6,r7}) — window ALL of them
#   first: q02 q04 q05 q07 q09-q16 q22-q25 q27 q28 q31-q34 q36,
#   g04 g06 g14 g15 g16 g18 g19, l02 l11 l12 l17-l29, s01 s05;
#   fill the remaining 3 slots from the 32 r4-spills below, and
#   window the other 29 spills FIRST in round 8.
# - r5 file appeared late: those 47 are r5-fresh; window the 32
#   r4-spills first (18 slots spare for rule-2/rule-4 names).
# The 32 r4-spills (newest real row r4, deferred from the r6 window):
#   q03 q08 q13 q18 q20 q21 q26 q29 q30 q35 q37,
#   g01 g02 g07 g08 g09 g10 g11 g12 g13,
#   l05 l06 l07 l08 l09 l13 l14 l15 l16,
#   s02 s03 s04
# Round-6 registrations carry REGISTERED_ROUND=6 (virtual r5 row) and
# must get a real row by round 8 at the latest.
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
