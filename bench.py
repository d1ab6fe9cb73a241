#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Headline set: one representative per operator family (KCVS slice, agg,
join pipeline, semi-join, graph degree/triangles/CC/PageRank/BFS, fuzzy
dedup, similarity, text stats, windows/sessions) — the queries a user of
the reference system would actually run, not the cheapest subset.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from janusgraph_clickhouse_spark.plans import get_queries  # noqa: E402
from janusgraph_clickhouse_spark.session import get_spark, tune_session  # noqa: E402

HEADLINE = [
    "q01_slice_point",        # KCVS point slice
    "q06_agg_pricing_summary",  # full-scan hash agg (TPC-H Q1 shape)
    "q08_customer_top_parts",   # flagship traversal join + top-K
    "q11_shipping_priority",    # selective 3-way join (Q3 shape)
    "q12_region_revenue",       # 5-way join (Q5 shape)
    "q15_per_group_topk",       # window top-K
    "g01_out_degree",           # graph degree
    "g03_supplier_triangles",   # triangle enumeration
    "g04_connected_components", # iterative CC (Pregel)
    "g05_bfs_distances",        # frontier BFS
    "g06_pagerank",             # iterative PageRank (Pregel)
    "l02_jaccard_pairs",        # fuzzy dedup exact baseline
    "l03_minhash_lsh_pairs",    # MinHash-LSH + rerank
    "l04_simhash_pairs",        # SimHash (vectorized signature UDF)
    "l05_cosine_topk",          # similarity search
    "l07_text_stats",           # text analysis
    "s01_tumbling_window",      # windowed agg
    "s03_session_window",       # session windows
    "s05_asof_join",            # as-of join (union-merge)
    "q34_window_analytics",     # running sums / lag / ntile
    "l16_pipeline_composed",    # dedup→filter→split composed pipeline
    # round-3 additions (new operator families; PERF.md tracks the
    # headline-total discontinuity)
    "g15_kcore",                # iterative peeling
    "l18_dedup_clusters",       # pairs → CC → canonical survivors
    "l20_vocab_topk",           # corpus token frequency
    "l21_decontaminate",        # benchmark n-gram containment
    "g17_link_prediction",      # dense bit-matrix Adamic-Adar
    "g19_personalized_pagerank",  # source-restricted teleport (Pregel)
    "g20_random_walks",         # seeded deterministic walks
    "l24_sequence_packing",     # distributed prefix-sum packing
    "l26_bigram_lm_score",      # corpus-LM quality scoring
    "s07_interval_join",        # stream-shaped interval self-join
    # round-4 additions
    "l30_incremental_dedup",    # batch-vs-index fingerprint dedup
    "q37_geo_within",           # geo predicate stack (haversine + box)
    "g21_harmonic_centrality",  # source-labeled multi-source BFS
    "l31_boilerplate_score",    # corpus-df template detection
    # round-5 additions
    "g22_biased_walks",         # node2vec (p,q) deterministic race
    "l32_containment_pairs",    # bottom-k sketch + exact containment
    "l33_pii_scrub",            # regex redaction + audit counts
    # late-round-5 additions
    "g23_scc",                  # FW-BW coloring SCC (iterative)
    "g24_local_clustering",     # per-vertex triangles (dense bitset)
    "l34_bloom_decontaminate",  # broadcast-Bloom prefilter + confirm
    "l35_sq8_topk",             # int8-quantized scan + exact rerank
    "g25_ktruss",               # bounded-iteration truss peeling
    "l37_shared_spans",         # exact-substring span dedup (islands)
    "l38_cdc_chunk_dedup",      # content-defined chunking + chunk dedup
    "l40_pq_topk",              # PQ-ADC ANN (codebook train + rerank)
    "s08_trending_topk",        # sliding-window rank (WindowGroupLimit)
    # third-block round-5 additions
    "q39_window_funnel",        # ClickHouse windowFunnel (interval joins)
    "q41_hll_distinct",         # deterministic HLL sketch
    "l41_dsir_weights",         # DSIR hashed-ngram importance weights
    "l43_bpe_merges",           # BPE tokenizer-merge training
    "g27_diameter",             # double-sweep BFS diameter
    "s10_scd2_versions",        # SCD2 islands build
    # round-6 additions
    "q43_kmv_set_ops",          # KMV/theta sketch set algebra
    "g29_copurchase_lift",      # bipartite projection + lift
    "l47_entropy_quality",      # word/char entropy quality signals
    "l50_knn_classify",         # LSH-blocked kNN majority vote
    "s16_lttb_downsample",      # parallel LTTB downsampling
    # round-7 additions
    "q46_hll_mergeable_rollup", # uniqState/uniqMerge register merge
    "q48_histogram_quantiles",  # mergeable histogram quantile states
    "s17_sequence_match",       # sequenceMatch funnel regexes
    "l53_paragraph_dedup",      # paragraph keep-first + reassembly
    "l54_stratified_split",     # largest-remainder exact split
    "l55_ann_recall_eval",      # ANN recall@k vs brute force
    "q49_weighted_quantiles",   # exact weighted p50/p90/p99
    "l56_source_overlap_matrix",  # per-source MinHash overlap
    "s18_sequence_count",       # sequenceCount pattern counting
    "l57_audio_rms",            # real WAV encode->decode RMS
    "q50_range_frame_windows",  # RANGE-frame moving window aggs
    "l58_snapshot_diff",        # corpus version diff
    # late-round-7 additions (PERF.md tracks the headline-total
    # discontinuity per usual)
    "q51_bitmap_segments",      # exact segment-overlap matrix
    "q54_top_event_paths",      # user-flow path analysis
    "l59_vocab_js_drift",       # source unigram JS divergence
    "l62_winnow_pairs",         # winnowing/MOSS fingerprint pairs
    "l63_embedding_outliers",   # integer-exact centroid outliers
    "g32_weighted_sssp",        # frontier Bellman-Ford (SPFA)
    "g33_temporal_reachability",  # time-respecting earliest arrival
    "s20_incremental_hll",      # streaming uniqState maintenance
    "s21_interval_full_join",   # stream-stream full-outer interval
    # round-10 addition (PERF.md notes the headline-total discontinuity):
    # g18 had no bench entry, so its two rounds of restructuring were
    # adjudicated only via sweeps/standalone pins — give it a per-round
    # quiet-box record like the other heavy iterative queries
    "g18_hits",                 # HITS hubs/authorities (dual-orientation)
]


def _calibrate(spark) -> dict[str, float]:
    """Ambient-load probe: two FIXED workloads whose unloaded cost is a
    property of the box, not the engine — their inflation factor vs a
    quiet run normalizes cross-round comparisons (BENCH_r04 read +28%
    purely from co-tenant contention; PERF.md 'calibration' section).

    spin_sec:  5M-iteration deterministic xorshift in pure Python — one
               core, no JVM, no allocation; scales with CPU contention.
    spark_sec: sum over range(200M) — a fixed all-core JVM job with no
               I/O and one tiny result; scales with JVM/executor-thread
               contention.
    io_sec:    full single-thread pyarrow read of one fixed parquet
               column (lineitem.l_extendedprice at the bench SF) —
               rules storage/page-cache contention in or out, the
               component the two CPU probes can't see.  A run where all
               three probes are quiet but queries are uniformly slow is
               host-level pressure (hypervisor steal, memory bandwidth)
               — compare totals only against runs, not across them."""
    t0 = time.perf_counter()
    x = 0x9E3779B97F4A7C15
    for _ in range(5_000_000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    spin = time.perf_counter() - t0
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 3 + 1)").collect()
    jvm = time.perf_counter() - t0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    t0 = time.perf_counter()
    try:
        import pyarrow.parquet as pq
        pq.read_table(os.path.join(sf_dir, "lineitem.parquet"),
                      columns=["l_extendedprice"], use_threads=False)
        io = time.perf_counter() - t0
    except Exception:
        io = -1.0
    return {"spin_sec": round(spin, 3), "spark_sec": round(jvm, 3),
            "io_sec": round(io, 3)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("jcs-bench", cpus=cpus)
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    queries = get_queries()

    # Untimed warmup: JVM/JIT + codegen + parquet footer reads, plus the
    # one-time clustered-adjacency build (a write, amortized over every
    # later graph query — not part of per-query execution); the bench
    # measures query execution, not session bring-up.
    from janusgraph_clickhouse_spark.sources import load_tables
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()
    from janusgraph_clickhouse_spark.graph.persistence import (
        ensure_clustered_graph)
    ensure_clustered_graph(spark, sf_dir)

    cal_pre = _calibrate(spark)

    # best-of-N per query: the box shares CPU with other tenants, and
    # single observations mix external load into the number (observed
    # ±50% swings on identical code). Min over repeats measures the
    # engine, not the neighbors.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = len(df.collect())
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {n} rows in {best:.2f}s (best of {repeats})",
              file=sys.stderr)

    # derive sf from the dir name when possible
    sf = None
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    cal_post = _calibrate(spark)

    line = json.dumps({
        "metric": "headline_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # pre/post bracket the query run; compare to the quiet-box
        # reference values recorded in PERF.md to normalize for ambient
        # load (inflated calibration == inflated query secs, same cause)
        "calibration": {f"{k}_{w}": v
                        for w, c in (("pre", cal_pre), ("post", cal_post))
                        for k, v in c.items()},
    })
    print(line)
    # Durability (r15, VERDICT r14 item 6 — additive, contract-
    # preserving): the r13<->r14 round-over-round comparison was LOST
    # because the driver's 2000-char output tail could not hold this
    # ~2.5 KB line.  Also write it next to the script so a truncated
    # capture can always be recovered from the repo.
    try:
        with open(os.path.join(REPO, "BENCH_LAST.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass  # read-only checkout: the printed line stays the contract


if __name__ == "__main__":
    main()
