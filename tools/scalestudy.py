#!/usr/bin/env python
"""Measured weak-scaling study over scalegen fixtures.

    python tools/scalestudy.py PERF_scale_r11.json [--scales 1 3 10]
                               [--names g23_scc l18_dedup_clusters ...]

For each scale k it runs every chosen registered query against
/tmp/jcs_scale/x{k} (k=1 → the sf0.1 source) and records warm
best-of-2 seconds.  Timing CONSUMES every output column via
xxhash64 (map columns through to_json) — `count()` prunes unreferenced
columns even through expression-built signature stages (the r11 l04
"phantom fast signature" trap, CLAUDE.md), which would fake flat
scaling exactly where a stage is expensive.  The consume convention
adds a per-row JVM hash, linear at every scale, so cross-scale RATIOS
stay honest; the absolute numbers are NOT pin-comparable.

Output JSON: {scales, names, secs: {name: {k: sec}}, rows: {name: {k}},
ratio10 (t10/t1), calibration}.  Ideal weak scaling on a 32-thread
box is ratio10 ≤ 10 (linear data term) and ≪ 10 for queries still
dominated by fixed per-job overhead at sf0.1; ratio10 ≫ 10 is a
scale-shape red flag that gets a plan read.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# one representative per family, biased to everything expensive or
# carrying candidate-generation machinery (the plans whose 100 TB
# story the study is evidence for)
DEFAULT_NAMES = [
    # relational
    "q06_agg_pricing_summary", "q08_customer_top_parts",
    "q12_region_revenue", "q15_per_group_topk", "q34_window_analytics",
    # graph iterative / traversal
    "g03_supplier_triangles", "g04_connected_components",
    "g05_bfs_distances", "g06_pagerank", "g15_kcore",
    "g17_link_prediction", "g18_hits", "g19_personalized_pagerank",
    "g23_scc", "g24_local_clustering", "g25_ktruss", "g27_diameter",
    "g33_temporal_reachability",
    # LLM dedup / similarity / text
    "l01_exact_dedup", "l02_jaccard_pairs", "l03_minhash_lsh_pairs",
    "l04_simhash_pairs", "l05_cosine_topk", "l18_dedup_clusters",
    "l21_decontaminate", "l27_semantic_dedup_clusters",
    "l30_incremental_dedup", "l32_containment_pairs", "l40_pq_topk",
    "l50_knn_classify", "l56_source_overlap_matrix", "l62_winnow_pairs",
    # streaming-shaped batch
    "s01_tumbling_window", "s07_interval_join", "s20_incremental_hll",
]


def _consume(df) -> tuple[int, int]:
    """Force-compute every column; return (rows, checksum)."""
    from pyspark.sql import functions as F
    cols = []
    for name, dtype in df.dtypes:
        cols.append(F.to_json(F.struct(name)) if dtype.startswith("map<")
                    else F.col(name))
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")).first()
    return row["n"], int(row["h"] or 0)


def _clear_state(spark) -> None:
    """Unpersist every cached/checkpointed block and clear SQL caches.

    A budget-cancelled query skips its own unpersist cleanup (the
    cancellation interrupts mid-function), and leaked eager
    localCheckpoints/caches then poison every later measurement —
    observed: after g17's 300 s cancel at x3, g18/g19 died with
    'Not enough memory to build and broadcast' on an 8g heap."""
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for k in list(jmap.keys()):
        try:
            jmap[k].unpersist()
        except Exception:
            pass


def _consume_budgeted(spark, make_df, budget_s: float) -> tuple[int, int]:
    """_consume under a wall-clock budget: the action runs in an
    InheritableThread tagged with a job group; on budget exhaustion the
    group is cancelled and TimeoutError raised.  Without this, ONE
    super-linear query eats the whole study (g17's dense bit-matrix at
    x3 sat >12 min with all 32 cores busy and zero tasks finishing —
    which is itself the finding, but must be RECORDED, not hung on)."""
    import threading
    from pyspark import InheritableThread
    group = f"scalestudy-{time.monotonic_ns()}"
    out: dict = {}
    done = threading.Event()

    def run():
        spark.sparkContext.setJobGroup(group, "scalestudy",
                                       interruptOnCancel=True)
        try:
            out["v"] = _consume(make_df())
        except Exception as exc:  # surfaced to the caller below
            out["e"] = exc
        finally:
            done.set()

    th = InheritableThread(run)
    th.daemon = True
    th.start()
    if not done.wait(budget_s):
        spark.sparkContext.cancelJobGroup(group)
        done.wait(60)
        raise TimeoutError(f"budget {budget_s:.0f}s exceeded (job group "
                           f"cancelled)")
    if "e" in out:
        raise out["e"]
    return out["v"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output JSON path")
    ap.add_argument("--scales", type=int, nargs="+", default=[1, 3, 10])
    ap.add_argument("--names", nargs="+", default=DEFAULT_NAMES)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--base", default="/tmp/jcs_scale")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--budget", type=float, default=300.0,
                    help="per-run wall-clock budget in seconds; a "
                         "timeout is recorded as an error entry")
    args = ap.parse_args()

    from tools.sweep import _saturation_probe, _spin
    from janusgraph_clickhouse_spark.plans import get_queries
    from janusgraph_clickhouse_spark.session import get_spark, tune_session
    from janusgraph_clickhouse_spark.sources import load_tables
    from janusgraph_clickhouse_spark.graph.persistence import (
        ensure_clustered_graph)

    queries = get_queries()
    # non-registered scale probes (absolute-band variants etc.) are
    # addressable by name here, never in the driver window
    from janusgraph_clickhouse_spark.plans.graph_queries import (
        SCALE_PROBES)
    queries = {**queries, **SCALE_PROBES}
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        sys.exit(f"not registered: {unknown}")

    spark = get_spark("jcs-scale", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")

    record = {"scales": args.scales, "src": args.src, "reps": args.reps,
              "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
              "saturation_pre": _saturation_probe(),
              "solo_spin_pre": _spin(),
              "secs": {n: {} for n in args.names},
              "rows": {n: {} for n in args.names},
              "errors": {}}
    print(f"calibration: solo {record['solo_spin_pre']}", flush=True)

    # untimed global warmup at the smallest scale: the first scale pass
    # otherwise eats all the JVM/JIT/codegen warmup and reads SLOWER
    # than the larger scales (observed: q06 x1 0.71 cold vs x3 0.39)
    k0 = min(args.scales)
    warm_dir = args.src if k0 == 1 else os.path.join(args.base, f"x{k0}")
    t0 = time.perf_counter()
    for df in load_tables(spark, warm_dir).values():
        df.limit(1).count()
    ensure_clustered_graph(spark, warm_dir)
    for name in args.names:
        try:
            _consume_budgeted(spark,
                              lambda: queries[name](spark, warm_dir),
                              min(args.budget, 120.0))
        except Exception:
            pass  # the timed pass records the error
        _clear_state(spark)  # r13: no cross-query block accumulation
    print(f"warmup pass x{k0}: {time.perf_counter()-t0:.1f}s", flush=True)

    for k in args.scales:
        sf_dir = args.src if k == 1 else os.path.join(args.base, f"x{k}")
        if not os.path.isdir(sf_dir):
            sys.exit(f"missing fixture {sf_dir} — run tools/scalegen.py {k}")
        _clear_state(spark)  # scale boundary: no carry-over blocks
        # untimed bring-up: footers + the one-time clustered build
        t0 = time.perf_counter()
        for df in load_tables(spark, sf_dir).values():
            df.limit(1).count()
        ensure_clustered_graph(spark, sf_dir)
        print(f"--- scale x{k} ({sf_dir}) bring-up "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        for name in args.names:
            try:
                best, rows = None, -1
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    rows, _h = _consume_budgeted(
                        spark, lambda: queries[name](spark, sf_dir),
                        args.budget)
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                    if best > 60:  # heavy entry: one clean read suffices
                        break
                record["secs"][name][str(k)] = round(best, 2)
                record["rows"][name][str(k)] = rows
                print(f"x{k} {name}: {best:.2f}s rows={rows}", flush=True)
                # r13: drop this query's checkpoint/cache blocks NOW —
                # completed queries' eager localCheckpoints otherwise
                # ACCUMULATE across a many-name x30 pass until the 8g
                # heap tips (executor OOM mid-batch; every single-name
                # rerun passed, only batches died — the leak is
                # cross-query, not per-query)
                _clear_state(spark)
            except Exception as exc:  # record, keep sweeping
                record["errors"][f"{name}@x{k}"] = str(exc)[:500]
                if best is not None:
                    # a later rep failed (e.g. budget timeout on rep 2)
                    # but rep 1 completed: keep the measured point next
                    # to the error instead of discarding it (r11 ADVICE)
                    record["secs"][name][str(k)] = round(best, 2)
                    record["rows"][name][str(k)] = rows
                    print(f"x{k} {name}: ERROR after a completed rep — "
                          f"keeping best {best:.2f}s rows={rows}",
                          flush=True)
                print(f"x{k} {name}: ERROR {str(exc)[:200]}", flush=True)
                _clear_state(spark)  # drop leaked caches/checkpoints

    hi = str(max(args.scales))
    lo = str(min(args.scales))
    record["ratio_hi_lo"] = {
        n: round(record["secs"][n][hi] / record["secs"][n][lo], 2)
        for n in args.names
        if hi in record["secs"][n] and lo in record["secs"][n]
        and record["secs"][n][lo] > 0}
    record["saturation_end"] = _saturation_probe()
    record["solo_spin_end"] = _spin()
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    worst = sorted(record["ratio_hi_lo"].items(), key=lambda kv: -kv[1])[:10]
    print("worst ratios:", worst, flush=True)
    print(f"calibration end: solo {record['solo_spin_end']}", flush=True)


if __name__ == "__main__":
    main()
