#!/usr/bin/env python
"""Per-round full registry sweep: time EVERY registered query at sf0.1
(single pass, CLAUDE.md rule) AND every DuckDB oracle at the gate scale
(sf0.01), emitting one machine-readable JSON file.

The oracle timings exist because DuckDB RE-PLANS oracles against the
regenerated fixtures every round with no plan pins on its side: the r8
g06/g12 plan bombs (200 s / 177 s from CTE inlining) were caught only
because the parity sweep blew its wall-clock budget.  With a per-oracle
baseline in every round's sweep file, the next such regression is a
one-line diff against the previous round, not a debugging session
(r8 verdict task #6).

Usage:
    python tools/sweep.py PERF_sweep_r9.json
Env:
    SPARK_GRAFT_SF_DIR   Spark-side scale dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_ORACLE_SF_DIR  oracle scale dir (default /root/testdata/sf0.01)
    SPARK_GRAFT_CPUS     local[] width (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _spin() -> float:
    """Single-thread ambient-load probe (bench.py's calibration spin)."""
    t0 = time.perf_counter()
    x = 0x9E3779B97F4A7C15
    for _ in range(5_000_000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return round(time.perf_counter() - t0, 3)


def _spin_one(_: int) -> float:
    t0 = time.perf_counter()
    x = 0x9E3779B97F4A7C15
    for _ in range(5_000_000):
        x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return time.perf_counter() - t0


def _saturation_probe(width: int | None = None) -> dict:
    """All-cores contention probe: `width` concurrent PROCESS spins
    (threads are GIL-serialized and useless here — they read ~width×
    solo time even on an idle box).  A solo spin only sees pressure
    when every core is busy; a saturating Spark job contends with ANY
    external tenant, so this is the probe that actually predicts
    sweep inflation (r10: solo 1.27 "quiet" while 32-way read
    1.6–2.2 s under a 3–4-core tenant and the sweep ran 1.4× slow).
    Also records /proc/loadavg (external load visible the cheap way).
    Width defaults to min(32, cpu count) so a smaller box doesn't
    oversubscribe and read inflated while idle (r10 ADVICE); the
    width used is recorded in the emitted dict."""
    from concurrent.futures import ProcessPoolExecutor
    if width is None:
        width = min(32, os.cpu_count() or 1)
    try:
        with ProcessPoolExecutor(width) as ex:
            times = list(ex.map(_spin_one, range(width)))
        out = {"spin_width": width,
               "spin_min": round(min(times), 3),
               "spin_max": round(max(times), 3)}
    except Exception as e:  # sandboxed/odd environments: degrade loudly
        out = {"spin_width": width,
               "spin_err": f"{type(e).__name__}: {e}"[:100]}
    try:
        out["loadavg_1m"] = float(
            open("/proc/loadavg").read().split()[0])
    except OSError:
        pass
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PERF_sweep.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    oracle_sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                                   "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from janusgraph_clickhouse_spark.plans import get_oracles, get_queries
    from janusgraph_clickhouse_spark.session import get_spark, tune_session

    spark = get_spark("jcs-sweep", cpus=cpus)
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    queries, oracles = get_queries(), get_oracles()

    # untimed warmup: parquet footers + the one-time clustered graph
    # build (v4 writes both orientations; never time a cold build)
    from janusgraph_clickhouse_spark.sources import load_tables
    for df in load_tables(spark, sf_dir).values():
        df.limit(1).count()
    from janusgraph_clickhouse_spark.graph.persistence import (
        ensure_clustered_graph)
    t0 = time.perf_counter()
    ensure_clustered_graph(spark, sf_dir)
    warm_graph = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    queries["g22_biased_walks"](spark, sf_dir).count()
    queries["g05_bfs_distances"](spark, sf_dir).count()
    warm_q = round(time.perf_counter() - t0, 2)

    spin_pre = _spin()
    result: dict = {
        "sf": 0.1, "oracle_sf": 0.01,
        "calibration_spin_sec": spin_pre,
        "saturation_pre": _saturation_probe(),
        "warmup_query": "g22_biased_walks + g05_bfs_distances",
        "warmup_sec_untimed": round(warm_graph + warm_q, 2),
    }
    def _load_1m() -> float | None:
        # per-slot external-load sample: the r11 tenant arrived
        # MID-pass twice and the pre/end probes missed it (g18 read
        # 67.9 s in a slot the bracketing probes called quiet) —
        # a per-query loadavg makes contamination attributable to
        # the slot, not the pass
        try:
            return float(open("/proc/loadavg").read().split()[0])
        except OSError:
            return None

    per_q: dict[str, dict] = {}
    total = 0.0
    for i, (name, fn) in enumerate(queries.items()):
        t0 = time.perf_counter()
        try:
            rows = fn(spark, sf_dir).count()
            err = None
        except Exception as e:  # record, keep sweeping
            rows, err = -1, f"{type(e).__name__}: {e}"[:200]
        dt = round(time.perf_counter() - t0, 3)
        per_q[name] = {"sec": dt, "rows": rows}
        load = _load_1m()
        if load is not None:
            per_q[name]["load_1m"] = load
        if err:
            per_q[name]["err"] = err
        total += dt
        print(f"[{i + 1}/{len(queries)}] {name}: {dt}s ({rows} rows)",
              file=sys.stderr, flush=True)
    result["total_sec"] = round(total, 1)
    result["queries"] = per_q

    # oracle pass: every registered oracle against DuckDB at the gate
    # scale, single-threaded, one connection (the gate's own shape)
    from tests.oracle_harness import duckdb_connection
    con = duckdb_connection(oracle_sf_dir)
    o_total = 0.0
    try:
        for name, sql in oracles.items():
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
                err = None
            except Exception as e:
                err = f"{type(e).__name__}: {e}"[:200]
            dt = round(time.perf_counter() - t0, 3)
            per_q.setdefault(name, {})["oracle_sec"] = dt
            if err:
                per_q[name]["oracle_err"] = err
            o_total += dt
    finally:
        con.close()
    result["oracle_total_sec"] = round(o_total, 1)
    result["calibration_spin_sec_end"] = _spin()
    result["saturation_end"] = _saturation_probe()

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    slow = sorted(((v.get("oracle_sec", 0.0), k) for k, v in per_q.items()),
                  reverse=True)[:5]
    print(f"wrote {out_path}: {len(per_q)} queries, spark total "
          f"{result['total_sec']}s, oracle total {result['oracle_total_sec']}s; "
          f"slowest oracles: {slow}")


if __name__ == "__main__":
    main()
