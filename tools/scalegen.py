#!/usr/bin/env python
"""Weak-scaling fixture generator: replicate an sf dir k× into disjoint
key universes.

    python tools/scalegen.py 3 [--src /root/testdata/sf0.1] [--out DIR]

Copy i (i = 0..k-1) shifts every primary/foreign key by i*1e7 inside
its own key space, so the result is a VALID star schema containing k
disjoint sub-universes: every join/group-by keeps its per-copy
selectivity and the derived graph becomes k disconnected copies —
the clean weak-scaling instrument (ideal cost = k× a linear plan).
The 1e7 stride stays far under the graph layer's 1e9 label offsets
(graph/model.py::ID_OFFSETS), so vertex ids never collide across
label spaces at any k this box can hold.

Two content tweaks keep RESULT sizes linear in k (without them the
answer itself goes quadratic, which would poison a throughput read):

- documents.text: every token in copy i>0 gets an `_i` suffix, so
  cross-copy docs share no shingles and dedup/LSH/containment answers
  scale k× instead of k²× (pairs within a copy replicate exactly).
  n_chars is recomputed to stay consistent with the salted text.
- embeddings.embedding: copy i>0 adds a tiny per-copy, per-dimension
  deterministic perturbation so cross-copy vectors aren't bit-equal
  ties in top-k reranks.
- events.ts: copy i is shifted i×(span+1day) later, so weak scaling
  EXTENDS TIME instead of densifying windows.  Without the shift the
  copies share timestamps, every 10-minute activity window holds k×
  the users, and window co-occurrence graphs densify ~k²× in edges —
  measured r11: g15_kcore read 42.6× at k=10 and the g17/g24
  interaction graphs became near-complete 15k-vertex monsters.  That
  densified variant is a legitimate hot-window stress, but it is NOT
  weak scaling; generate it deliberately if wanted (drop the shift).

Everything else (timestamps, props, names, measures) is copied
verbatim.  Output: <out>/x{k}/<table>.parquet (directory parquet).
Scratch tool for PERF scale studies — not part of the engine.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# every column that lives in a key space, per table
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 10_000_000


def _copy(df: DataFrame, table: str, i: int,
          ts_shift_s: int = 0) -> DataFrame:
    if i == 0:
        return df
    dtypes = dict(df.dtypes)
    cols = []
    for c in df.columns:
        if c in KEYS[table]:
            cols.append((F.col(c).cast("long") + i * STRIDE)
                        .cast(dtypes[c]).alias(c))
        elif table == "events" and c == "ts":
            cols.append((F.col("ts")
                         + F.expr(f"INTERVAL {i * ts_shift_s} SECONDS"))
                        .alias("ts"))
        elif table == "documents" and c == "text":
            cols.append(F.array_join(
                F.transform(F.split(F.col("text"), " "),
                            lambda x: F.concat(x, F.lit(f"_{i}"))),
                " ").alias("text"))
        elif table == "documents" and c == "n_chars":
            # recomputed AFTER salting below (needs the new text)
            cols.append(F.col(c))
        elif table == "embeddings" and c == "embedding":
            elem = dtypes[c].removeprefix("array<").removesuffix(">")
            cols.append(F.transform(
                F.col("embedding"),
                lambda x, j: (x + F.lit(i * 1e-5) * (j.cast("double") + 1.0)
                              ).cast(elem)).alias(c))
        else:
            cols.append(F.col(c))
    out = df.select(*cols)
    if table == "documents":
        out = out.withColumn("n_chars",
                             F.length("text").cast(dict(df.dtypes)["n_chars"]))
    return out


def generate(spark, src: str, out: str, k: int) -> str:
    dest = os.path.join(out, f"x{k}")
    marker = os.path.join(dest, "_BUILT")
    if os.path.exists(marker):
        print(f"exists: {dest}")
        return dest
    os.makedirs(dest, exist_ok=True)
    for table in TABLES:
        t0 = time.perf_counter()
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        ts_shift_s = 0
        if table == "events":
            b = df.agg(F.min("ts").alias("lo"),
                       F.max("ts").alias("hi")).first()
            span = int((b["hi"] - b["lo"]).total_seconds())
            # round UP to whole days so the shift is a multiple of every
            # sane tumbling-window width: copies then land in identical
            # relative window phases and stay ISOMORPHIC (a raw-seconds
            # shift phase-shifted the 10-min windows per copy — x10 SCC
            # emitted 14999 rows instead of 10x1500)
            ts_shift_s = (span // 86_400 + 2) * 86_400
        parts = [_copy(df, table, i, ts_shift_s) for i in range(k)]
        full = parts[0]
        for p in parts[1:]:
            full = full.unionAll(p)
        full.write.mode("overwrite").parquet(
            os.path.join(dest, f"{table}.parquet"))
        print(f"{table}: x{k} in {time.perf_counter()-t0:.1f}s", flush=True)
    open(marker, "w").close()
    return dest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("k", type=int)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/jcs_scale")
    args = ap.parse_args()

    from janusgraph_clickhouse_spark.session import get_spark, tune_session
    spark = get_spark("scalegen", cpus=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    dest = generate(spark, args.src, args.out, args.k)
    print(dest)


if __name__ == "__main__":
    main()
