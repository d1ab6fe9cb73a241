"""Interactive profiling bootstrap: `python -i tools/profile_session.py`.

Warm SparkSession on local[32], clustered cache ensured, `t(name)`
times a registered query warm (count-based, the pin convention).
Scratch tool — not part of the engine.
"""
import time
import sys
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from janusgraph_clickhouse_spark.session import get_spark, tune_session  # noqa: E402
from janusgraph_clickhouse_spark.plans import get_queries  # noqa: E402

spark = get_spark("profile", cpus=32)
tune_session(spark)
spark.sparkContext.setLogLevel("ERROR")
Q = get_queries()
SF = "/root/testdata/sf0.1"

_t0 = time.perf_counter()
from janusgraph_clickhouse_spark.graph.persistence import ensure_clustered_graph  # noqa: E402
ensure_clustered_graph(spark, SF)
print("BUILD", round(time.perf_counter() - _t0, 1), flush=True)


def t(name, n=1, sf=SF):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        c = Q[name](spark, sf).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(name, round(best, 2), "s rows", c, flush=True)
    return best


def spin():
    t0 = time.perf_counter()
    x = 0x9E3779B97F4A7C15
    for _ in range(20_000_000):
        x ^= x << 13 & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 7
        x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF
    return round(time.perf_counter() - t0, 3)
