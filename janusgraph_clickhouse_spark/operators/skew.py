"""Skew-mitigation operators (SURVEY §7 "hard parts": skewed adjacency /
super-nodes).

AQE's skew-join splitting handles join-side skew at runtime; these
helpers cover the cases AQE doesn't:

- `salted_aggregate`: two-phase aggregation for heavily skewed GROUP BY
  keys — phase 1 aggregates on (key, salt) so a hot key's rows spread
  over `n_salts` reducers, phase 2 combines the partials.  Correct for
  algebraic aggregates (sum/count/min/max and anything with a combine
  form).
- `salted_join`: explicit broadcast-salt join for a skewed build side
  when the small side fits in memory after replication — the manual form
  of AQE skew handling for non-AQE contexts (streaming joins, RDD-less
  custom sinks).

At 100 TB a super-node (celebrity vertex, null-ish default key) is the
single most common cause of a stuck stage; the fix is always the same:
make the hot key artificially many keys, pay a second small combine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, key_cols: Sequence[str],
                     aggs: dict[str, tuple[str, str]],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: output_name -> (input_col, fn) with fn in
    {"sum", "count", "min", "max"}.  Phase 1 groups by (keys, salt);
    phase 2 re-combines per key (counts combine via sum).
    """
    salted = df.withColumn(
        "__salt", (F.abs(F.xxhash64(*[F.col(c) for c in key_cols],
                                    F.spark_partition_id())) % n_salts))
    phase1_aggs = []
    for out, (col, fn) in aggs.items():
        expr = {"sum": F.sum, "count": F.count,
                "min": F.min, "max": F.max}[fn](col)
        phase1_aggs.append(expr.alias(f"__p_{out}"))
    p1 = salted.groupBy(*key_cols, "__salt").agg(*phase1_aggs)
    phase2_aggs = []
    for out, (col, fn) in aggs.items():
        combine = F.sum if fn in ("sum", "count") else \
            (F.min if fn == "min" else F.max)
        phase2_aggs.append(combine(f"__p_{out}").alias(out))
    return p1.groupBy(*key_cols).agg(*phase2_aggs)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 8) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key, replicate the small
    side across all salts, join on (key, salt).  The small side grows
    n_salts× but each hot key's rows now land on n_salts reducers."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    big_s = big.withColumn(
        "__salt", (F.abs(F.xxhash64(F.monotonically_increasing_id()))
                   % n_salts))
    small_s = small.withColumn("__salt", salts)
    out = big_s.join(small_s, [key, "__salt"])
    return out.drop("__salt")
