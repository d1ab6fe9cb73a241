"""Cross-engine-deterministic sketches.

ClickHouse ships approximate aggregates as first-class surface
(uniq / uniqHLL12 / uniqCombined — the reference's backing store
idiom for "count distinct on 100 TB").  Spark's own
approx_count_distinct is a black-box HLL++ whose estimate differs
between engines and versions, so it can never be oracle-checked.
This module rebuilds the sketch from first principles on top of the
repo's engine-portable md5 hash: every register value, and therefore
the estimate itself, is BIT-IDENTICAL between Spark and any SQL engine
that can md5 — determinism as a design property, not a test accident
(the l42/l35 discipline applied to sketching).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import md5_long60

# Flajolet et al. 2007 bias constant for m = 256 registers
HLL_M = 256
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# estimate = alpha * m^2 / Z  where Z = Σ 2^-M_j; registers are scaled
# by 2^53 so Z's sum is an EXACT int64 (every term 2^(53-M_j) is an
# integer; 256 terms ≤ 2^61) — no float summation order anywhere.
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(1 << 53)


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """HyperLogLog distinct-count estimate (Flajolet, Fusy, Gandouet &
    Meunier 2007) with m=256 registers over the 60-bit md5 hash: bucket
    = low 8 bits, rank = leading-zero count of the remaining 52 bits
    + 1 (computed EXACTLY via the binary-string length — no float log2
    whose last-ulp misrounding could flip a register).  Returns one row
    (n_exact, hll_estimate, rel_error); n_exact is the true distinct
    count for the error column — on a real 100 TB corpus you'd emit
    only the estimate, which is the point of the sketch.

    Raw Flajolet estimator only (no small/large-range correction
    branches): deterministic, documented, and at m=256 the ±1.0σ error
    is ~6.5% — the rel_error column shows the actual figure.

    Scale shape: one scan + one 256-group aggregate + a 256-row final
    fold; the shuffle carries at most m register rows per partition
    (map-side partial max).  The exact count's count(DISTINCT) is the
    expensive half — the sketch side is free."""
    h = md5_long60(F.col(col).cast("string"))
    rest = F.shiftright(h, 8)
    rank = F.when(rest > 0,
                  F.lit(53) - F.length(F.bin(rest))).otherwise(F.lit(53))
    reg = (df.select((h % HLL_M).alias("bucket"), rank.alias("rank"))
           .groupBy("bucket").agg(F.max("rank").alias("m")))
    z = reg.agg(
        (F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("m")).cast("long"))
         + (F.lit(HLL_M) - F.count(F.lit(1))) * F.lit(1 << 53))
        .alias("z"),
    )
    exact = df.agg(F.countDistinct(F.col(col)).alias("n_exact"))
    est = F.lit(HLL_NUMER) / F.col("z")
    return (exact.crossJoin(F.broadcast(z))
            .select("n_exact",
                    F.round(est, 4).alias("hll_estimate"),
                    F.round((est - F.col("n_exact")) / F.col("n_exact"), 6)
                    .alias("rel_error")))


# Count-Min dimensions: d salted hash rows × w counters.  Error bound:
# overestimate ≤ N·e/w with probability 1 - e^-d (Cormode & Muthukrishnan
# 2005); counters and estimates are exact integers, so parity is exact.
CMS_D = 4
CMS_W = 256


def _cms_bucket(row: Column, key: Column) -> Column:
    """Row-salted bucket: md5('cms<r>|<key>') mod w — engine-portable
    like every hash DECISION in this repo."""
    return md5_long60(F.concat(F.lit("cms"), row.cast("string"),
                              F.lit("|"), key)) % CMS_W


def cms_heavy_hitters(df: DataFrame, col: str, k: int = 20) -> DataFrame:
    """Heavy hitters via a Count-Min sketch (Cormode & Muthukrishnan
    2005 — ClickHouse's topK/approx frequency idiom): d=4 salted hash
    rows × w=256 counters built in ONE aggregate pass; each candidate
    key's estimate is the MIN of its d counters (never an
    underestimate); returns the top-`k` keys by estimate (desc, key
    asc) with the exact count and realized overcount beside it.

    Every counter and estimate is an exact integer from md5-derived
    buckets — bit-identical across engines (the q41 discipline; no
    float appears anywhere).  On a real corpus the candidate set would
    come from a sample or prior window rather than distinct(); here the
    fixture's key cardinality makes distinct() the honest baseline and
    the comparison column.

    Scale shape: the sketch build shuffles (row, bucket) pairs — at
    most d·w = 1024 groups regardless of corpus size, perfect map-side
    combine; the probe joins the candidate keys against a BROADCAST
    1024-row counter table."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r")
    key = F.col(col).cast("string")
    counters = (df.select(key.alias("k")).select("k", rows)
                .select("r", _cms_bucket(F.col("r"), F.col("k"))
                        .alias("bucket"))
                .groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("c")))
    exact = (df.groupBy(F.col(col).alias("key"))
             .agg(F.count(F.lit(1)).alias("exact_cnt")))
    probes = (exact.select("key", "exact_cnt", rows)
              .select("key", "exact_cnt", "r",
                      _cms_bucket(F.col("r"),
                                  F.col("key").cast("string"))
                      .alias("bucket")))
    est = (probes.join(F.broadcast(counters), ["r", "bucket"])
           .groupBy("key", "exact_cnt")
           .agg(F.min("c").alias("cms_estimate")))
    return (est.select("key", "cms_estimate", "exact_cnt",
                       (F.col("cms_estimate") - F.col("exact_cnt"))
                       .alias("overcount"))
            .orderBy(F.col("cms_estimate").desc(), "key").limit(k))
