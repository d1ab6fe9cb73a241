"""Exact segment-membership set algebra — the ClickHouse bitmap idiom.

ClickHouse models audience/behavior segments as roaring bitmaps
(``groupBitmapState`` per segment, ``bitmapAndCardinality`` /
``bitmapOrCardinality`` between them).  Spark has no bitmap type, and
does not need one to express the same analytics declaratively: a
segment is just the DISTINCT member set of a grouping key, and every
pairwise bitmap cardinality is one member-keyed equi-join away.  The
result is exact (not a sketch — the approximate counterpart is
``functions.sketches.hll_*``).

Scale shape (100 TB): the distinct pass shuffles (segment, member)
pairs once; the pair join shuffles on the MEMBER id, where each member
carries at most |segments| rows per side, so the join fan-out per key
is bounded by the segment count squared — never by corpus size.  The
segment-level matrices (sizes, intersections) are |segments|² rows:
driver-trivial, broadcast-joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment_members(df: DataFrame, member_col: str, segment_col: str,
                    min_rows: int = 1) -> DataFrame:
    """Distinct (seg, mid) membership pairs; a member belongs to a
    segment iff it has at least ``min_rows`` underlying rows there
    (min_rows=1 is plain DISTINCT; higher thresholds express
    "active-in-segment" membership).  One hash aggregate either way."""
    # NULL members/segments are dropped BEFORE anything counts them:
    # a NULL member would inflate n_a/n_b (distinct keeps the NULL row)
    # while the intersection equi-join can never match it — the matrix
    # would violate n_union = n_a + n_b − n_inter.  count(DISTINCT)
    # semantics (NULL is not a member) keep the algebra exact.
    pairs = (df.filter(F.col(segment_col).isNotNull()
                       & F.col(member_col).isNotNull())
             .select(F.col(segment_col).alias("seg"),
                     F.col(member_col).alias("mid")))
    if min_rows <= 1:
        return pairs.distinct()
    return (pairs.groupBy("seg", "mid")
            .agg(F.count(F.lit(1)).alias("_c"))
            .filter(F.col("_c") >= min_rows)
            .select("seg", "mid"))


def segment_overlap_matrix(df: DataFrame, member_col: str,
                           segment_col: str, min_rows: int = 1,
                           round_dp: int = 6) -> DataFrame:
    """Pairwise segment overlap: for every unordered segment pair
    (seg_a < seg_b) the exact intersection / union cardinalities and
    Jaccard — bitmapAndCardinality / bitmapOrCardinality /
    bitmapJaccardIndex without the bitmaps.

    Returns (seg_a, seg_b, n_a, n_b, n_inter, n_union, jaccard); pairs
    with an empty intersection are kept (n_inter=0) so the matrix is
    complete.  jaccard is rounded at the edge from two exact integers.
    """
    # three consumers (sizes + both join sides) read the membership set:
    # materialize it once or the full fact scan + distinct re-runs per
    # consumer (the re-derived-lineage pathology; source_overlap_matrix
    # checkpoints for the same reason)
    m = segment_members(df, member_col, segment_col,
                        min_rows=min_rows).localCheckpoint(eager=True)
    sizes = m.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    a = m.select(F.col("seg").alias("seg_a"), "mid")
    b = m.select(F.col("seg").alias("seg_b"), "mid")
    inter = (a.join(b, "mid")
             .filter(F.col("seg_a") < F.col("seg_b"))
             .groupBy("seg_a", "seg_b")
             .agg(F.count(F.lit(1)).alias("n_inter")))
    sa = sizes.select(F.col("seg").alias("seg_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("seg").alias("seg_b"), F.col("n").alias("n_b"))
    # |segments| rows per side: the pair frame is broadcast algebra.
    pairs = (sa.crossJoin(F.broadcast(sb))
             .filter(F.col("seg_a") < F.col("seg_b"))
             .join(F.broadcast(inter), ["seg_a", "seg_b"], "left"))
    ni = F.coalesce(F.col("n_inter"), F.lit(0).cast("long"))
    nu = F.col("n_a") + F.col("n_b") - ni
    return pairs.select(
        "seg_a", "seg_b", "n_a", "n_b", ni.alias("n_inter"),
        nu.alias("n_union"),
        F.round(ni.cast("double") / nu, round_dp).alias("jaccard"))
