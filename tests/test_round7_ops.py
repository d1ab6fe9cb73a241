"""Closed-form unit tests for the round-7 operators: map aggregates,
mergeable histogram quantiles, sequenceMatch, paragraph dedup, exact
stratified split, ANN recall eval."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_sum_max_map_closed_form(spark):
    from janusgraph_clickhouse_spark.functions.maps import (map_as_string,
                                                            max_map,
                                                            sum_map)
    rows = [("a", "x", 1), ("a", "x", 2), ("a", "y", 5),
            ("b", "y", 7), ("b", "z", 1)]
    df = spark.createDataFrame(rows, "g string, k string, v long")
    s = {r.g: r.s for r in
         sum_map(df, ["g"], "k", "v")
         .select("g", map_as_string("sum_map").alias("s")).collect()}
    assert s == {"a": "x:3,y:5", "b": "y:7,z:1"}
    m = {r.g: r.s for r in
         max_map(df, ["g"], "k", "v")
         .select("g", map_as_string("max_map").alias("s")).collect()}
    assert m == {"a": "x:2,y:5", "b": "y:7,z:1"}


def test_histogram_quantile_exact_interpolation(spark):
    """10 values 5..95 step 10 in [0,100), width 10 → each bin holds
    one value; p50 rank ceil(10*50/100)=5 lands in bin 4 and the
    midpoint interpolation gives exactly bin_lo + width/2 = 45."""
    from janusgraph_clickhouse_spark.functions.sketches import (
        histogram_quantiles, histogram_state)
    df = spark.createDataFrame([(i * 10 + 5,) for i in range(10)],
                               "c long").withColumn("g", F.lit("only"))
    st = histogram_state(df, "c", ["g"], lo=0, width=10, n_bins=10)
    q = {r.pct: r.est_micro for r in
         histogram_quantiles(st, ["g"], lo=0, width=10,
                             percents=[50, 90]).collect()}
    assert q[50] == 45_000_000   # 45.0 in micro-units
    assert q[90] == 85_000_000


def test_histogram_state_merge_equals_direct(spark):
    """Merging per-group states by bin-count SUM gives the identical
    quantiles a direct global state would (q48's claim)."""
    from janusgraph_clickhouse_spark.functions.sketches import (
        histogram_quantiles, histogram_state)
    df = (spark.range(1000)
          .select((F.col("id") % 7).cast("string").alias("g"),
                  (F.col("id") * 13 % 640).alias("c")))
    fine = histogram_state(df, "c", ["g"], lo=0, width=10, n_bins=64)
    merged = (fine.groupBy("bin").agg(F.sum("cnt").alias("cnt"))
              .withColumn("g", F.lit("ALL")).select("g", "bin", "cnt"))
    direct = histogram_state(df.withColumn("g", F.lit("ALL")),
                             "c", ["g"], lo=0, width=10, n_bins=64)
    qa = {r.pct: r.est_micro for r in histogram_quantiles(
        merged, ["g"], lo=0, width=10, percents=[50, 90, 99]).collect()}
    qb = {r.pct: r.est_micro for r in histogram_quantiles(
        direct, ["g"], lo=0, width=10, percents=[50, 90, 99]).collect()}
    assert qa == qb


def test_sequence_match_closed_form(spark):
    from janusgraph_clickhouse_spark.operators.temporal import (
        sequence_match)
    rows = [
        (1, 10, 1, "view"), (1, 20, 2, "click"), (1, 30, 3, "purchase"),
        (2, 10, 4, "click"), (2, 20, 5, "view"),      # wrong order
        (3, 10, 6, "purchase"), (3, 20, 7, "error"),  # error after buy
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string")
    out = {r.user_id: r for r in sequence_match(
        df, "user_id", "ts", "event_id", "event_type",
        letters={"view": "v", "click": "c", "purchase": "p",
                 "error": "e"},
        patterns={"m_funnel": "v.*c.*p",
                  "m_err": "p.*e"}).collect()}
    assert out[1].m_funnel and not out[1].m_err
    assert not out[2].m_funnel          # order matters: cv, not vc
    assert out[3].m_err and not out[3].m_funnel
    assert out[1].seq_len == 3


def test_paragraph_dedup_keep_first_and_reassembly(spark):
    from janusgraph_clickhouse_spark.llm.dedup import paragraph_dedup
    rows = [
        (1, 0, "alpha beta"), (1, 1, "gamma"),
        (2, 0, "alpha beta"),              # cross-doc dup -> dropped
        (2, 1, "delta"),
        (3, 0, "gamma"), (3, 1, "gamma"),  # in-doc + cross-doc dups
    ]
    df = spark.createDataFrame(rows, "doc_id long, idx long, para string")
    out = {r.doc_id: r for r in
           paragraph_dedup(df, "doc_id", "idx", "para").collect()}
    assert (out[1].n_paras, out[1].n_kept) == (2, 2)
    assert (out[2].n_paras, out[2].n_kept) == (2, 1)
    assert (out[3].n_paras, out[3].n_kept) == (2, 0)  # all were dups
    import hashlib
    assert out[2].new_text_hash == hashlib.md5(b"delta").hexdigest()
    assert out[3].new_text_hash == hashlib.md5(b"").hexdigest()


def test_exact_stratified_split_largest_remainder(spark):
    """n=7 at 80/10/10: bases (5,0,0), leftover 2, remainders
    (60,70,70) → val and test each get one seat → (5,1,1) EXACTLY —
    a hash split could never guarantee this on 7 rows."""
    from janusgraph_clickhouse_spark.llm.split import (
        exact_stratified_split)
    df = spark.createDataFrame([(i, "s") for i in range(7)],
                               "id long, src string")
    out = exact_stratified_split(df, "id", "src")
    counts = {r.split: r.c for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("c"))
              .collect()}
    assert counts == {"train": 5, "val": 1, "test": 1}
    # determinism: the same rows land in the same splits on re-run
    a = sorted((r.id, r.split) for r in out.collect())
    b = sorted((r.id, r.split) for r in
               exact_stratified_split(df, "id", "src").collect())
    assert a == b


def test_ann_recall_eval_bounds_and_perfect_case(spark):
    """Identical-direction corpus: every point shares every bucket, so
    the shortlist is the whole corpus and recall is exactly 1.0."""
    from janusgraph_clickhouse_spark.llm.similarity import (
        ann_recall_eval)
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ann_recall_eval(df, "vec_id", "embedding", query_mod=10,
                          k=5, dim=4).collect()
    assert len(out) == 3           # ids 0, 10, 20
    for r in out:
        assert r.n_exact == 5
        assert r.n_shortlist == 29
        assert r.n_hit == 5 and r.recall == 1.0


def test_weighted_quantiles_closed_form(spark):
    """Values 10,20,30 with weights 1,8,1 (W=10): p50 rank ceil(5)=5
    lands in 20's span [2,9]; p90 rank 9 also 20; p99 rank 10 -> 30."""
    from janusgraph_clickhouse_spark.functions.sketches import (
        weighted_quantiles)
    df = spark.createDataFrame(
        [("g", 10, 1), ("g", 20, 8), ("g", 30, 1)],
        "g string, c long, w long")
    q = {r.pct: r.q_value for r in
         weighted_quantiles(df, "c", "w", ["g"], [50, 90, 99])
         .collect()}
    assert q == {50: 20, 90: 20, 99: 30}


def test_source_overlap_matrix_closed_form(spark):
    """Two sources sharing half their shingles: exact Jaccard is
    computed from shingle sets; identical sources estimate 1.0."""
    from janusgraph_clickhouse_spark.llm.dedup import (
        source_overlap_matrix)
    rows = [
        (1, "a b c d e", "s1"),
        (2, "a b c d e", "s2"),      # identical to s1's doc
        (3, "x y z w q", "s3"),      # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string")
    out = {(r.source_a, r.source_b): r for r in
           source_overlap_matrix(df, "source", "text").collect()}
    assert out[("s1", "s2")].exact_jaccard == 1.0
    assert out[("s1", "s2")].est_jaccard == 1.0
    assert out[("s1", "s3")].exact_jaccard == 0.0
    assert out[("s1", "s3")].n_common == 0


def test_sequence_count_non_overlapping(spark):
    from janusgraph_clickhouse_spark.operators.temporal import (
        sequence_count)
    rows = [(1, t, t, e) for t, e in enumerate(
        ["view", "click", "purchase", "view", "purchase", "error",
         "error"])]
    df = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string")
    r = sequence_count(
        df, "user_id", "ts", "event_id", "event_type",
        letters={"view": "v", "click": "c", "purchase": "p",
                 "error": "e"},
        patterns={"n_cp": "cp", "n_j": "v[vc]*p",
                  "n_e": "e"}).collect()[0]
    # seq = vcpvpee
    assert r.n_cp == 1
    assert r.n_j == 2       # vcp and vp, non-overlapping
    assert r.n_e == 2


def test_wav_encode_decode_round_trip():
    """decode_audio(encode_wav_pcm16(x)) == x exactly — mono and
    stereo; plus a FOREIGN WAV carrying an odd-sized extra chunk, which
    exercises the decoder's `sz & 1` pad-skip (the encoder itself never
    emits one: PCM-16 data is always even)."""
    import struct
    import numpy as np
    from janusgraph_clickhouse_spark.llm.multimodal import (
        decode_audio, encode_wav_pcm16)
    mono = np.array([[0], [1], [-1], [32767], [-32768]], np.int16)
    s, rate = decode_audio(encode_wav_pcm16(mono, 8000))
    assert rate == 8000 and (s == mono).all()
    stereo = np.array([[1, -2], [3, -4], [5, -6]], np.int16)
    s2, _ = decode_audio(encode_wav_pcm16(stereo, 44100))
    assert s2.shape == (3, 2) and (s2 == stereo).all()
    # foreign odd-chunk WAV: splice a 3-byte LIST chunk (padded to 4)
    # between fmt and data; the decoder must skip the pad byte
    blob = encode_wav_pcm16(mono, 16000)
    fmt_end = blob.index(b"data")
    odd_chunk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    spliced = blob[:fmt_end] + odd_chunk + blob[fmt_end:]
    spliced = (spliced[:4] + struct.pack("<I", len(spliced) - 8)
               + spliced[8:])
    s3, r3 = decode_audio(spliced)
    assert r3 == 16000 and (s3 == mono).all()


def test_synth_wav_corpus_decodes_to_formula(spark):
    import math
    from janusgraph_clickhouse_spark.llm.multimodal import (
        decode_audio_stats, synth_wav_corpus)
    df = spark.createDataFrame([(5,), (40,)], "doc_id long")
    media = synth_wav_corpus(df, "doc_id")
    out = {r.media_id: r for r in decode_audio_stats(media).collect()}
    for mid in (5, 40):
        ns = 64 + mid % 32
        vals = [((mid * 31 + j * 17) % 4096) - 2048 for j in range(ns)]
        rms = round(math.sqrt(sum(v * v for v in vals) / ns), 6)
        r = out[mid]
        assert r.ok and r.n_samples == ns and r.channels == 1
        assert r.sample_rate == 8000
        assert abs(r.rms - rms) < 1e-9


def test_range_frame_vs_rows_semantics(spark):
    """RANGE frames include ALL rows within the value distance — ties
    on the order key share a frame, and gaps larger than the bound
    exclude rows regardless of adjacency (the semantics ROWS frames
    cannot express)."""
    from pyspark.sql import Window
    rows = [(1, 0, 10), (1, 1800, 20), (1, 1800, 30), (1, 7200, 40)]
    df = spark.createDataFrame(rows, "k long, ts long, v long")
    w = Window.partitionBy("k").orderBy("ts").rangeBetween(-3600, 0)
    out = {(r.ts, r.v): r.s for r in
           df.select("ts", "v", F.sum("v").over(w).alias("s"))
           .collect()}
    assert out[(0, 10)] == 10
    # the two ts=1800 rows share one frame: 10+20+30
    assert out[(1800, 20)] == 60 and out[(1800, 30)] == 60
    # ts=7200 is >3600 past everything: alone in its frame
    assert out[(7200, 40)] == 40


def test_snapshot_diff_closed_form(spark):
    from janusgraph_clickhouse_spark.llm.incremental import snapshot_diff
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string")
    got = {r.id: r.status for r in
           snapshot_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "added"}


def test_side_effect_queries_rerun_identically(spark, sf_smoke):
    """Queries with real side effects inside the builder (temp-dir
    writes, availableNow streams, TTL partition drops, incremental
    index state) must return IDENTICAL results when invoked twice in
    one session — leaked state or reused temp paths would diverge on
    the second call (the verify-skill 'rerun twice' probe, pinned)."""
    from janusgraph_clickhouse_spark.plans.registry import QUERIES
    for name in ["q45_ttl_partition_prune", "s11_stateful_running_totals",
                 "s19_stream_enrich", "l30_incremental_dedup"]:
        fn = QUERIES[name]
        a = sorted(map(tuple, fn(spark, sf_smoke).collect()))
        b = sorted(map(tuple, fn(spark, sf_smoke).collect()))
        assert a == b, f"{name}: rerun diverged"


def test_missing_sf_dir_fails_loudly(spark):
    """A nonexistent fixture dir must raise the clean AnalysisException
    (PATH_NOT_FOUND), not a silent empty result."""
    import pytest
    from pyspark.errors import AnalysisException
    from janusgraph_clickhouse_spark.plans.registry import QUERIES
    with pytest.raises(AnalysisException):
        QUERIES["q01_slice_point"](spark, "/root/testdata/sf_nope").collect()


def test_l50_oracle_planes_match_auto_resolution(spark):
    """TRIPWIRE: l50/l51's static oracles embed 4 hyperplane tables; the
    builders rely on n_planes="auto" resolving to exactly 4 at fixture
    scale.  If a fixture regen pushes the embeddings corpus past the
    flip (m > 2^4·256 = 4096), auto resolves to 5+ while the oracles
    keep 4 literals — a bulk parity red with nothing pointing at the
    cause.  This test names the cause preemptively for every fixture
    scale present."""
    import os
    from janusgraph_clickhouse_spark.llm.similarity import _auto_planes
    from janusgraph_clickhouse_spark.sources import load_table
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        d = f"/root/testdata/{sf}"
        if not os.path.isdir(d):
            continue
        emb = load_table(spark, d, "embeddings")
        p = _auto_planes(emb, "auto", 256)
        assert p == 4, (
            f"{sf}: auto n_planes resolved to {p}, but the l50/l51 "
            f"oracles embed 4 hyperplane tables — regenerate the "
            f"oracles (or pass explicit n_planes) before the parity "
            f"sweep goes red in bulk")


def test_snapshot_diff_null_text_uses_presence_markers(spark):
    """A document PRESENT with NULL text must not masquerade as
    added/removed (md5(NULL) is NULL — presence comes from join-side
    markers, the r7 review fix)."""
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "now-filled"), (2, None), (4, None)],
        "doc_id long, text string")
    from janusgraph_clickhouse_spark.llm.incremental import snapshot_diff
    got = {r.id: r.status for r in
           snapshot_diff(old, new, "doc_id", "text").collect()}
    assert got == {1: "changed",       # NULL -> text, not 'added'
                   2: "unchanged",     # NULL == NULL via eqNullSafe
                   3: "removed", 4: "added"}
