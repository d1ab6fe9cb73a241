"""Incremental dedup against a persisted fingerprint index: verdicts,
append-only index discipline, and the streaming absorb path (per-batch
cost O(batch) — the corpus is never re-fingerprinted)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from janusgraph_clickhouse_spark.llm import incremental as I

A_DOCS = [(1, "a b c d e f g h"), (2, "x y z w q r s t")]
B_DOCS = [(11, "a b c d e f g h"),          # exact dup of doc 1
          (12, "m n o p mm nn oo pp")]      # novel
C_DOCS = [(21, "m n o p mm nn oo pp")]      # dup of doc 12 (batch B!)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _index_files(path):
    out = {}
    for t in I.INDEX_TABLES:
        d = os.path.join(path, t)
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                p = os.path.join(d, f)
                out[p] = os.stat(p).st_mtime_ns
    return out


def test_incremental_pairs_old_side_only(spark):
    """Verdicts compare new×old ONLY — identical docs inside the batch
    produce no pair, and corpus-internal dups are ignored."""
    old = _df(spark, A_DOCS + [(3, "a b c d e f g h")])  # 1,3 corpus dups
    new = _df(spark, [(11, "a b c d e f g h"),
                      (13, "a b c d e f g h")])          # batch dups too
    idx = I.fingerprint_tables(old, "doc_id", "text")
    got = {(r.doc_id, r.dup_of, r.jaccard)
           for r in I.incremental_dedup_pairs(
               new, "doc_id", "text", idx, threshold=0.4).collect()}
    # each new doc matches BOTH old copies; no (11,13) or (1,3) rows
    assert got == {(11, 1, 1.0), (11, 3, 1.0), (13, 1, 1.0), (13, 3, 1.0)}


def test_absorb_batches_append_only(spark, tmp_path):
    """Absorbing batches must (a) dedup against everything absorbed so
    far — including earlier batches' novel docs, (b) only APPEND to the
    index: no existing part file is rewritten or touched."""
    path = str(tmp_path / "fpindex")
    I.bootstrap_index(_df(spark, A_DOCS), "doc_id", "text", path)
    before_b = _index_files(path)

    vb = {(r.doc_id, r.dup_of) for r in I.absorb_batch(
        _df(spark, B_DOCS), "doc_id", "text", path).collect()}
    assert vb == {(11, 1)}
    after_b = _index_files(path)
    assert set(before_b) <= set(after_b)          # nothing deleted
    assert all(after_b[f] == m for f, m in before_b.items())  # untouched
    assert len(after_b) > len(before_b)           # novel doc 12 absorbed

    # C's doc 21 dups B's novel doc 12 — only catchable if the absorb
    # actually extended the index
    vc = {(r.doc_id, r.dup_of) for r in I.absorb_batch(
        _df(spark, C_DOCS), "doc_id", "text", path).collect()}
    assert vc == {(21, 12)}
    after_c = _index_files(path)
    assert all(after_c[f] == m for f, m in after_b.items())
    # doc 21 was a dup → NOT absorbed: a later identical doc still
    # resolves to the canonical 12
    vd = {(r.doc_id, r.dup_of) for r in I.absorb_batch(
        _df(spark, [(31, "m n o p mm nn oo pp")]), "doc_id", "text",
        path).collect()}
    assert vd == {(31, 12)}


def test_incremental_stream_matches_sequential_absorb(spark, tmp_path):
    """The foreachBatch streaming form must produce exactly the
    sequential absorb verdicts — one O(batch) step per micro-batch."""
    src = tmp_path / "src"
    src.mkdir()
    _df(spark, B_DOCS).coalesce(1).write.parquet(str(src / "b0"))
    time.sleep(1.1)  # file-source orders micro-batches by mtime
    _df(spark, C_DOCS).coalesce(1).write.parquet(str(src / "b1"))

    path = str(tmp_path / "fpindex")
    I.bootstrap_index(_df(spark, A_DOCS), "doc_id", "text", path)
    baseline = _index_files(path)

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    verdicts_path = str(tmp_path / "verdicts")
    q = (I.incremental_dedup_stream(
            stream, "doc_id", "text", path, verdicts_path,
            checkpoint_dir=str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.read.parquet(verdicts_path)
    rows = {(r.doc_id, r.dup_of, r.jaccard) for r in got.collect()}
    assert rows == {(11, 1, 1.0), (21, 12, 1.0)}
    # two distinct micro-batches actually ran
    assert got.select("batch_id").distinct().count() == 2
    final = _index_files(path)
    assert all(final[f] == m for f, m in baseline.items())
    # index absorbed exactly the novel doc 12 (21 was a dup)
    ids = {r.id for r in
           I.read_index(spark, path)["sizes"].select("id").collect()}
    assert ids == {1, 2, 12}
