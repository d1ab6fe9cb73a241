"""Incremental fuzzy dedup against a PERSISTED fingerprint index.

The operator a production ingest actually runs: a NEW batch of documents
is deduped against the existing corpus by joining the batch's MinHash
band buckets against an append-only fingerprint index — per-batch
shuffle volume is O(batch), never a whole-corpus signature recompute.
This is the same incremental-append discipline as the reference's
mutate path (ClickhouseKeyColumnValueStore.java:133-171: batched
delete-before-insert against the live table, never a table rewrite).

Index layout — three parquet tables under one root directory:

  buckets/   (id, band, bucket)   LSH candidate lookup
  shingles/  (id, shingle)        hashed shingle sets, exact rerank
  sizes/     (id, sz)             shingle-set sizes for Jaccard

All three are APPEND-ONLY: absorbing a batch appends the novel docs'
rows; existing part files are never rewritten (pytest-pinned by file
listing + mtime).  At corpus scale the buckets and shingles tables
should be written bucketed by their join key ((band, bucket) and
shingle respectively — `sources.layout.write_clustered_table`) so the
per-batch candidate join shuffles ONLY the batch side; the plain
parquet form here still only ever shuffles O(batch + matching buckets)
rows because the index side is filtered by the equi-join key, not
re-signatured.

Why exact rerank against index shingles rather than signature-estimated
Jaccard: the verdicts stay exactly reproducible (and DuckDB-oracle-able
— the oracle recomputes cross-side Jaccard from scratch), and the
rerank join touches only candidate docs' shingle rows.  The trade is
the shingle table's size (O(corpus tokens) × 8-byte hashes); an
estimate-only index would drop it at the cost of probabilistic
verdicts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import lsh_candidates, minhash_signatures, shingle_sets

INDEX_TABLES = ("buckets", "shingles", "sizes")


def fingerprint_tables(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, num_hashes: int = 48,
                       bands: int = 16) -> dict[str, DataFrame]:
    """One corpus (or batch) → its three fingerprint tables.

    One shingle pass feeds both the signature groupBy and the shingle
    table; sizes is one more aggregate on the same pass."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    buckets = sig.select(
        "id",
        F.posexplode(F.array(*[
            F.xxhash64(F.lit(b), *[
                F.element_at("sig", b * rows_per_band + r + 1)
                for r in range(rows_per_band)])
            for b in range(bands)
        ])).alias("band", "bucket"))
    sh = shingle_sets(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    return {"buckets": buckets, "shingles": sh, "sizes": sizes}


def incremental_dedup_pairs(new_df: DataFrame, id_col: str, text_col: str,
                            index: dict[str, DataFrame],
                            threshold: float = 0.4, n: int = 3,
                            num_hashes: int = 48,
                            bands: int = 16) -> DataFrame:
    """(doc_id, dup_of, jaccard): every NEW doc × EXISTING doc pair with
    exact shingle Jaccard ≥ threshold, candidates drawn from the LSH
    band join of batch buckets × index buckets.

    Cost shape: signatures/shingles are computed for the BATCH only; the
    index side contributes equi-join lookups (band, bucket) and the
    candidate docs' shingle rows — never a corpus re-signature.  Within
    the batch itself nothing is compared (old side only; batch-internal
    dups are the caller's composition with minhash_dedup_pairs)."""
    fp = fingerprint_tables(new_df, id_col, text_col, n, num_hashes, bands)
    cand = (fp["buckets"].select(F.col("id").alias("doc_id"),
                                 "band", "bucket")
            .join(index["buckets"].select(F.col("id").alias("dup_of"),
                                          "band", "bucket"),
                  ["band", "bucket"])
            .select("doc_id", "dup_of").distinct())
    old_sh = (index["shingles"]
              .join(cand.select(F.col("dup_of").alias("id")).distinct(),
                    "id", "left_semi")
              .select(F.col("id").alias("dup_of"),
                      F.col("shingle")))
    inter = (fp["shingles"].select(F.col("id").alias("doc_id"), "shingle")
             .join(old_sh, "shingle")
             .join(cand, ["doc_id", "dup_of"], "left_semi")
             .groupBy("doc_id", "dup_of")
             .agg(F.count(F.lit(1)).alias("m")))
    jac = (inter
           .join(fp["sizes"].select(F.col("id").alias("doc_id"),
                                    F.col("sz").alias("sz_a")), "doc_id")
           .join(index["sizes"].select(F.col("id").alias("dup_of"),
                                       F.col("sz").alias("sz_b")), "dup_of")
           .withColumn("jaccard_raw",
                       F.col("m").cast("double")
                       / (F.col("sz_a") + F.col("sz_b") - F.col("m")))
           .filter(F.col("jaccard_raw") >= threshold))
    return jac.select("doc_id", "dup_of",
                      F.round("jaccard_raw", 6).alias("jaccard"))


def read_index(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    return {t: spark.read.parquet(os.path.join(path, t))
            for t in INDEX_TABLES}


def write_index(tables: dict[str, DataFrame], path: str,
                mode: str = "append") -> None:
    """Append fingerprint rows (bootstrap with mode='overwrite').  Append
    mode only ever ADDS part files — the absorb path never rewrites
    existing index data."""
    for t in INDEX_TABLES:
        tables[t].write.mode(mode).parquet(os.path.join(path, t))


def bootstrap_index(df: DataFrame, id_col: str, text_col: str, path: str,
                    n: int = 3, num_hashes: int = 48,
                    bands: int = 16) -> None:
    write_index(fingerprint_tables(df, id_col, text_col, n, num_hashes,
                                   bands), path, mode="overwrite")


def absorb_batch(new_df: DataFrame, id_col: str, text_col: str,
                 index_path: str, threshold: float = 0.4, n: int = 3,
                 num_hashes: int = 48, bands: int = 16) -> DataFrame:
    """One ingest step: dedup `new_df` against the persisted index, then
    append the NOVEL docs' fingerprints (docs with no dup verdict) so
    later batches dedup against them too.  Returns the verdicts
    (doc_id, dup_of, jaccard), materialized BEFORE the index append so
    the lazy plan can never observe its own writes."""
    spark = new_df.sparkSession
    index = read_index(spark, index_path)
    verdicts = incremental_dedup_pairs(
        new_df, id_col, text_col, index, threshold, n, num_hashes,
        bands).localCheckpoint(eager=True)
    dup_ids = verdicts.select(F.col("doc_id").alias(id_col)).distinct()
    novel = new_df.join(dup_ids, id_col, "left_anti")
    write_index(fingerprint_tables(novel, id_col, text_col, n, num_hashes,
                                   bands), index_path, mode="append")
    return verdicts


def incremental_dedup_stream(stream_df: DataFrame, id_col: str,
                             text_col: str, index_path: str,
                             verdicts_path: str,
                             checkpoint_dir: str,
                             threshold: float = 0.4, n: int = 3,
                             num_hashes: int = 48, bands: int = 16):
    """Streaming ingest: per micro-batch, dedup against the index, emit
    dup verdicts to `verdicts_path`, absorb novel docs into the index.
    foreachBatch because the batch must both read AND append the index —
    the per-micro-batch work is O(batch) by the absorb_batch shape."""
    def _step(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = absorb_batch(batch_df, id_col, text_col, index_path,
                                threshold, n, num_hashes, bands)
        (verdicts.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(verdicts_path))

    return (stream_df.writeStream.foreachBatch(_step)
            .option("checkpointLocation", checkpoint_dir))
