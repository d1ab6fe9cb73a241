"""Multimodal columns: opaque binary blobs + typed metadata.

Images/audio/video ride through the engine as `BinaryType` columns with a
typed metadata struct; decode / feature-extraction / resize / frame-sample
run as Arrow-batched `mapInPandas` stages so each Python batch sees a
columnar chunk, never a row at a time.  The actual codec calls are STUBBED
(decode libs aren't in this container — see `decode_image`): the Spark-side
plumbing — schema, batch shape, partition passthrough — is real and tested.

At 100 TB the governing constraint is partition sizing: blobs make rows
huge, so `spark.sql.files.maxPartitionBytes` and an explicit repartition
on the id (not the blob) keep batches memory-bounded; metadata-only
queries never touch the blob column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("blob", T.BinaryType()),
    T.StructField("mime", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
])


def attach_binary(df: DataFrame, id_col: str, text_col: str,
                  mime: str = "application/octet-stream") -> DataFrame:
    """Build a media table from a source column: blob + typed metadata.
    (With real media you'd `spark.read.format("binaryFile")` instead; this
    derives deterministic blobs from the fixtures.)"""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.select(F.col(id_col).alias("media_id"),
                     blob.alias("blob"),
                     F.lit(mime).alias("mime"),
                     F.octet_length(blob).cast("long").alias("n_bytes"))


def decode_image(blob: bytes):
    """STUB — image decoding requires codec libraries not present in this
    environment.  The pipeline plumbing around it is real; swap this for
    PIL/torchvision/ffmpeg in a full deployment."""
    raise NotImplementedError(
        "image/audio decode is stubbed in this environment")


FEATURE_SCHEMA = ("media_id long, n_bytes long, first_byte int, "
                  "byte_mean double, feature array<float>")


def extract_features(media: DataFrame, feature_dim: int = 4) -> DataFrame:
    """mapInPandas feature extraction over binary blobs.

    Real decode is stubbed; the extracted features are deterministic
    functions of the raw bytes (length, first byte, mean byte value, and a
    fixed-width moment vector) so the batch shape, schema, and
    partitioning behavior of a real extractor are exercised end-to-end.
    """
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0),
                "first_byte": blobs.map(
                    lambda b: int(b[0]) if b else -1),
                "byte_mean": blobs.map(
                    lambda b: (sum(b) / len(b)) if b else 0.0),
                "feature": blobs.map(lambda b: _moment_vector(b, feature_dim)),
            })
            yield out

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


def _moment_vector(b: bytes | None, dim: int) -> list[float]:
    """Deterministic fake 'embedding' of a blob: chunked byte means."""
    if not b:
        return [0.0] * dim
    chunk = max(1, len(b) // dim)
    return [float(sum(b[i * chunk:(i + 1) * chunk])
                  / max(1, len(b[i * chunk:(i + 1) * chunk])))
            for i in range(dim)]


def resize(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' shape over binary columns: emit a fixed-size downsampled
    blob per row (the 1:1 blob→smaller-blob batch shape of a real image
    resize; the resampling itself is a deterministic byte stride —
    the codec call it stands in for is `decode_image`, stubbed here)."""
    schema = "media_id long, blob binary, n_bytes long"

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "blob": [], "n_bytes": []}
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    small = b""
                else:
                    stride = max(1, len(blob) // target_bytes)
                    small = bytes(blob[::stride][:target_bytes])
                out["media_id"].append(mid)
                out["blob"].append(small)
                out["n_bytes"].append(len(small))
            yield pd.DataFrame(out)

    return media.mapInPandas(shrink, schema=schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' shape over binary columns: emit one row per sampled
    offset per blob (mapInPandas fan-out — the row-multiplying batch shape
    a real video frame sampler has).  Sampled byte stands in for a frame."""
    schema = "media_id long, frame_no int, offset long, value int"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "offset": [], "value": []}
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                if blob is None:
                    continue
                for fno, off in enumerate(range(0, len(blob), every_n_bytes)):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(fno)
                    rows["offset"].append(off)
                    rows["value"].append(int(blob[off]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(sample, schema=schema)
