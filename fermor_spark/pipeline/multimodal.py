"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side machinery (schemas, batching, partition sizing, UDF
signatures) is real and tested; the actual codec work is STUBBED because
image/audio libraries are not available in this environment:

* ``decode_image`` — raises NotImplementedError unless ``fake=True``, in
  which case it produces a deterministic fake decode (dimensions derived
  from the byte content) so downstream plumbing can be exercised.

Design for 100 TB: binary payloads ride in their own column so column
pruning skips them unless projected; ``repartition_for_payload`` right-sizes
partitions by payload bytes (not row count) so Arrow batches stay within
executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

DECODED_IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def media_table(spark, rows) -> DataFrame:
    """Build a media DataFrame from (media_id, kind, content_bytes, meta)."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def repartition_for_payload(df: DataFrame, target_bytes: int = 128 * 1024 * 1024,
                            size_col: str | None = None) -> DataFrame:
    """Repartition so each partition carries ~target_bytes of payload.

    At scale the row count is a terrible proxy for partition weight when a
    row is a 10 MB image; size by bytes instead."""
    sizer = F.length(F.col(size_col or "content"))
    total = df.select(F.sum(sizer).alias("b")).collect()[0]["b"] or 0
    parts = max(1, int(total // target_bytes) + 1)
    return df.repartition(parts)


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image binaries → (media_id, width, height, channels, n_bytes).

    Real decode requires an image codec library (PIL/opencv) — STUBBED here:
    pass fake=True for a deterministic fake decode (dims derived from the
    first bytes) that exercises the full mapInPandas pipeline.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires PIL/opencv, unavailable in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "width": [((c[0] if len(c) else 0) % 64) + 1 for c in pdf["content"]],
                "height": [((c[1] if len(c) > 1 else 0) % 64) + 1 for c in pdf["content"]],
                "channels": [3] * len(pdf),
                "n_bytes": [len(c) for c in pdf["content"]],
            })
            yield out

    return df.mapInPandas(run, DECODED_IMAGE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2, max_frames: int = 4,
                 fake: bool = False) -> DataFrame:
    """Sample video frames → one row per (media_id, frame_index).

    STUBBED codec: with fake=True, 'frames' are deterministic byte slices of
    the content — the row-explosion shape (1 row in, k rows out via
    mapInPandas) is the part that matters for the pipeline."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decoding requires ffmpeg bindings, unavailable here; "
                    "pass fake=True for the deterministic stub"
                )
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = min(max_frames, max(1, len(content) // every_n))
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(content[i * every_n:(i + 1) * every_n]))
            yield pd.DataFrame({"media_id": ids, "frame_index": idxs, "frame": frames})

    return df.mapInPandas(run, FRAME_SCHEMA)


def extract_meta_features(df: DataFrame) -> DataFrame:
    """Pure-column feature extraction from the metadata map — no UDF."""
    return df.select(
        "media_id", "kind",
        F.length("content").cast("long").alias("n_bytes"),
        F.col("meta").getItem("source").alias("source"),
        F.col("meta").getItem("mime").alias("mime"),
    )
