"""Multimodal column plumbing (SURVEY.md §2.11; BASELINE.json north
star): image/audio/video as opaque ``binary`` columns with typed
metadata, processed via Arrow-batched ``mapInPandas``.

The decode/resize/frame-extract kernels need media libraries that
are NOT in this container — those steps are STUBBED behind
``NotImplementedError`` (real path) and a clearly-marked
deterministic fake (test path). Everything Spark-side — schemas,
partitioning, UDF signatures, batch iteration, frame-index
planning — is real and tested.

Scale notes: binary payloads make row sizes large and skewed; the
processing pattern is ``mapInPandas`` with bounded Arrow batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` sized so
batch_bytes ≈ records × max_payload fits the Python worker), and
metadata-only plans (like frame sampling) must NOT read the binary
column at all — column pruning keeps the payload out of the scan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal record: opaque payload + typed metadata.
MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("checksum", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic multimodal table from the documents
    fixture (no media libs needed): payload = utf-8 text bytes,
    metadata derived from n_chars. Gives the plumbing a real
    binary column of realistic shape."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("synthetic").alias("format"),
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``real_decode=True`` is the seam where PIL/ffmpeg/torchaudio
    would run — unavailable in this container, so it raises
    ``NotImplementedError`` *inside the workers' first batch*
    (the plan itself builds fine). The fake path computes
    deterministic features from raw bytes (length, additive
    checksum, 8 byte-histogram buckets normalized) — same schema,
    same batching, same partitioning as the real thing.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present "
                    "in this environment; run with real_decode=False for the "
                    "deterministic fake kernel"
                )
            out = []
            for mid, mtype, content in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                b = bytes(content)
                hist = [0] * 8
                for byte in b:
                    hist[byte >> 5] += 1
                n = max(len(b), 1)
                out.append(
                    (
                        int(mid),
                        str(mtype),
                        len(b),
                        sum(b) % (1 << 31),
                        [float(h) / n for h in hist],
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "media_type", "byte_len", "checksum", "features"],
            )

    return media.select("media_id", "media_type", "content").mapInPandas(
        fn, FEATURES_SCHEMA
    )


def plan_frame_samples(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling PLAN: (media_id, frame_ms) rows at a fixed
    stride over each video's duration — metadata-only (never touches
    the binary column, so the scan prunes it). The actual frame
    decode would consume this plan via :func:`extract_features`'s
    real path."""
    videos = media.filter(F.col("media_type") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"),
                F.col("meta.duration_ms"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_ms"),
    )
