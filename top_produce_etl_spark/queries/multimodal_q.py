"""Multimodal + UDF-surface queries (SURVEY.md §2.10/§2.11).

The binary-payload feature extraction is rows-only (byte-level
checksums aren't expressible in DuckDB SQL), but its metadata-level
projections and the frame-sampling plan ARE oracle-checked — they
exercise the same multimodal table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.udfs import cosine_topk_numpy
from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.multimodal import (
    extract_features,
    plan_frame_samples,
    synthesize_media_from_documents,
)
from top_produce_etl_spark.queries import query


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))


@query(
    "multimodal_byte_stats", extended=True,
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           octet_length(CAST(text AS BLOB)) AS byte_len
    FROM documents
    """,
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection of the multimodal feature extraction —
    the oracle-checkable slice of the mapInPandas output."""
    feats = extract_features(_media(spark, sf_dir))
    return feats.select("media_id", "media_type", "byte_len")


@query("multimodal_fake_features")  # rows-only: byte-level kernel
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full mapInPandas feature extraction (deterministic fake
    kernel — the media-decode seam is documented in
    operators/multimodal.py). The float feature vector is projected
    through ``to_json`` so the driver's pandas canonicalizer gets a
    hashable scalar instead of a raw list (round-1 harness crash)."""
    feats = extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id",
        "media_type",
        "byte_len",
        "checksum",
        F.to_json("features").alias("features_json"),
    )


@query(
    "frame_sampling_plan", extended=True,
    oracle="""
    SELECT doc_id AS media_id, frame_ms
    FROM documents,
         unnest(generate_series(0, n_chars * 10, 1000)) t(frame_ms)
    WHERE doc_id % 3 = 2
    """,
)
def frame_sampling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only frame sampling: stride-1000ms indices over each
    video's duration — binary column pruned out of the scan."""
    return plan_frame_samples(_media(spark, sf_dir), every_ms=1000)


@query("cosine_topk_numpy", extended=True)  # float64 BLAS path → rows-only
def cosine_topk_numpy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow+numpy fast path for the brute-force cosine top-k (same
    query set as cosine_topk_bruteforce; float64 scores → not
    bit-comparable to the decimal oracle, parity covered in tests)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk_numpy(emb, queries, "vec_id", "embedding", k=3)
