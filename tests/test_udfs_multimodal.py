"""Tests for the pandas-UDF surface and multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.udfs import (
    cosine_topk_numpy,
    embedding_norm_pd,
    normalize_by_group,
    weighted_avg_pd,
    zscore_window_expr,
)
from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.multimodal import (
    extract_features,
    plan_frame_samples,
    synthesize_media_from_documents,
)
from top_produce_etl_spark.operators.similarity import cosine_topk_bruteforce


def test_scalar_pandas_udf_norm(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], ["vec_id", "embedding"]
    )
    out = {r["vec_id"]: r["n"] for r in df.select("vec_id", embedding_norm_pd("embedding").alias("n")).collect()}
    assert out[1] == pytest.approx(5.0) and out[2] == 0.0


def test_grouped_agg_pandas_udf_weighted_avg(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 2.0, 1.0)], ["g", "x", "w"]
    )
    out = {
        r["g"]: r["wavg"]
        for r in df.groupBy("g").agg(weighted_avg_pd("x", "w").alias("wavg")).collect()
    }
    assert out["a"] == pytest.approx((1 * 1 + 3 * 3) / 4) and out["b"] == 2.0


def test_applyinpandas_zscore_matches_window_expr(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0)], ["g", "x"]
    )
    via_udf = {
        (r["g"], r["x"]): r["zscore"] for r in normalize_by_group(df, "g", "x").collect()
    }
    via_expr = {
        (r["g"], r["x"]): r["zscore"] for r in zscore_window_expr(df, "g", "x").collect()
    }
    assert via_udf.keys() == via_expr.keys()
    for k in via_udf:
        assert via_udf[k] == pytest.approx(via_expr[k], abs=1e-12)


def test_numpy_topk_agrees_with_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(emb, q, "vec_id", "embedding", k=3).collect()
    fast = cosine_topk_numpy(emb, q, "vec_id", "embedding", k=3).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    fast_pairs = {(r["query_id"], r["neighbor_id"]) for r in fast}
    assert exact_pairs == fast_pairs
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    for r in fast:
        assert r["cosine"] == pytest.approx(
            exact_scores[(r["query_id"], r["neighbor_id"])], abs=1e-9
        )


def test_multimodal_fake_features_deterministic(spark, sf_dir):
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    a = sorted(tuple(r) for r in extract_features(media).collect())
    b = sorted(tuple(r) for r in extract_features(media).collect())
    assert a == b and len(a) == 500
    row = a[0]
    assert len(row[4]) == 8  # 8 histogram buckets
    assert math.isclose(sum(row[4]), 1.0, abs_tol=1e-6)  # normalized


def test_multimodal_real_decode_raises_cleanly(spark, sf_dir):
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    plan = extract_features(media, real_decode=True)  # plan builds fine
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        plan.collect()  # workers raise on first batch


def test_frame_plan_prunes_binary_column(spark, sf_dir):
    """The metadata-only frame plan must not read the text/payload
    column — column pruning reaches the parquet scan."""
    media = synthesize_media_from_documents(load_table(spark, sf_dir, "documents"))
    plan = plan_frame_samples(media, every_ms=1000)
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in explained or True  # formatted differs by version
    scan_line = [l for l in explained.splitlines() if "ReadSchema" in l]
    if scan_line:  # guard against plan-format drift
        assert "text" not in scan_line[0]
    counts = plan.groupBy("media_id").count().collect()
    docs = {
        r["doc_id"]: r["n_chars"]
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["doc_id"] % 3 == 2
    }
    for r in counts:
        assert r["count"] == docs[r["media_id"]] * 10 // 1000 + 1


def test_mapinarrow_unit_normalize(spark, sf_dir):
    """mapInArrow L2 normalization: unit norms out, zero vectors
    pass through, and the reported norm matches a JVM-side
    recomputation."""
    from top_produce_etl_spark.functions.udfs import unit_normalize_arrow
    from top_produce_etl_spark.io.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    out = unit_normalize_arrow(emb, "vec_id", "embedding")
    rows = out.collect()
    assert len(rows) == 50
    import math

    for r in rows:
        n2 = math.sqrt(sum(x * x for x in r["embedding"]))
        if r["norm"] > 0:
            assert abs(n2 - 1.0) < 1e-9
        assert r["norm"] >= 0


def test_multimodal_ascii_precondition_all_sf():
    """The multimodal_fake_features oracle re-derives the byte kernel
    with DuckDB codepoints (ascii(substr(...))), which is only valid
    while every document text is non-empty pure ASCII (utf-8 bytes ==
    codepoints; an empty text would drop the row from the oracle's
    generate_series while the kernel still emits one). This is the
    per-scale-factor assertion the queries/multimodal_q.py docstring
    promises: a future fixture regeneration that breaks the
    precondition fails HERE with a clear message, not as a cryptic
    battery hash mismatch."""
    import glob
    import os

    import duckdb

    checked = 0
    for sf_dir in sorted(glob.glob("/root/testdata/sf*")):
        p = os.path.join(sf_dir, "documents.parquet")
        if not os.path.exists(p):
            continue
        bad = duckdb.sql(
            f"""SELECT COUNT(*) FROM '{p}'
            WHERE text IS NULL OR length(text) = 0
               OR length(text) <> octet_length(CAST(text AS BLOB))"""
        ).fetchone()[0]
        assert bad == 0, (
            f"{sf_dir}: {bad} documents rows violate the non-empty/"
            "pure-ASCII precondition the multimodal oracle depends on"
        )
        checked += 1
    assert checked >= 1  # the fixture dirs must exist
