"""Random projection (operators/similarity.py::random_project):
closed-form sign matrix, decimal/double twin agreement, partition
invariance, and a recall floor for the compressed-ANN path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.similarity import (
    cosine_topk_bruteforce,
    random_project,
)


def _sign(i: int, j: int) -> int:
    h1 = (i * 40503 + j * 10859) % 65521
    h2 = (h1 * h1 + i * 7919 + j * 104729) % 65521
    return 1 - 2 * (h2 % 2)


def test_matches_python_recompute(spark):
    vec = [1.0, -2.0, 0.5, 4.0]
    df = spark.createDataFrame([(1, vec)], "id int, v array<float>")
    got = random_project(df, "v", 3).select("proj").first()[0]
    for j in range(3):
        want = round(sum(_sign(i, j) * x for i, x in enumerate(vec)), 6)
        assert got[j] == pytest.approx(want, abs=1e-9)


def test_output_width_and_type(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(5)
    out = random_project(emb, "embedding", 16)
    assert dict(out.dtypes)["proj"] == "array<double>"
    assert out.select(F.size("proj")).distinct().collect()[0][0] == 16


def test_partition_invariance(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    a = random_project(emb.repartition(1), "embedding", 8)
    b = random_project(emb.repartition(7), "embedding", 8)
    ra = {r.vec_id: r.proj for r in a.select("vec_id", "proj").collect()}
    rb = {r.vec_id: r.proj for r in b.select("vec_id", "proj").collect()}
    assert ra == rb


def test_double_twin_close(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    dec = random_project(emb, "embedding", 8, scoring="decimal")
    dbl = random_project(emb, "embedding", 8, scoring="double")
    joined = (
        dec.select("vec_id", F.posexplode("proj").alias("j", "v_dec"))
        .join(
            dbl.select(
                "vec_id", F.posexplode("proj").alias("j", "v_dbl")
            ),
            ["vec_id", "j"],
        )
        .select(F.max(F.abs(F.col("v_dec") - F.col("v_dbl"))))
    )
    # ±1 · float terms are exact in any arithmetic; the two paths
    # differ only in fold rounding of the running sum — sub-1e-6
    # before the shared 6-dp round
    assert joined.collect()[0][0] < 2e-6


def test_validation(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(1)
    with pytest.raises(ValueError, match="out_dim"):
        random_project(emb, "embedding", 0)
    with pytest.raises(ValueError, match="scoring"):
        random_project(emb, "embedding", 4, scoring="float")


def test_cosine_error_within_jl_bound(spark, sf_dir):
    """The JL contract: projected cosine approximates true cosine
    with error concentrating at ~sqrt(2/(π·K)) ≈ 0.2 for K=16.
    (Top-k recall is deliberately NOT asserted: on this
    near-uniform fixture true top-3 gaps sit below any
    compressor's noise floor — even a true random ±1 matrix scores
    ≈0.03 recall — so the error bound is the real quality gate;
    bench tracks the exact value per round.)"""
    from top_produce_etl_spark.operators.similarity import (
        projection_quality_report,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    row = projection_quality_report(
        emb, "vec_id", "embedding", 16, F.col("vec_id") < 10
    ).collect()[0]
    assert row.n_pairs > 0
    assert row.cos_mae <= 0.25, f"JL mae degraded: {row.cos_mae}"
    # max error is the tail: a handful of pairs can land several
    # sigma out, but anything near 1.0 means the matrix degenerated
    assert row.cos_max_err <= 0.9, f"JL tail blew up: {row.cos_max_err}"


def test_wider_projection_tightens_error(spark, sf_dir):
    """More output dims → smaller cosine error (the 1/sqrt(K)
    law) — guards against a sign matrix whose extra columns are
    correlated copies rather than fresh directions."""
    from top_produce_etl_spark.operators.similarity import (
        projection_quality_report,
    )

    emb = load_table(spark, sf_dir, "embeddings").limit(100)
    pred = F.col("vec_id") < 5
    mae16 = projection_quality_report(
        emb, "vec_id", "embedding", 16, pred
    ).collect()[0].cos_mae
    mae48 = projection_quality_report(
        emb, "vec_id", "embedding", 48, pred
    ).collect()[0].cos_mae
    assert mae48 < mae16, f"48-dim mae {mae48} not below 16-dim {mae16}"


def test_rp_topk_fast_twin_same_neighbor_sets(spark, sf_dir):
    from top_produce_etl_spark.queries.similarity_q import (
        rp_topk_embeddings,
        rp_topk_fast,
    )

    slow = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in rp_topk_embeddings(spark, sf_dir).collect()
    }
    fast = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in rp_topk_fast(spark, sf_dir).collect()
    }
    assert slow == fast
