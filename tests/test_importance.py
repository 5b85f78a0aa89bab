"""DSIR importance-resampling invariants (operators/importance.py):
model shape, score semantics (target-slice documents outscore the
rest), and Gumbel reproducibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.importance import (
    BUCKETS,
    bucket_log_ratios,
    dsir_scores,
    gumbel_micro,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_lambda_model_is_fixed_size(spark, sf_dir):
    """The fitted model is EXACTLY the bucket domain — including
    never-observed buckets (smoothing needs them)."""
    docs = _docs(spark, sf_dir)
    lam = bucket_log_ratios(docs, "doc_id", "text", "lang = 'en'")
    assert lam.count() == BUCKETS
    assert lam.select("bucket").distinct().count() == BUCKETS


def test_target_docs_outscore_rest(spark, sf_dir):
    """The point of DSIR: documents from the target slice score
    higher (mean per-token score) than the others."""
    docs = _docs(spark, sf_dir)
    scores = dsir_scores(docs, "doc_id", "text", "lang = 'en'")
    joined = scores.join(docs.select("doc_id", "lang"), "doc_id")
    means = (
        joined.withColumn(
            "per_tok", F.col("score_micro") / F.col("n_tokens")
        )
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("per_tok").alias("m"))
        .collect()
    )
    by_flag = {r[0]: r["m"] for r in means}
    assert by_flag[True] > by_flag[False]


def test_scores_cover_all_docs_with_tokens(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    scores = dsir_scores(docs, "doc_id", "text", "lang = 'en'")
    assert scores.count() == docs.where(F.length("text") > 0).count()


def test_gumbel_noise_is_reproducible_and_salted(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    a = docs.select("doc_id", gumbel_micro("doc_id").alias("g"))
    b = docs.select("doc_id", gumbel_micro("doc_id").alias("g"))
    assert a.exceptAll(b).count() == 0
    # a different salt is a fresh draw — not identical across 50 ids
    base = {r["doc_id"]: r["g"] for r in a.collect()}
    other = {
        r["doc_id"]: r["g"]
        for r in docs.select(
            "doc_id", gumbel_micro("doc_id", salt="other").alias("g")
        ).collect()
    }
    assert set(base) == set(other)
    assert sum(base[i] == other[i] for i in base) < len(base)


def test_fast_twin_selection_overlap(spark, sf_dir):
    """xxhash64 bucketing is a different (equally valid) featurizer;
    the SELECTION it induces must still largely agree with the
    portable-hash oracle path — the signal is the distribution, not
    the hash."""
    docs = _docs(spark, sf_dir)
    a = dsir_scores(docs, "doc_id", "text", "lang = 'en'")
    b = dsir_scores(
        docs, "doc_id", "text", "lang = 'en'", hasher="xxhash64"
    )

    def top100(df):
        return {
            r["doc_id"]
            for r in df.orderBy(
                F.col("score_micro").desc(), F.col("doc_id").asc()
            )
            .limit(100)
            .collect()
        }

    overlap = len(top100(a) & top100(b))
    assert overlap >= 60


def test_effective_sample_size_bounds(spark):
    """Uniform weights -> ESS == n (ratio 1000); one dominant weight
    -> ESS near 1; zero/NULL weights excluded."""
    from top_produce_etl_spark.operators.importance import (
        effective_sample_size,
    )

    uni = spark.createDataFrame(
        [(i, 2.0) for i in range(100)], "id long, w double"
    )
    r = effective_sample_size(uni, "w").collect()[0]
    assert (r["n"], r["ess_milli"], r["ess_ratio_milli"]) == (
        100, 100_000, 1000,
    )
    skew = spark.createDataFrame(
        [(0, 1000.0)] + [(i, 0.001) for i in range(1, 100)],
        "id long, w double",
    )
    r = effective_sample_size(skew, "w").collect()[0]
    assert r["ess_milli"] < 1_100  # ~1 effective row
    mixed = spark.createDataFrame(
        [(0, None), (1, 1.0), (2, 1.0)], "id long, w double"
    )
    r = effective_sample_size(mixed, "w").collect()[0]
    assert r["n"] == 2 and r["ess_ratio_milli"] == 1000
