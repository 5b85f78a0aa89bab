"""Mixture rebalancing: integer sizing rule, exact-strategy counts,
hash-strategy expectation, validation."""

from __future__ import annotations

import pytest

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.mixture import rebalance_mixture

WEIGHTS = {"en": 40, "de": 20, "es": 20, "fr": 10, "zh": 10}
W = sum(WEIGHTS.values())


def _expected_keep(counts: dict[str, int]) -> dict[str, int]:
    s = min(n * W // WEIGHTS[c] for c, n in counts.items())
    return {c: WEIGHTS[c] * s // W for c in counts}


def test_exact_strategy_hits_exact_keep_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = {
        r.lang: r.n
        for r in docs.filter(docs.lang.isin(*WEIGHTS))
        .groupBy("lang").agg(F_count().alias("n")).collect()
    }
    got = {
        r.lang: r.n
        for r in rebalance_mixture(docs, "lang", "doc_id", WEIGHTS, strategy="exact")
        .groupBy("lang").agg(F_count().alias("n")).collect()
    }
    assert got == _expected_keep(counts)
    # proportions match the recipe up to integer floor
    total = sum(got.values())
    for c, n in got.items():
        assert abs(n - WEIGHTS[c] * total / W) <= len(WEIGHTS)


def test_exact_is_deterministic_and_a_subset(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = set(
        r.doc_id
        for r in rebalance_mixture(docs, "lang", "doc_id", WEIGHTS, strategy="exact")
        .select("doc_id").collect()
    )
    b = set(
        r.doc_id
        for r in rebalance_mixture(docs, "lang", "doc_id", WEIGHTS, strategy="exact")
        .select("doc_id").collect()
    )
    all_ids = set(r.doc_id for r in docs.select("doc_id").collect())
    assert a == b and a <= all_ids and len(a) > 0


def test_hash_strategy_close_to_targets(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    counts = {
        r.lang: r.n
        for r in docs.filter(docs.lang.isin(*WEIGHTS))
        .groupBy("lang").agg(F_count().alias("n")).collect()
    }
    want = _expected_keep(counts)
    got = {
        r.lang: r.n
        for r in rebalance_mixture(docs, "lang", "doc_id", WEIGHTS, strategy="hash")
        .groupBy("lang").agg(F_count().alias("n")).collect()
    }
    # expectation-level agreement: binomial noise, ~4 sigma bound
    for c, k in want.items():
        n = counts[c]
        sigma = max(1.0, (k * (1 - k / max(n, 1))) ** 0.5)
        assert abs(got.get(c, 0) - k) <= 4 * sigma, (c, got.get(c), k)


def test_absent_weighted_category_yields_empty(spark, sf_dir):
    # a weights key with zero matching rows caps S at 0: the only
    # corpus matching the recipe is empty (round-4 advice — was a
    # silent drop of the key, i.e. wrong proportions)
    docs = load_table(spark, sf_dir, "documents")
    w = dict(WEIGHTS, nosuchlang=10)
    for strategy in ("hash", "exact"):
        assert (
            rebalance_mixture(
                docs, "lang", "doc_id", w, strategy=strategy
            ).count()
            == 0
        ), strategy


def test_validation_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    with pytest.raises(ValueError):
        rebalance_mixture(df, "lang", "doc_id", {"en'; --": 1})
    with pytest.raises(ValueError):
        rebalance_mixture(df, "lang", "doc_id", {"en": 0})
    with pytest.raises(ValueError):
        rebalance_mixture(df, "lang", "doc_id", {})
    with pytest.raises(ValueError):
        rebalance_mixture(df, "lang", "doc_id", {"en": 1}, strategy="nope")


def F_count():
    from pyspark.sql import functions as F

    return F.count(F.lit(1))
