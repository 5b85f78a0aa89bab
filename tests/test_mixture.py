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


def test_temperature_rebalance_flattens_sqrt(spark):
    """α=0.5 smoothing: a 100-vs-400 corpus should move from 1:4
    toward 1:2 — the small source keeps ~all its mass (it binds),
    the big one keeps ~half. Hash selection is expectation-exact
    (±binomial noise), so assert bands, not exact counts."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.mixture import (
        temperature_rebalance,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 100, "small").otherwise("big").alias("src"),
    )
    kept = (
        temperature_rebalance(df, "src", "doc_id")
        .groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r.src: r.n for r in kept.collect()}
    # integer recipe: w=(10,20) -> p=(333333,666666) -> S=300
    # -> keep=(99,199)
    assert abs(got["small"] - 99) <= 15
    assert abs(got["big"] - 199) <= 30
    # determinism: the same call returns the identical kept set
    a = {r.doc_id for r in temperature_rebalance(df, "src", "doc_id").collect()}
    b = {r.doc_id for r in temperature_rebalance(df, "src", "doc_id").collect()}
    assert a == b


def test_budget_select_threshold_and_edges(spark):
    """Bucket-prefix semantics: best buckets fit whole or not at
    all; result never exceeds the budget; an oversized best bucket
    yields empty."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.mixture import budget_select

    df = spark.createDataFrame(
        [(1, 0.95, 40), (2, 0.90, 40), (3, 0.50, 40), (4, 0.10, 40)],
        "doc_id long, q double, toks long",
    )
    kept = budget_select(df, "q", "toks", budget=100)
    ids = {r.doc_id for r in kept.collect()}
    # buckets 950, 900, 500, 100: 40+40 fits, +40 would exceed 100
    assert ids == {1, 2}

    # boundary exact fit: budget 120 admits three buckets
    assert {
        r.doc_id for r in budget_select(df, "q", "toks", 120).collect()
    } == {1, 2, 3}

    # best bucket alone overflows -> empty, schema intact
    tight = budget_select(df, "q", "toks", budget=10)
    assert tight.count() == 0
    assert "__bucket" in tight.columns


def test_cap_per_category_exact_and_hash(spark):
    """Exact strategy keeps exactly min(n, cap) per category; hash
    strategy lands within binomial noise; small categories pass
    whole; both are deterministic."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.mixture import cap_per_category

    df = spark.range(330).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 300, "big").otherwise("small").alias("src"),
    )
    exact = (
        cap_per_category(df, "src", "doc_id", 50, strategy="exact")
        .groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r.src: r.n for r in exact.collect()}
    assert got == {"big": 50, "small": 30}

    hashed = (
        cap_per_category(df, "src", "doc_id", 50, strategy="hash")
        .groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    )
    goth = {r.src: r.n for r in hashed.collect()}
    assert abs(goth["big"] - 50) <= 20 and goth["small"] == 30
    a = {r.doc_id for r in cap_per_category(df, "src", "doc_id", 50).collect()}
    b = {r.doc_id for r in cap_per_category(df, "src", "doc_id", 50).collect()}
    assert a == b


def test_curriculum_stages_quartiles(spark):
    """Quartile staging on a uniform 0..99 score column: four equal
    stages in score order; n_stages<2 rejected."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.mixture import curriculum_stages

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.col("id").cast("double").alias("q")
    )
    got = {r.doc_id: r.stage
           for r in curriculum_stages(df, "q", 4).collect()}
    assert got[0] == 0 and got[24] == 0
    assert got[30] == 1 and got[60] == 2 and got[99] == 3
    sizes = {}
    for s in got.values():
        sizes[s] = sizes.get(s, 0) + 1
    assert all(20 <= n <= 30 for n in sizes.values())
    with _pytest.raises(ValueError, match="n_stages"):
        curriculum_stages(df, "q", 1)


def test_upsample_mixture_copy_counts_and_epochs(spark):
    from top_produce_etl_spark.operators.mixture import upsample_mixture

    rows = [(i, "wiki" if i % 2 else "web") for i in range(40)]
    df = spark.createDataFrame(rows, ["k", "cat"])
    out = upsample_mixture(
        df, "cat", "k", {"wiki": 2.5, "web": 1.0}
    ).collect()
    by_key: dict[int, list[int]] = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r["epoch"])
    assert set(by_key) == set(range(40))  # nothing dropped
    n_wiki_copies = []
    for k, eps in by_key.items():
        assert sorted(eps) == list(range(1, len(eps) + 1))  # 1..copies
        if k % 2:  # wiki: 2 or 3 copies (fractional half)
            assert len(eps) in (2, 3)
            n_wiki_copies.append(len(eps))
        else:  # web passes through exactly once
            assert len(eps) == 1
    # the fractional epoch actually splits the keys (not all-2/all-3)
    assert len(set(n_wiki_copies)) == 2


def test_upsample_mixture_zero_drops_and_absent_passes(spark):
    from top_produce_etl_spark.operators.mixture import upsample_mixture

    df = spark.createDataFrame(
        [(1, "junk"), (2, "junk"), (3, "other")], ["k", "cat"]
    )
    out = upsample_mixture(df, "cat", "k", {"junk": 0.0}).collect()
    assert [(r["k"], r["epoch"]) for r in out] == [(3, 1)]


def test_upsample_mixture_validation(spark):
    import pytest

    from top_produce_etl_spark.operators.mixture import upsample_mixture

    df = spark.createDataFrame([(1, "a")], ["k", "cat"])
    with pytest.raises(ValueError):
        upsample_mixture(df, "cat", "k", {})
    with pytest.raises(ValueError):
        upsample_mixture(df, "cat", "k", {"a": -1.0})
    with pytest.raises(ValueError):
        upsample_mixture(df, "cat", "k", {"bad name": 1.0})
