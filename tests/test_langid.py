"""In-engine language identification (round 10 —
operators/langid.py): corpus synthesis parity, bit-exact multi-head
training vs the unrolled DuckDB oracle, partitioning invariance,
held-out generalization, deterministic argmax, and the scan-speed
inference plan shape."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.operators._cache import unpersist_all
from top_produce_etl_spark.operators.langid import (
    LANG_LEXICONS,
    score_langid,
    synthesize_lang_corpus,
    synthesize_lang_corpus_oracle,
    train_langid,
    train_langid_oracle_sql,
)


@pytest.fixture()
def corpus(spark):
    base = spark.range(80).select(F.col("id").alias("doc_id"))
    return synthesize_lang_corpus(base)


def test_corpus_parity_with_oracle(spark, corpus):
    got = {r["doc_id"]: (r["lang"], r["text"]) for r in corpus.collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE base AS SELECT range AS doc_id FROM range(80)")
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            synthesize_lang_corpus_oracle("base")
        ).fetchall()
    }
    assert got == duck
    langs = {v[0] for v in got.values()}
    assert langs == set(LANG_LEXICONS)


def test_training_bit_exact_vs_oracle(spark, corpus):
    model = sorted(
        map(tuple, train_langid(corpus, iters=2, n_buckets=32).collect())
    )
    unpersist_all()
    con = duckdb.connect()
    con.execute("CREATE TABLE base AS SELECT range AS doc_id FROM range(80)")
    con.execute(
        f"CREATE VIEW corp AS {synthesize_lang_corpus_oracle('base')}"
    )
    duck = sorted(
        map(
            tuple,
            con.execute(
                train_langid_oracle_sql("corp", iters=2, n_buckets=32)
            ).fetchall(),
        )
    )
    assert model == duck
    assert len(model) == len(LANG_LEXICONS) * 33  # K heads x (32 buckets + bias)


def test_training_partitioning_invariance(spark, corpus):
    w1 = sorted(map(tuple, train_langid(
        corpus.repartition(1), iters=2, n_buckets=32).collect()))
    w13 = sorted(map(tuple, train_langid(
        corpus.repartition(13), iters=2, n_buckets=32).collect()))
    unpersist_all()
    assert w1 == w13


def test_heldout_generalization(spark):
    """Train on even doc_ids, score odd doc_ids the model never saw:
    the planted lexicons must be recovered, not memorized. The r11
    corpus plants a CONFUSABLE es/pt/gl cluster AND variable word
    strides (some docs see only a lexicon subset), so the gate is
    ≥0.9 — perfect separation is no longer structural (200 training
    docs reach 0.92 at 10 iterations; the 200k bench probe reads
    ~0.92 at 5)."""
    corpus = synthesize_lang_corpus(
        spark.range(400).select(F.col("id").alias("doc_id"))
    )
    train = corpus.where(F.col("doc_id") % 2 == 0)
    held = corpus.where(F.col("doc_id") % 2 == 1)
    model = train_langid(train, iters=10)
    scored = score_langid(held, model)
    joined = scored.join(
        held.select(F.col("doc_id").alias("id"),
                    F.col("lang").alias("lang_true")), "id"
    )
    n = joined.count()
    good = joined.where(F.col("pred_lang") == F.col("lang_true")).count()
    unpersist_all()
    assert n == 200 and good >= 0.9 * n


def test_argmax_tiebreak_deterministic(spark):
    """Equal z across heads resolves to the lexicographically first
    language — an all-zero model ties every head."""
    corpus = synthesize_lang_corpus(
        spark.range(10).select(F.col("id").alias("doc_id"))
    )
    zero = spark.createDataFrame(
        [(s, b, 0) for s in LANG_LEXICONS for b in range(-1, 64)],
        "lang string, bucket int, w_micro bigint",
    )
    preds = {r["pred_lang"] for r in score_langid(corpus, zero).collect()}
    assert preds == {sorted(LANG_LEXICONS)[0]}


def test_short_text_bias_only(spark):
    """Text shorter than the n-gram width contributes only its bias
    row (Spark's sequence(1, 0) is DESCENDING — the guard matters):
    scoring still returns a deterministic prediction."""
    df = spark.createDataFrame([(1, "ab"), (2, "")],
                               "doc_id long, text string")
    zero = spark.createDataFrame(
        [(s, b, 0) for s in LANG_LEXICONS for b in range(-1, 64)],
        "lang string, bucket int, w_micro bigint",
    )
    rows = score_langid(df, zero).collect()
    assert len(rows) == 2
    assert all(r["pred_lang"] == sorted(LANG_LEXICONS)[0] for r in rows)


def test_xxhash64_production_path(spark, corpus):
    """The fast-twin bucket hash trains and scores end to end and
    still recovers the planted structure (the oracle is pinned to
    the portable hash; this pins the production path's quality)."""
    model = train_langid(corpus, iters=3, hash_mode="xxhash64")
    scored = score_langid(corpus, model, hash_mode="xxhash64")
    joined = scored.join(
        corpus.select(F.col("doc_id").alias("id"),
                      F.col("lang").alias("lang_true")), "id"
    )
    good = joined.where(F.col("pred_lang") == F.col("lang_true")).count()
    unpersist_all()
    assert good == 80


def test_inference_plan_scan_speed(spark, corpus):
    """Scoring = one broadcast-model join + one id-keyed aggregate:
    no row-Python, no sort, exactly one shuffle exchange — the shape
    a 100 TB language sweep needs."""
    model = train_langid(corpus, iters=1, n_buckets=32)
    unpersist_all()
    out = score_langid(corpus, model, n_buckets=32)
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in p
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 1, p
    # one exchange for the per-doc aggregate; the feature build
    # (explode + partial count) is map-side before it
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) <= 2, p
    assert "Sort" not in p or "SortAggregate" not in p


def test_expr_scorer_matches_aggregate_scorer(spark, corpus):
    """The zero-shuffle expression scorer (streaming-legal) is
    bit-identical to the broadcast-join scorer, with NO exchange and
    NO join in its plan."""
    model = train_langid(corpus, iters=2, n_buckets=32)
    rows = model.collect()
    from top_produce_etl_spark.operators.langid import score_langid_expr

    a = sorted(map(tuple, score_langid(
        corpus, model, n_buckets=32).collect()))
    b = sorted(map(tuple, score_langid_expr(
        corpus, rows, n_buckets=32).collect()))
    unpersist_all()
    assert a == b
    out = score_langid_expr(corpus, rows, n_buckets=32)
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert not re.search(r"\(\d+\) Exchange\b", p), p
    assert "Join" not in p, p
