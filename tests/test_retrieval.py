"""Retrieval scoring operators (operators/retrieval.py): BM25 and
TF-IDF checked against hand-computed values on a tiny corpus, plus
the plan-shape contracts (broadcast-only stats, no cartesian)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from top_produce_etl_spark.operators.retrieval import (
    SCORE_SCALE,
    bm25_scores,
    tfidf_top_terms,
)
from top_produce_etl_spark.plans.audit import plan_audit

CORPUS = [
    (1, "spark makes joins fast"),
    (2, "spark spark everywhere"),
    (3, "nothing relevant here at all"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def _bm25_ref(tf, dl, n, avgdl, df, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_hand_computed(docs):
    out = {
        r["doc_id"]: (r["matched"], r["score_scaled"])
        for r in bm25_scores(docs, "doc_id", "text", ["spark"]).collect()
    }
    # doc 3 matches nothing → filtered out
    assert set(out) == {1, 2}
    n, avgdl, df = 3, (4 + 3 + 5) / 3.0, 2
    for doc_id, tf, dl in [(1, 1, 4), (2, 2, 3)]:
        expect = round(_bm25_ref(tf, dl, n, avgdl, df) * SCORE_SCALE)
        matched, scaled = out[doc_id]
        assert matched == 1
        assert scaled == expect


def test_bm25_multi_term_sums(docs):
    out = {
        r["doc_id"]: r["matched"]
        for r in bm25_scores(docs, "doc_id", "text", ["spark", "fast"]).collect()
    }
    assert out == {1: 2, 2: 1}


def test_tfidf_rank_and_tiebreak(docs):
    rows = tfidf_top_terms(docs, "doc_id", "text", top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    # doc 2: 'spark' tf=2 in 2 docs vs 'everywhere' tf=1 in 1 doc:
    # spark: 2·(ln(4/3)+1) ≈ 2.575; everywhere: 1·(ln(4/2)+1) ≈ 1.693
    assert sorted(by_doc[2]) == [(1, "spark"), (2, "everywhere")]
    # doc 3: five singleton terms, identical scores → term-asc tiebreak
    assert sorted(by_doc[3]) == [(1, "all"), (2, "at")]


def test_bm25_plan_shape(docs):
    audit = plan_audit(bm25_scores(docs, "doc_id", "text", ["spark"]))
    # one 1-row stats shuffle; the stats attach is a broadcast hash
    # join (a literal key would fold to a nested-loop cartesian)
    assert audit["exchanges"] <= 1
    assert not audit["cartesian"]
    assert not audit["sortmerge_joins"]


def test_unigram_surprisal_hand_computed(spark):
    """Tiny corpus, hand-derived micro-nat values: corpus a:2 b:2
    c:1, T=5; L(5)=1609438, L(2)=693147, L(1)=0."""
    from top_produce_etl_spark.operators.retrieval import unigram_surprisal

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.info_micro, r.mean_info_micro)
        for r in unigram_surprisal(df, "doc_id", "text").collect()
    }
    assert got == {
        1: (3, 3 * (1609438 - 693147), 1609438 - 693147),
        2: (2, (1609438 - 693147) + 1609438, ((1609438 - 693147) + 1609438) // 2),
    }


def test_bigram_cond_surprisal_flags_incoherent_sequence(spark):
    """Same vocabulary, different order: the doc whose bigrams are
    corpus-unique must score strictly higher conditional surprisal
    than the doc repeating the corpus-dominant sequence — the signal
    unigram surprisal cannot produce (identical token counts)."""
    from top_produce_etl_spark.operators.retrieval import (
        bigram_cond_surprisal,
    )

    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(1, common), (2, common), (3, common),
         (4, "mat the on sat cat the")],  # same tokens, shuffled
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.mean_cond_info_micro
        for r in bigram_cond_surprisal(docs, "doc_id", "text").collect()
    }
    assert out[4] > out[1]
    assert out[1] == out[2] == out[3]
    # single-token docs emit nothing
    single = spark.createDataFrame([(9, "solo")], ["doc_id", "text"])
    assert bigram_cond_surprisal(single, "doc_id", "text").count() == 0


def test_hashed_bow_vectors_shape_and_counts(spark):
    from top_produce_etl_spark.operators.retrieval import hashed_bow_vectors

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], ["doc_id", "text"]
    )
    out = {r.id: r.vec for r in hashed_bow_vectors(docs, "doc_id", "text", 8).collect()}
    assert len(out[1]) == 8 and len(out[2]) == 8
    assert sum(out[1]) == 3 and sum(out[2]) == 1  # token mass conserved
    # 'a' appears twice: some bucket holds exactly 2
    assert 2 in out[1]
    # determinism: same text → identical vector
    again = {r.id: r.vec for r in hashed_bow_vectors(docs, "doc_id", "text", 8).collect()}
    assert again == out
    import pytest

    with pytest.raises(ValueError):
        hashed_bow_vectors(docs, "doc_id", "text", 0)
