"""Prefix-filtered exact Jaccard join (round 9 —
operators/dedup.py::prefix_filter_jaccard_pairs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators._cache import unpersist_all
from top_produce_etl_spark.operators.dedup import (
    jaccard_pairs,
    prefix_filter_jaccard_pairs,
)


def test_prefix_join_equals_full_join(spark, sf_dir):
    """Losslessness on the fixture: identical pair set AND identical
    jaccard values as the inverted-index full join."""
    docs = load_table(spark, sf_dir, "documents")
    full = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 12))
        for r in jaccard_pairs(docs, "doc_id", "text", k=5).collect()
    }
    pref = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 12))
        for r in prefix_filter_jaccard_pairs(
            docs, "doc_id", "text", k=5, threshold=(1, 2)
        ).collect()
    }
    unpersist_all()
    assert pref == full and len(pref) > 0


def test_prefix_join_skew_immunity(spark):
    """A boilerplate shingle shared by EVERY doc never enters any
    prefix (it is the most frequent, i.e. last in rarity order), so
    the candidate space stays pair-sparse while qualifying pairs are
    still found — the skew story the full self-join cannot tell."""
    boiler = "copyright footer all rights reserved"
    rows = []
    for i in range(60):
        # docs 0/1 are near-identical (share most content shingles);
        # everyone shares the boilerplate sentence
        if i < 2:
            body = f"alpha beta gamma delta epsilon zeta eta theta v{i}"
        else:
            body = " ".join(f"w{i}_{j}" for j in range(9))
        rows.append((i, f"{body} {boiler}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = prefix_filter_jaccard_pairs(
        docs, "doc_id", "text", k=5, threshold=(1, 3)
    ).collect()
    unpersist_all()
    pairs = {(r["a_id"], r["b_id"]) for r in out}
    assert (0, 1) in pairs
    # the 58 boilerplate-only docs share ~4 of ~10 shingles pairwise
    # (J < 1/3): none may pair
    assert all(a < 2 for a, b in pairs)


def test_prefix_join_rejects_bad_threshold(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="outside"):
        prefix_filter_jaccard_pairs(docs, "doc_id", "text", threshold=(3, 2))
