"""Deterministic split assignment (operators/splits.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.splits import assign_split


def test_split_is_deterministic_and_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in assign_split(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(docs, "doc_id").collect()}
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == docs.count()


def test_split_fractions_approximately_hold(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    counts = {
        r["split"]: r["n"]
        for r in assign_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts.get("train", 0) / n == pytest.approx(0.9, abs=0.06)
    assert (counts.get("val", 0) + counts.get("test", 0)) / n == pytest.approx(
        0.1, abs=0.06
    )


def test_split_is_append_stable(spark, sf_dir):
    """Assignments computed on a subset must agree with assignments
    computed on the full corpus — the property that makes the split
    safe under corpus growth."""
    docs = load_table(spark, sf_dir, "documents")
    subset = docs.filter(F.col("doc_id") % 2 == 0)
    full = {r["doc_id"]: r["split"] for r in assign_split(docs, "doc_id").collect()}
    part = {r["doc_id"]: r["split"] for r in assign_split(subset, "doc_id").collect()}
    assert part == {k: v for k, v in full.items() if k % 2 == 0}


def test_new_salt_is_a_fresh_split(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["split"] for r in assign_split(docs, "doc_id", salt="v1").collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(docs, "doc_id", salt="v2").collect()}
    assert a != b  # some documents move


def test_bad_fractions_rejected(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="sum to 1"):
        assign_split(docs, "doc_id", {"train": 0.5, "test": 0.4})


def test_folds_balanced_and_deterministic(spark, sf_dir):
    from top_produce_etl_spark.operators.splits import assign_fold

    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["fold"] for r in assign_fold(docs, "doc_id", k=5).collect()}
    b = {r["doc_id"]: r["fold"] for r in assign_fold(docs, "doc_id", k=5).collect()}
    assert a == b and set(a.values()) == {0, 1, 2, 3, 4}
    from collections import Counter

    counts = Counter(a.values())
    n = len(a)
    for fold, c in counts.items():
        assert abs(c / n - 0.2) < 0.08, (fold, c)


def test_assign_fold_on_group_key_is_group_kfold(spark):
    """GroupKFold falls out of assign_fold by keying on the GROUP
    column: every row of a group lands in the same fold (no
    cross-fold leakage of grouped documents), and folds stay
    populated."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.splits import assign_fold

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 30)).alias("source"),
    )
    folded = assign_fold(df, "source", k=5)
    per_group = folded.groupBy("source").agg(
        F.countDistinct("fold").alias("nf")
    )
    assert all(r.nf == 1 for r in per_group.collect())
    assert folded.select("fold").distinct().count() >= 4


def test_stratified_exact_split_counts_and_determinism(spark):
    """Every stratum must land floor-exact proportions (the property
    assign_split only gives in expectation), re-runs identically,
    and a different salt reshuffles membership without changing the
    counts."""
    from top_produce_etl_spark.operators.splits import (
        stratified_exact_split,
    )

    rows = [(i, "s_small" if i < 50 else "s_big") for i in range(1050)]
    df = spark.createDataFrame(rows, "id long, stratum string")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = stratified_exact_split(df, ["stratum"], "id", fr)
    counts = {
        (r["stratum"], r["split"]): r["n"]
        for r in out.groupBy("stratum", "split").agg(
            __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
        ).collect()
    }
    # small stratum: 50 rows -> exactly 40/5/5
    assert counts[("s_small", "train")] == 40
    assert counts[("s_small", "val")] == 5
    assert counts[("s_small", "test")] == 5
    # big stratum: 1000 -> 800/100/100
    assert counts[("s_big", "train")] == 800
    assert counts[("s_big", "val")] == 100
    assert counts[("s_big", "test")] == 100
    a = {(r["id"], r["split"]) for r in out.collect()}
    b = {
        (r["id"], r["split"])
        for r in stratified_exact_split(df, ["stratum"], "id", fr).collect()
    }
    assert a == b  # deterministic
    c = {
        (r["id"], r["split"])
        for r in stratified_exact_split(
            df, ["stratum"], "id", fr, salt="strat-v2"
        ).collect()
    }
    assert c != a  # salt reshuffles membership
    with __import__("pytest").raises(ValueError, match="sum to 1"):
        stratified_exact_split(df, ["stratum"], "id", {"a": 0.5})
