"""Record-linkage invariants (operators/linkage.py): blocking is an
equi-join (never a cartesian), transitivity resolves chains, and
golden records merge by the declared survivorship aggregates."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.linkage import (
    blocked_pairs,
    golden_records,
    resolve_entities,
)


def _records(spark):
    # a planted chain: A~B and B~C (but A!~C directly) must resolve
    # into ONE entity; D shares the block but matches nothing; E is
    # in a different block entirely
    return spark.createDataFrame(
        [
            (1, "acme", "widget deluxe", 10.0),
            (2, "acme", "widget delux", 11.0),
            (3, "acme", "widget delu", 12.0),
            (4, "acme", "completely other", 13.0),
            (5, "zenith", "widget deluxe", 14.0),
        ],
        "rec_id long, vendor string, product string, price double",
    )


def test_blocked_pairs_respects_blocking_and_predicate(spark):
    df = _records(spark)
    pairs = blocked_pairs(
        df,
        "rec_id",
        ["vendor"],
        "levenshtein(a_product, b_product) <= 2",
        attrs=["product"],
    )
    got = {(r["a_id"], r["b_id"]) for r in pairs.collect()}
    # 1-2 (dist 1), 2-3 (dist 1), 1-3 (dist 2); never 5 (other block)
    assert got == {(1, 2), (2, 3), (1, 3)}
    # blocking is an equi-join: no cartesian in the plan
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan


def test_resolve_entities_transitive_chain(spark):
    df = _records(spark)
    assign = resolve_entities(
        df,
        "rec_id",
        ["vendor"],
        "levenshtein(a_product, b_product) <= 1",
        attrs=["product"],
    )
    got = {r["id"]: r["entity_id"] for r in assign.collect()}
    # 1~2 and 2~3 only (1-3 is dist 2): the chain still collapses
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}


def test_golden_records_survivorship(spark):
    df = _records(spark)
    assign = resolve_entities(
        df,
        "rec_id",
        ["vendor"],
        "levenshtein(a_product, b_product) <= 1",
        attrs=["product"],
    )
    golden = golden_records(
        df,
        assign,
        "rec_id",
        {"n_records": "count(*)", "best_price": "max(price)"},
    )
    got = {
        r["entity_id"]: (r["n_records"], r["best_price"])
        for r in golden.collect()
    }
    assert got == {1: (3, 12.0), 4: (1, 13.0), 5: (1, 14.0)}


def test_golden_records_id_col_named_id(spark):
    """ADVICE r6: drop-by-name drops ALL 'id' columns, so
    id_col == 'id' used to nuke the data side — the reserved-name
    join must survive it."""
    df = spark.createDataFrame(
        [
            (1, "acme", "widget deluxe", 10.0),
            (2, "acme", "widget delux", 11.0),
            (3, "acme", "other", 12.0),
        ],
        "id long, vendor string, product string, price double",
    )
    assign = resolve_entities(
        df,
        "id",
        ["vendor"],
        "levenshtein(a_product, b_product) <= 1",
        attrs=["product"],
    )
    golden = golden_records(
        df, assign, "id",
        {"n_records": "count(*)", "max_id": "max(id)"},
    )
    got = {
        r["entity_id"]: (r["n_records"], r["max_id"])
        for r in golden.collect()
    }
    assert got == {1: (2, 2), 3: (1, 3)}


def test_golden_records_rejects_entity_id_collision(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, "a", 1.0)], "rec_id long, entity_id string, price double"
    )
    assign = spark.createDataFrame(
        [(1, 1)], "id long, entity_id long"
    )
    with pytest.raises(ValueError, match="entity_id"):
        golden_records(df, assign, "rec_id", {"n": "count(*)"})
