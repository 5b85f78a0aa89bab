"""Unit semantics for the keyed-merge / SCD2 / chunking operators
(queries/etl_q.py carries their oracle-checked battery entries; these
pin the edge cases small fixtures can't hit)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.operators.chunking import chunk_documents
from top_produce_etl_spark.operators.merge import apply_cdc, upsert
from top_produce_etl_spark.operators.scd import scd2_history


def rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_upsert_update_beats_base_and_latest_wins(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "k long, v string, seq long"
    )
    updates = spark.createDataFrame(
        # k=1: two updates — seq 6 wins; k=3 is a pure insert; k=1's
        # seq-5 update beats base even though base has seq 10
        [(1, "a2", 5), (1, "a3", 6), (3, "c", 1)],
        "k long, v string, seq long",
    )
    got = rows(upsert(base, updates, on="k", order_col="seq"), "k", "v")
    assert got == [(1, "a3"), (2, "b"), (3, "c")]


def test_apply_cdc_delete_insert_and_passthrough(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 10, "U"),   # update existing
            (3, None, 11, "D"),   # delete existing
            (4, "d", 12, "I"),    # insert new
            (5, "e", 13, "I"),    # insert then delete → gone
            (5, None, 14, "D"),
            (6, None, 15, "D"),   # delete of never-existed key → gone
            (1, "a9", 16, "U"),   # two changes same key: latest wins
            (1, "a10", 17, "U"),
        ],
        "k long, v string, seq long, op string",
    )
    got = rows(apply_cdc(base, changes, on="k", seq_col="seq"), "k", "v")
    assert got == [(1, "a10"), (2, "b2"), (4, "d")]


def test_scd2_collapses_repeats_and_chains_ranges(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    changes = spark.createDataFrame(
        [
            (1, "new", t(1), 1),
            (1, "new", t(2), 2),      # repeat — must collapse
            (1, "active", t(3), 3),
            (1, "active", t(4), 4),   # repeat
            (1, "churned", t(5), 5),
            (2, "new", t(7), 6),      # second key, single version
        ],
        "k long, status string, ts timestamp, id long",
    )
    hist = scd2_history(
        changes, key_cols="k", ts_col="ts", tracked="status", tiebreak="id"
    )
    got = sorted(
        (r["k"], r["status"], r["effective_from"].second,
         r["effective_to"].second if r["effective_to"] else None,
         r["is_current"])
        for r in hist.collect()
    )
    assert got == [
        (1, "active", 3, 5, False),
        (1, "churned", 5, None, True),
        (1, "new", 1, 3, False),
        (2, "new", 7, None, True),
    ]
    # ranges tile each key's timeline: every close == next open
    assert len(got) == 4


def test_scd2_null_transitions_are_versions(spark):
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    changes = spark.createDataFrame(
        [(1, None, t(1), 1), (1, "x", t(2), 2), (1, None, t(3), 3)],
        "k long, status string, ts timestamp, id long",
    )
    hist = scd2_history(
        changes, key_cols="k", ts_col="ts", tracked="status", tiebreak="id"
    )
    assert hist.count() == 3  # NULL→x and x→NULL both open versions


def test_chunk_documents_exact_windows(spark):
    text = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = spark.createDataFrame([(1, text), (2, "")], "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["token_start"], r["n_tokens"],
         r["chunk_text"])
        for r in chunk_documents(docs, "doc_id", "text", size=4, stride=3).collect()
        if r["doc_id"] == 1
    )
    assert got == [
        (1, 0, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 3, 4, "w3 w4 w5 w6"),
        (1, 2, 6, 4, "w6 w7 w8 w9"),
        (1, 3, 9, 1, "w9"),
    ]
    # empty doc yields nothing — but note tokens("") is [''] in Spark
    # split semantics, so "empty" means one empty token, 1 chunk; the
    # real guard is exercised via n>=1 in the operator
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(docs, "doc_id", "text", size=4, stride=5)


def test_table_diff_classifies_and_omits_unchanged(spark):
    from top_produce_etl_spark.operators.merge import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "c", 31), (4, "d", 40), (5, "e", 50)],
        "k long, s string, v long",
    )
    got = {r.k: r.change_type for r in table_diff(old, new, "k").collect()}
    # 1 removed; 2 unchanged (omitted); 3 value change; 4 NULL->'d'
    # (null-safe compare catches it); 5 added
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_table_diff_validates_cdc_apply(spark):
    """The reconciliation property: diff(apply_cdc(base, changes),
    expected_next_snapshot) must be EMPTY — the audit a CDC pipeline
    runs against the next full snapshot."""
    from top_produce_etl_spark.operators.merge import apply_cdc, table_diff

    base = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, s string"
    )
    changes = spark.createDataFrame(
        [(2, "b2", 1, "U"), (3, "c", 2, "I"), (1, None, 3, "D")],
        "k long, s string, seq long, op string",
    )
    nxt = apply_cdc(base, changes, on="k", seq_col="seq")
    expected = spark.createDataFrame(
        [(2, "b2"), (3, "c")], "k long, s string"
    )
    assert table_diff(nxt, expected, "k").count() == 0


def test_table_diff_rejects_missing_compare_cols(spark):
    import pytest

    from top_produce_etl_spark.operators.merge import table_diff

    old = spark.createDataFrame([(1, "a")], "k long, s string")
    new = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="absent"):
        table_diff(old, new, "k")


def test_pit_lookup_boundaries(spark):
    """Facts at version boundaries: inclusive at effective_from,
    exclusive at effective_to; before first version -> NULL; after
    last change -> current version."""
    import datetime as dt

    from top_produce_etl_spark.operators.scd import pit_lookup, scd2_history

    t = lambda d: dt.datetime(2025, 1, d)  # noqa: E731
    changes = spark.createDataFrame(
        [(1, "bronze", t(2), 1), (1, "silver", t(5), 2), (1, "gold", t(9), 3)],
        "user_id long, status string, ts timestamp, event_id long",
    )
    hist = scd2_history(
        changes, "user_id", "ts", "status", tiebreak="event_id"
    ).drop("event_id")
    facts = spark.createDataFrame(
        [(10, 1, t(1)),   # before first version
         (11, 1, t(2)),   # exactly at first effective_from (inclusive)
         (12, 1, t(5)),   # boundary: silver starts, bronze ends (exclusive)
         (13, 1, t(30))], # after last change -> current (gold)
        "fact_id long, user_id long, ts timestamp",
    )
    got = {
        r.fact_id: r.status
        for r in pit_lookup(facts, hist, "user_id", "ts").collect()
    }
    assert got == {10: None, 11: "bronze", 12: "silver", 13: "gold"}


def test_pit_lookup_preserves_fact_range_named_columns(spark):
    """A facts column named like the history's from/to columns must
    survive — the history's range columns ride reserved aliases, so
    the post-join drop cannot eat the facts copy (round-4 advice)."""
    import datetime as dt

    from top_produce_etl_spark.operators.scd import pit_lookup

    t = lambda d: dt.datetime(2025, 1, d)  # noqa: E731
    hist = spark.createDataFrame(
        [(1, "bronze", t(1), None)],
        "user_id long, status string, effective_from timestamp, "
        "effective_to timestamp",
    )
    facts = spark.createDataFrame(
        [(100, 1, t(3), t(2))],
        "fact_id long, user_id long, ts timestamp, effective_from timestamp",
    )
    out = pit_lookup(facts, hist, "user_id", "ts")
    assert out.columns.count("effective_from") == 1
    row = out.collect()[0]
    assert row["effective_from"] == t(2)  # the FACTS copy, untouched
    assert row["status"] == "bronze"


def test_pit_lookup_rejects_ambiguous_attrs(spark):
    import datetime as dt

    import pytest

    from top_produce_etl_spark.operators.scd import pit_lookup

    t = dt.datetime(2025, 1, 1)
    hist = spark.createDataFrame(
        [(1, "a", t, None)],
        "user_id long, status string, effective_from timestamp, "
        "effective_to timestamp",
    )
    facts = spark.createDataFrame(
        [(1, t, "x")], "user_id long, ts timestamp, status string"
    )
    with pytest.raises(ValueError, match="collide"):
        pit_lookup(facts, hist, "user_id", "ts")


def test_merge_agg_cdc_retraction_and_group_move(spark):
    """The three CDC agg-maintenance cases in one batch: an insert
    adds, a delete retracts its group to zero (group disappears), a
    group-moving update retracts from the old group and adds to the
    new one."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.merge import merge_agg_cdc

    state = spark.createDataFrame(
        [("a", 2, 20.0), ("b", 1, 5.0)], "g string, cnt long, v double"
    )
    changes = spark.createDataFrame(
        [
            # insert into a
            ("I", "a", 7.0, None, None),
            # delete b's only row -> b must vanish
            ("D", None, None, "b", 5.0),
            # move one a-row (value 8) into c with value 9
            ("U", "c", 9.0, "a", 8.0),
        ],
        "op string, g string, v double, before_g string, before_v double",
    )
    out = {
        r["g"]: (r["cnt"], r["v"])
        for r in merge_agg_cdc(state, changes, ["g"], ["v"]).collect()
    }
    assert out == {"a": (2, 19.0), "c": (1, 9.0)}


def test_merge_agg_cdc_equals_recompute(spark):
    """state ⊕ delta ≡ full recompute over the post-batch facts."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.merge import merge_agg_cdc

    facts = [(i, "g" + str(i % 3), float(i)) for i in range(60)]
    fdf = spark.createDataFrame(facts, "k long, g string, v double")
    state = fdf.groupBy("g").agg(
        F.count("*").cast("bigint").alias("cnt"), F.sum("v").alias("v")
    )
    # batch: delete multiples of 10, move multiples of 7 to gX (+1),
    # insert three new rows
    rows = {k: (g, v) for k, g, v in facts}
    changes = (
        [("D", None, None, rows[k][0], rows[k][1]) for k in range(0, 60, 10)]
        + [
            ("U", "gX", rows[k][1] + 1, rows[k][0], rows[k][1])
            for k in range(7, 60, 7)
            if k % 10 != 0
        ]
        + [("I", "gNew", 100.0, None, None)] * 3
    )
    cdf = spark.createDataFrame(
        changes,
        "op string, g string, v double, before_g string, before_v double",
    )
    got = {
        r["g"]: (r["cnt"], round(r["v"], 6))
        for r in merge_agg_cdc(state, cdf, ["g"], ["v"]).collect()
    }
    # recompute from scratch
    post = {}
    dels = set(range(0, 60, 10))
    for k, (g, v) in rows.items():
        if k in dels:
            continue
        if k % 7 == 0 and k % 10 != 0 and k != 0:
            g, v = "gX", v + 1
        c, s = post.get(g, (0, 0.0))
        post[g] = (c + 1, s + v)
    c, s = post.get("gNew", (0, 0.0))
    post["gNew"] = (c + 3, s + 300.0)
    want = {g: (c, round(s, 6)) for g, (c, s) in post.items()}
    assert got == want
