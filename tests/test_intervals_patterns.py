"""Round-5 wave-2 operator properties: interval sweep-line
(operators/intervals.py), sequence-pattern matching
(operators/sequences.py::symbol_histories/pattern_match_counts),
and the anti-entropy table fingerprint
(operators/quality.py::table_fingerprint)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.operators.intervals import (
    daily_concurrency,
    interval_deltas,
    peak_concurrency,
)
from top_produce_etl_spark.operators.quality import table_fingerprint
from top_produce_etl_spark.operators.sequences import (
    pattern_match_counts,
    symbol_histories,
)

D = dt.date


def _iv(spark, rows):
    return spark.createDataFrame(rows, "s date, e date")


def test_half_open_interval_semantics(spark):
    """An interval ending on day D is still open ON D and closed on
    D+1; two overlapping intervals stack."""
    df = _iv(
        spark,
        [
            (D(2024, 1, 1), D(2024, 1, 3)),
            (D(2024, 1, 2), D(2024, 1, 2)),
        ],
    )
    out = {
        r["day"]: r["n_open"]
        for r in daily_concurrency(df, "s", "e").collect()
    }
    assert out == {
        D(2024, 1, 1): 1,  # first opens
        D(2024, 1, 2): 2,  # second opens (still open on its end day)
        D(2024, 1, 3): 1,  # second closed, first still open on its end day
        D(2024, 1, 4): 0,  # everything closed the day after
    }


def test_null_end_never_closes_and_null_start_drops(spark):
    df = _iv(
        spark,
        [(D(2024, 1, 1), None), (None, D(2024, 1, 5))],
    )
    out = {
        r["day"]: r["n_open"]
        for r in daily_concurrency(df, "s", "e").collect()
    }
    assert out == {D(2024, 1, 1): 1}


def test_interval_deltas_sum_to_zero_for_closed_intervals(spark):
    df = _iv(
        spark,
        [(D(2024, 1, d), D(2024, 1, d + 3)) for d in range(1, 20)],
    )
    total = (
        interval_deltas(df, "s", "e").agg(F.sum("delta")).collect()[0][0]
    )
    assert total == 0


def test_peak_concurrency_earliest_day_tiebreak(spark):
    """The peak value 2 is attained twice (Jan 2 and Jan 5); the
    reported peak_day must be the EARLIEST."""
    df = _iv(
        spark,
        [
            (D(2024, 1, 1), D(2024, 1, 2)),
            (D(2024, 1, 2), D(2024, 1, 2)),
            (D(2024, 1, 5), D(2024, 1, 6)),
            (D(2024, 1, 5), D(2024, 1, 5)),
        ],
    )
    row = peak_concurrency(df, "s", "e").collect()[0]
    assert (row["peak_open"], row["peak_day"]) == (2, D(2024, 1, 2))


def test_grouped_peak_partitions_window(spark):
    df = spark.createDataFrame(
        [
            ("a", D(2024, 1, 1), D(2024, 1, 9)),
            ("a", D(2024, 1, 2), D(2024, 1, 3)),
            ("b", D(2024, 1, 1), D(2024, 1, 1)),
        ],
        "g string, s date, e date",
    )
    out = {
        r["g"]: (r["peak_open"], r["peak_day"])
        for r in peak_concurrency(df, "s", "e", group_cols=["g"]).collect()
    }
    assert out == {"a": (2, D(2024, 1, 2)), "b": (1, D(2024, 1, 1))}
    # the grouped variant must NOT plan a global window
    from top_produce_etl_spark.plans.audit import plan_audit

    audit = plan_audit(peak_concurrency(df, "s", "e", group_cols=["g"]))
    assert not audit["global_window"]


_EV = "user bigint, ts timestamp, eid bigint, et string"


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (u, dt.datetime(2024, 1, 1, 0, 0, s), i, t)
            for u, s, i, t in rows
        ],
        _EV,
    )


def test_symbol_histories_order_truncation_and_unmapped(spark):
    df = _events(
        spark,
        [
            (1, 3, 3, "purchase"),
            (1, 1, 1, "view"),
            (1, 2, 2, "mystery"),
            (2, 1, 4, "click"),
        ],
    )
    hist = {
        r["key"]: (r["n_events"], r["symbols"])
        for r in symbol_histories(
            df, "user", "ts", "et", "eid",
            symbols={"view": "v", "click": "c", "purchase": "p"},
            max_steps=2,
        ).collect()
    }
    # ordered by ts; unmapped -> '_'; truncated at 2 of 3 events
    # while n_events still reports the full count
    assert hist == {1: (3, "v_"), 2: (1, "c")}


def test_pattern_match_counts_non_overlapping(spark):
    df = _events(
        spark,
        [(1, i, i, t) for i, t in enumerate(
            ["error", "error", "error", "error", "view", "click",
             "purchase", "view", "click", "purchase"]
        )]
        + [(2, 1, 100, "error"), (2, 2, 101, "error")],
    )
    hist = symbol_histories(
        df, "user", "ts", "et", "eid",
        symbols={"view": "v", "click": "c", "purchase": "p", "error": "e"},
    )
    out = {
        r["pattern"]: (r["n_keys_matched"], r["total_matches"])
        for r in pattern_match_counts(
            hist, {"streak": "ee+", "conv": "vc+p"}
        ).collect()
    }
    # user 1: eeee -> ONE maximal-run match; vcp twice. user 2: ee once.
    assert out == {"streak": (2, 2), "conv": (1, 2)}


def test_pattern_and_symbol_validation(spark):
    df = _events(spark, [(1, 1, 1, "view")])
    with pytest.raises(ValueError, match="1 char"):
        symbol_histories(
            df, "user", "ts", "et", "eid", symbols={"view": "vv"}
        )
    hist = symbol_histories(
        df, "user", "ts", "et", "eid", symbols={"view": "v"}
    )
    with pytest.raises(ValueError, match="non-empty"):
        pattern_match_counts(hist, {})


def test_fingerprint_is_order_and_partition_insensitive(spark):
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(500)], "k bigint, v string"
    )
    a = table_fingerprint(df.repartition(7)).collect()[0]
    b = table_fingerprint(
        df.orderBy(F.desc("k")).coalesce(1)
    ).collect()[0]
    assert (a["n_rows"], a["fingerprint"]) == (500, b["fingerprint"])


def test_fingerprint_detects_single_value_change(spark):
    base = [(i, f"s{i}") for i in range(100)]
    df1 = spark.createDataFrame(base, "k bigint, v string")
    changed = base.copy()
    changed[42] = (42, "sX")
    df2 = spark.createDataFrame(changed, "k bigint, v string")
    f1 = table_fingerprint(df1).collect()[0]["fingerprint"]
    f2 = table_fingerprint(df2).collect()[0]["fingerprint"]
    assert f1 != f2


def test_fingerprint_merges_across_disjoint_parts(spark):
    """fingerprint(A ∪ B) == (fp(A) + fp(B)) mod 2^59 — the rollup
    property that lets per-partition fingerprints combine without
    re-reading data."""
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(300)], "k bigint, v string"
    )
    whole = table_fingerprint(df).collect()[0]["fingerprint"]
    lo = table_fingerprint(df.where("k < 100")).collect()[0]["fingerprint"]
    hi = table_fingerprint(df.where("k >= 100")).collect()[0]["fingerprint"]
    assert (lo + hi) % 2**59 == whole


def test_fingerprint_rejects_unlisted_doubles(spark):
    df = spark.createDataFrame([(1, 2.5)], "k bigint, x double")
    with pytest.raises(ValueError, match="decimal_cols"):
        table_fingerprint(df)
    # listed -> fine
    out = table_fingerprint(
        df, decimal_cols={"x": "DECIMAL(18,2)"}
    ).collect()[0]
    assert out["n_rows"] == 1


def test_column_profile_counts_and_render(spark):
    from top_produce_etl_spark.operators.profiling import column_profile

    df = spark.createDataFrame(
        [(1, "b"), (2, None), (2, "a")], "k bigint, s string"
    )
    out = {
        r["column"]: (
            r["n_rows"], r["n_null"], r["n_distinct"],
            r["min_str"], r["max_str"],
        )
        for r in column_profile(df).collect()
    }
    assert out == {
        "k": (3, 0, 2, "1", "2"),
        "s": (3, 1, 2, "a", "b"),
    }


def test_profile_drift_null_rate_delta(spark):
    from top_produce_etl_spark.operators.profiling import profile_drift

    old = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, s string")
    new = spark.createDataFrame(
        [(1, None), (2, None), (3, "z"), (4, "w")], "k bigint, s string"
    )
    out = {
        r["column"]: r["null_rate_delta_micro"]
        for r in profile_drift(old, new, ["k", "s"]).collect()
    }
    # s: 0% -> 50% nulls = +500000 micro; k unchanged
    assert out == {"k": 0, "s": 500_000}


def test_profile_rejects_raw_doubles(spark):
    import pytest as _pytest

    from top_produce_etl_spark.operators.profiling import column_profile

    df = spark.createDataFrame([(1.5,)], "x double")
    with _pytest.raises(ValueError, match="decimal"):
        column_profile(df)


def test_profile_drift_approx_twin_matches_except_ndv(spark):
    """The approx-NDV drift twin is bit-identical to the exact path
    on every column except ndv_old/ndv_new, and those stay within
    HLL error (±5% on a small frame)."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.profiling import profile_drift

    old = spark.range(1000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") % 97)
        .alias("v"),
    )
    new = spark.range(1200).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id") % 97)
        .alias("v"),
    )
    ex = {r["column"]: r.asDict() for r in
          profile_drift(old, new, ["k", "v"]).collect()}
    ap = {r["column"]: r.asDict() for r in
          profile_drift(old, new, ["k", "v"], exact_ndv=False).collect()}
    for c in ("k", "v"):
        for field, v in ex[c].items():
            if field.startswith("ndv_"):
                assert abs(ap[c][field] - v) <= max(2, int(v * 0.05))
            else:
                assert ap[c][field] == v, (c, field)


def test_cdc_chunks_realign_after_insertion(spark):
    """THE content-defined-chunking property: prepend one token to a
    document and the chunk multiset stays almost identical (edges
    realign after the edit), while fixed-stride windows all shift.
    Also pins 0-based per-doc chunk ids and full token coverage."""
    from top_produce_etl_spark.operators.chunking import (
        cdc_chunks,
        chunk_documents,
    )

    base = " ".join(f"w{i}" for i in range(400))  # all-distinct tokens
    docs = spark.createDataFrame(
        [(1, base), (2, "INSERTED " + base)], "doc_id long, text string"
    )
    out = cdc_chunks(docs, "doc_id", "text", target_tokens=16)
    rows = out.collect()
    a = sorted(r["chunk_text"] for r in rows if r["doc_id"] == 1)
    b = sorted(r["chunk_text"] for r in rows if r["doc_id"] == 2)
    shared = len(set(a) & set(b))
    assert shared >= len(a) - 2  # all but the edited head realigns
    # coverage: chunk token counts sum to the doc length
    assert sum(r["n_tokens"] for r in rows if r["doc_id"] == 1) == 400
    assert min(r["chunk_id"] for r in rows if r["doc_id"] == 1) == 0
    # contrast: fixed-stride chunking shares (almost) nothing
    fixed = chunk_documents(docs, "doc_id", "text", size=16, stride=16)
    fa = {r["chunk_text"] for r in fixed.collect() if r["doc_id"] == 1}
    fb = {r["chunk_text"] for r in fixed.collect() if r["doc_id"] == 2}
    assert len(fa & fb) <= 1


def test_cdc_chunks_xxhash_production_path(spark):
    """The xxhash64 hasher produces a valid chunking too (coverage +
    determinism); only the portable hasher is oracle-checkable."""
    from top_produce_etl_spark.operators.chunking import cdc_chunks

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i % 97}" for i in range(300)))],
        "doc_id long, text string",
    )
    a = cdc_chunks(docs, "doc_id", "text", 16, hasher="xxhash64").collect()
    b = cdc_chunks(docs, "doc_id", "text", 16, hasher="xxhash64").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r["n_tokens"] for r in a) == 300
