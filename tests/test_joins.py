"""Unit tests for join operators, focusing on the as-of join's edge
semantics (no Spark primitive exists — SURVEY.md §2.3)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.joins import (
    anti_join,
    asof_join,
    range_join,
    semi_join,
)


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_basic_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "L1"), (1, ts("2024-01-01 12:00"), "L2")],
        ["k", "lts", "lval"],
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 09:00"), "R9"),
            (1, ts("2024-01-01 11:00"), "R11"),
            (1, ts("2024-01-01 13:00"), "R13"),
        ],
        ["k", "rts", "rval"],
    )
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    got = {r["lval"]: (r["rval"], r["rts_asof"]) for r in out.collect()}
    assert got == {
        "L1": ("R9", ts("2024-01-01 09:00")),
        "L2": ("R11", ts("2024-01-01 11:00")),
    }


def test_asof_exact_timestamp_matches_inclusively(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00"))], ["k", "lts"])
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "same")], ["k", "rts", "rval"]
    )
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    assert out.collect()[0]["rval"] == "same"


def test_asof_no_prior_right_row_yields_null(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 08:00"))], ["k", "lts"])
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00"), "later")], ["k", "rts", "rval"]
    )
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    row = out.collect()[0]
    assert row["rval"] is None and row["rts_asof"] is None


def test_asof_keys_do_not_leak_across_partitions(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01 10:00"))], ["k", "lts"])
    right = spark.createDataFrame(
        [(2, ts("2024-01-01 09:00"), "otherkey")], ["k", "rts", "rval"]
    )
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
    assert out.collect()[0]["rval"] is None


def test_asof_forward_earliest_at_or_after(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "L1"), (1, ts("2024-01-01 12:00"), "L2"),
         (1, ts("2024-01-01 14:00"), "L3")],
        ["k", "lts", "lval"],
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01 10:00"), "R10"),  # equal ts matches forward
            (1, ts("2024-01-01 13:00"), "R13"),
        ],
        ["k", "rts", "rval"],
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        direction="forward",
    )
    got = {r["lval"]: r["rval"] for r in out.collect()}
    assert got == {"L1": "R10", "L2": "R13", "L3": None}


def test_asof_nearest_ties_to_backward(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "L1"),   # back 1h, fwd 2h -> back
         (1, ts("2024-01-01 12:30"), "L2"),   # back 3.5h, fwd 0.5h -> fwd
         (1, ts("2024-01-01 11:00"), "L3")],  # back 2h, fwd 2h tie -> back
        ["k", "lts", "lval"],
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00"), "R9"), (1, ts("2024-01-01 13:00"), "R13")],
        ["k", "rts", "rval"],
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        direction="nearest",
    )
    got = {r["lval"]: r["rval"] for r in out.collect()}
    assert got == {"L1": "R9", "L2": "R13", "L3": "R9"}


def test_asof_tolerance_inclusive_boundary(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "at"),    # lag exactly 1h -> kept
         (1, ts("2024-01-01 10:01"), "past")], # lag 61min -> nulled
        ["k", "lts", "lval"],
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00"), "R9")], ["k", "rts", "rval"]
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        tolerance=3600,
    )
    got = {r["lval"]: (r["rval"], r["rts_asof"]) for r in out.collect()}
    assert got == {
        "at": ("R9", ts("2024-01-01 09:00")),
        "past": (None, None),
    }
    # every left row survives regardless of tolerance (left join)
    assert out.count() == 2


def test_asof_rejects_bad_direction(spark):
    import pytest

    left = spark.createDataFrame([(1, ts("2024-01-01 10:00"))], ["k", "lts"])
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, left, on="k", left_ts="lts", right_ts="lts",
                  direction="sideways")


def test_range_join_bounds(spark):
    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 15)], ["k", "x"]
    )
    right = spark.createDataFrame([(1, 5, 15)], ["k", "lo", "hi"])
    out = range_join(left, right, ["k"], "x", "lo", "hi")
    # lo inclusive, hi exclusive
    assert sorted(r["x"] for r in out.collect()) == [5, 10]


def test_semi_anti_partition(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2,), (3,), (4,)], ["k"])
    semi = {r["k"] for r in semi_join(left, right, "k").collect()}
    anti = {r["k"] for r in anti_join(left, right, "k").collect()}
    assert semi == {2, 3} and anti == {1}
    assert semi | anti == {1, 2, 3}  # semi ∪ anti = left


def test_attach_scalar_row_is_hash_join_and_null_safe(spark):
    """attach_scalar_row must (a) plan a BroadcastHashJoin — never a
    nested-loop/cartesian (the reason it exists), (b) not drop rows
    whose key column is NULL (the key coalesces)."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.joins import attach_scalar_row
    from top_produce_etl_spark.plans.audit import plan_audit

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "v bigint"
    )
    one = spark.createDataFrame([(10,)], "total bigint")
    out = attach_scalar_row(df, one, "v", "total")
    assert out.count() == 3  # NULL-keyed row survives
    assert {r["total"] for r in out.collect()} == {10}
    audit = plan_audit(out)
    assert not audit["cartesian"]
