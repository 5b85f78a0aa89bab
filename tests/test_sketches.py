"""HLL sketch-rollup properties (operators/sketches.py): the
mergeable-sketch answer to COUNT DISTINCT in the stored-rollup
pattern."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.sketches import (
    LG_CONFIG_K,
    hll_daily_sketches,
    hll_rollup_estimate,
)


def test_union_of_daily_sketches_is_lossless(spark, sf_dir):
    """Estimating the union of per-day sketches must return EXACTLY
    the same number as sketching the raw month directly — HLL merge
    at equal lgConfigK is lossless, which is what makes the stored
    daily rollup safe to serve coarser grains from."""
    events = load_table(spark, sf_dir, "events")
    rolled = {
        r["month_start"]: r["est_distinct"]
        for r in hll_rollup_estimate(
            hll_daily_sketches(events, "ts", "user_id")
        ).collect()
    }
    direct = {
        r["month_start"]: r["est"]
        for r in events.groupBy(F.date_trunc("month", "ts").alias("month_start"))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", LG_CONFIG_K)
            ).alias("est")
        )
        .collect()
    }
    assert rolled == direct and len(rolled) > 0


def test_sketch_estimate_within_error_bound(spark, sf_dir):
    """lgConfigK=12 gives ~1.6% relative standard error; assert the
    fixture stays within 3 sigma of exact on every month."""
    from top_produce_etl_spark.queries import get_all_queries

    out = get_all_queries()["sketch_distinct_rollup"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # r7 battery shape: the band and lossless-union checks are
        # emitted as flags (and oracle-verified TRUE per run)
        assert r["rollup_in_band"], r["month_start"]
        assert r["rollup_near_direct"], r["month_start"]


def test_rolling_hll_matches_exact_in_sparse_regime(spark, sf_dir):
    """Trailing-7-day sketch union == exact trailing distinct at
    fixture cardinalities (sparse/exact HLL regime) — and monotone
    vs the 1-day estimate."""
    import pyspark.sql.functions as F

    from top_produce_etl_spark.io.sources import load_table
    from top_produce_etl_spark.operators.sketches import (
        hll_daily_sketches,
        hll_rolling_estimate,
    )

    events = load_table(spark, sf_dir, "events")
    daily = hll_daily_sketches(events, "ts", "user_id")
    r7 = {
        r.day: r.est_distinct_7d
        for r in hll_rolling_estimate(daily, 7).collect()
    }
    r1 = {
        r.day: r.est_distinct_1d
        for r in hll_rolling_estimate(daily, 1).collect()
    }
    exact = {
        r.day: r.n
        for r in events.select(
            F.date_trunc("day", "ts").alias("day"), "user_id"
        )
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert r1 == exact  # 1-day window: sketch est == exact distinct
    assert all(r7[d] >= r1[d] for d in r7)  # union only grows


def test_rolling_hll_calendar_range_on_sparse_days(spark):
    """A gap in the daily rollup must NARROW the trailing window, not
    pull older days into it (RANGE-over-epoch-day frame; round-4
    advice: the ROWS formulation spanned >window_days calendar days
    on sparse inputs)."""
    from top_produce_etl_spark.operators.sketches import (
        hll_daily_sketches,
        hll_rolling_estimate,
    )

    # users 1,2 on Jan 1; user 3 on Jan 2; user 4 on Jan 10 — the
    # trailing-7d window at Jan 10 covers Jan 4-10 → only user 4
    events = spark.createDataFrame(
        [
            ("2024-01-01 08:00:00", 1),
            ("2024-01-01 09:00:00", 2),
            ("2024-01-02 08:00:00", 3),
            ("2024-01-10 08:00:00", 4),
        ],
        "ts_s string, user_id int",
    ).selectExpr("CAST(ts_s AS TIMESTAMP) AS ts", "user_id")
    daily = hll_daily_sketches(events, "ts", "user_id")
    got = {
        str(r.day)[:10]: r.est_distinct_7d
        for r in hll_rolling_estimate(daily, 7).collect()
    }
    assert got == {"2024-01-01": 2, "2024-01-02": 3, "2024-01-10": 1}
