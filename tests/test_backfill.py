"""Backfill orchestrator: gap diffing, surgical writes, idempotence."""

from __future__ import annotations

import datetime as dt
import glob
import os

from pyspark.sql import functions as F

from top_produce_etl_spark.plans.backfill import (
    backfill_daily,
    existing_partitions,
)

D = dt.date


def _compute(spark, day):
    return spark.range(0, 10).select(
        F.lit(day.isoformat()).alias("day"),
        (F.col("id") + day.day).alias("v"),
    )


def test_backfill_computes_only_the_gap(spark, tmp_path):
    out = str(tmp_path / "t")
    calls = []

    def compute(s, day):
        calls.append(day)
        return _compute(s, day)

    # seed days 1-3
    r1 = backfill_daily(spark, compute, out, D(2025, 1, 1), D(2025, 1, 3))
    assert r1["computed"] == ["2025-01-01", "2025-01-02", "2025-01-03"]
    snap = {
        f: os.path.getmtime(f) for f in glob.glob(f"{out}/day=*/*.parquet")
    }

    # extend range: only 4-5 computed, 1-3 untouched on disk
    calls.clear()
    r2 = backfill_daily(spark, compute, out, D(2025, 1, 1), D(2025, 1, 5))
    assert r2["computed"] == ["2025-01-04", "2025-01-05"]
    assert r2["skipped"] == ["2025-01-01", "2025-01-02", "2025-01-03"]
    assert [d.day for d in calls] == [4, 5]
    snap2 = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{out}/day=2025-01-0[123]/*.parquet")
    }
    assert snap == snap2  # surgical: existing partitions untouched

    got = spark.read.parquet(out)
    assert got.select("day").distinct().count() == 5
    assert got.count() == 50
    assert existing_partitions(spark, out) == {
        f"2025-01-0{i}" for i in range(1, 6)
    }


def test_backfill_force_and_validation(spark, tmp_path):
    import pytest

    out = str(tmp_path / "t2")
    backfill_daily(spark, _compute, out, D(2025, 2, 1), D(2025, 2, 2))
    r = backfill_daily(
        spark, _compute, out, D(2025, 2, 1), D(2025, 2, 2), force=True
    )
    assert r["computed"] == ["2025-02-01", "2025-02-02"]
    with pytest.raises(ValueError, match="before start"):
        backfill_daily(spark, _compute, out, D(2025, 2, 2), D(2025, 2, 1))
    with pytest.raises(ValueError, match="partition column"):
        backfill_daily(
            spark,
            lambda s, d: s.range(1),
            str(tmp_path / "t3"),
            D(2025, 2, 1),
            D(2025, 2, 1),
        )
