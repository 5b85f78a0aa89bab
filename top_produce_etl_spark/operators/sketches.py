"""Mergeable cardinality sketches (SURVEY.md §2.4 approx-distinct
row, extended to the hypertable-rollup pattern).

``hierarchical_rollup_monthly`` (queries/eventtime.py) proves
count/sum partials re-aggregate losslessly; COUNT DISTINCT does not
— distincts aren't summable — so the stored-rollup pattern needs a
mergeable sketch. Spark 4 ships Apache DataSketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``),
so the daily table stores |days| binary sketches and any coarser
grain (month, quarter, lifetime) is a cheap union over them — no
re-scan of the raw 100 TB stream. Union is LOSSLESS at equal
lgConfigK: estimating a union of daily sketches returns the exact
same number as sketching the raw rows directly (pinned in
tests/test_sketches.py), so the rollup's error budget is exactly
the base sketch's (~1.6% rel. std. error at lgConfigK=12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LG_CONFIG_K = 12  # DataSketches default: ~1.6% relative std error


def hll_daily_sketches(
    df: DataFrame, ts_col: str, key_col: str, lgk: int = LG_CONFIG_K
) -> DataFrame:
    """The STORED daily rollup: one HLL sketch of ``key_col`` per
    day. One hash-agg shuffle keyed on the day — sketch partials
    merge map-side, so shuffled bytes are |partitions × days| ×
    2^lgk, independent of row count."""
    return df.groupBy(F.date_trunc("day", ts_col).alias("day")).agg(
        F.hll_sketch_agg(key_col, lgk).alias("sketch")
    )


def hll_rollup_estimate(
    daily: DataFrame, grain_col: str = "month_start"
) -> DataFrame:
    """Re-aggregate stored daily sketches to monthly distinct-count
    estimates: union the sketches, then estimate — the continuous-
    aggregate read path (|days| input rows, never the raw stream)."""
    return daily.groupBy(
        F.date_trunc("month", "day").alias(grain_col)
    ).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_distinct")
    )
