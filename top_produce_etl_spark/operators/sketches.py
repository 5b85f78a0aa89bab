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


def binned_histogram(
    df: DataFrame,
    grain_expr,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """The STORED quantile rollup: fixed-bin counts of ``value_col``
    per time grain — the deterministic, fully mergeable stand-in for
    a t-digest (same role HLL plays for COUNT DISTINCT: store
    per-day summaries, answer any coarser grain without re-scanning
    the raw stream). Bin counts are exact integers, so unlike real
    t-digests the WHOLE pipeline — merge included — is
    oracle-checkable.

    Output: (grain, bin, cnt). Values outside [lo, hi) clamp into
    the edge bins, so totals are preserved. One hash-agg shuffle of
    |grains × bins| rows; map-side partial agg does the rest.
    """
    width = (hi - lo) / n_bins
    b = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.select(grain_expr.alias("grain"), b.alias("bin"))
        .groupBy("grain", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histograms(hist: DataFrame, regroup_expr) -> DataFrame:
    """Merge fine-grain histograms to a coarser grain — plain count
    addition (associative/exact), the step real quantile sketches
    approximate."""
    return (
        hist.select(regroup_expr.alias("grain"), "bin", "cnt")
        .groupBy("grain", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 128,
) -> DataFrame:
    """Interpolated quantile estimates from a binned histogram:
    est(q) = bin_lo + width · (q·N − cum_before) / bin_cnt for the
    first bin whose cumulative count reaches q·N. In-bin
    interpolation error ≤ one bin width by construction; versus
    ORDER-STATISTIC percentiles (a different position convention)
    add one local inter-point gap — negligible when bins hold many
    points, dominant on near-empty groups (pinned in tests on the
    dense grain). Window + filter over
    |grains × bins| rows — nothing touches raw data. Output:
    (grain, n, one est_<q> column per quantile)."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = (
        Window.partitionBy("grain")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("grain")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    out = cum.select("grain", "n").distinct()
    for q in quantiles:
        target = F.lit(float(q)) * F.col("n").cast("double")
        hit = (
            cum.filter(
                (F.col("cum").cast("double") >= target)
                & ((F.col("cum") - F.col("cnt")).cast("double") < target)
            )
            .select(
                "grain",
                (
                    F.lit(lo)
                    + F.col("bin").cast("double") * F.lit(width)
                    + F.lit(width)
                    * (target - (F.col("cum") - F.col("cnt")).cast("double"))
                    / F.col("cnt").cast("double")
                ).alias(f"est_p{int(q * 100)}"),
            )
        )
        out = out.join(hit, "grain")
    return out


def hll_rolling_estimate(
    daily: DataFrame, window_days: int = 7
) -> DataFrame:
    """Rolling distinct-count estimates from STORED daily sketches:
    ``hll_union_agg`` over a ROWS window frame unions each day's
    trailing ``window_days`` sketches, then estimates — the
    "7-day active users" metric computed from |days| sketch rows
    instead of re-scanning the raw stream per day (at 100 TB the
    naive version re-reads a week of events for every day of
    output; this reads 2^lgk bytes × window per day).

    Single-series window (ordered by day): the input is the DAILY
    ROLLUP — bounded at |days| rows — so it rides one tiny exchange,
    keyed here by a constant-free sort; callers with per-tenant
    rollups should partition the window by tenant.

    Calendar semantics: the frame is a RANGE over the day's epoch
    number, so each output day unions exactly the sketches within
    the trailing ``window_days`` CALENDAR days — a gap in the daily
    rollup (no events that day) narrows the union instead of
    silently pulling older days into it, which is what the previous
    ROWS formulation did on sparse inputs (round-4 advice).
    """
    from pyspark.sql import Window

    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    w = (
        Window.orderBy("__day_epoch")
        .rangeBetween(-(window_days - 1), Window.currentRow)
    )
    return (
        daily.withColumn(
            "__day_epoch", F.datediff(F.col("day"), F.lit("1970-01-01"))
        )
        .select(
            "day",
            F.hll_sketch_estimate(F.hll_union_agg("sketch").over(w)).alias(
                f"est_distinct_{window_days}d"
            ),
        )
    )
