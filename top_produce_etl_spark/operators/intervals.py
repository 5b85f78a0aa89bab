"""Interval sweep-line aggregation: how many intervals are open at
once, per calendar day — the "orders in flight / shipments in
transit / concurrent sessions" family.

Reference parity: the reference's transform core
(src/transform/core.py) is empty; interval analytics are part of the
beyond-reference operations tier the round briefs ask for.

Scale shape — why a sweep line and not a range join: the naive
formulation ("join every day against every interval covering it")
is an interval join whose output is |days covered| × |intervals| —
quadratic-ish blowup on long intervals. The sweep line is linear:
each interval contributes exactly TWO delta events (+1 at start,
-1 one grain past the end, half-open), the deltas hash-aggregate to
day grain (ONE data-sized shuffle with map-side combine), and the
running sum that turns deltas into open-counts operates on the
|days|-row rollup — bounded by calendar span, not by data. That
final single-series window is the same documented shape as
operators/sketches.py::hll_rolling_estimate (the plan-audit
unpartitioned-window rule's exemption precedent): a cumulative sum
over one calendar series cannot be partitioned without breaking the
accumulation at partition edges, and its input cannot exceed the
number of days in the data's time span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_deltas(
    df: DataFrame,
    start_col: str,
    end_col: str,
    out_day: str = "day",
    out_delta: str = "delta",
) -> DataFrame:
    """Explode intervals into per-day delta events: +1 on the start
    day, -1 on the day AFTER the end day (half-open [start, end+1) —
    an interval ending on day D still counts as open on D), then
    hash-aggregate to (day, net delta). Rows with a NULL start are
    dropped; a NULL end means the interval never closes (no -1).

    One shuffle, map-side combined; output is at most 2 rows per
    distinct day present.
    """
    start_day = F.to_date(F.col(start_col))
    end_day = F.to_date(F.col(end_col))
    opens = df.where(start_day.isNotNull()).select(
        start_day.alias(out_day), F.lit(1).alias(out_delta)
    )
    # a row dropped for a NULL start must not leave a dangling -1
    closes = df.where(start_day.isNotNull() & end_day.isNotNull()).select(
        F.date_add(end_day, 1).alias(out_day),
        F.lit(-1).alias(out_delta),
    )
    return (
        opens.unionByName(closes)
        .groupBy(out_day)
        .agg(F.sum(out_delta).cast("bigint").alias(out_delta))
    )


def daily_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    out_day: str = "day",
    out_open: str = "n_open",
) -> DataFrame:
    """Per-day count of open intervals, at event-day grain: one row
    per day on which the open-count CHANGES (between listed days the
    count is constant at the previous row's value — callers that
    need a dense series compose with operators/quality.py-style
    gapfill). Output: (day, delta, n_open), deterministic and
    total-ordered by day.

    Plan: interval_deltas' single data-sized shuffle, then a
    cumulative sum over the |days|-row delta rollup (single-series
    global window — see module docstring for why this is bounded
    and exempt from the unpartitioned-window audit rule).
    """
    deltas = interval_deltas(df, start_col, end_col, out_day=out_day)
    w = Window.orderBy(out_day).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return deltas.select(
        out_day,
        "delta",
        F.sum("delta").over(w).cast("bigint").alias(out_open),
    )


def peak_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The maximum number of simultaneously-open intervals, overall
    or per group: (group…, peak_open, peak_day) where peak_day is
    the EARLIEST day the peak is attained (deterministic tiebreak).

    Grouped variant partitions the running sum by group — fully
    parallel; the global variant inherits daily_concurrency's
    |days|-row single-series window.
    """
    gs = group_cols or []
    start_day = F.to_date(F.col(start_col))
    end_day = F.to_date(F.col(end_col))
    opens = df.where(start_day.isNotNull()).select(
        *gs, start_day.alias("day"), F.lit(1).alias("delta")
    )
    closes = df.where(start_day.isNotNull() & end_day.isNotNull()).select(
        *gs, F.date_add(end_day, 1).alias("day"), F.lit(-1).alias("delta")
    )
    deltas = (
        opens.unionByName(closes)
        .groupBy(*gs, "day")
        .agg(F.sum("delta").cast("bigint").alias("delta"))
    )
    w = (
        (Window.partitionBy(*gs) if gs else Window.partitionBy())
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = deltas.select(
        *gs, "day", F.sum("delta").over(w).cast("bigint").alias("n_open")
    )
    return running.groupBy(*gs).agg(
        F.max("n_open").alias("peak_open"),
        F.max_by(
            "day",
            F.struct(
                F.col("n_open").alias("o"),
                (F.lit(0) - F.unix_date(F.col("day"))).alias("neg_day"),
            ),
        ).alias("peak_day"),
    )
