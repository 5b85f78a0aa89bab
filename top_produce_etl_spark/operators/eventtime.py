"""Event-time operators (SURVEY.md §2.9) — batch-first, with
semantics identical to Structured Streaming's windowed aggregations,
so the same transform functions run under ``readStream`` unchanged
(streaming.jobs wires that up).

Windows align to the Unix epoch (Spark's contract for ``F.window``);
session windows use Spark's [start, last_event + gap) semantics —
an event exactly ``gap`` after the previous one starts a NEW session
(window end is exclusive).

Scale notes: tumbling/sliding aggregation is a plain hash aggregate
on (window, keys) — partial map-side agg applies; a sliding window
with overlap k multiplies shuffle rows by k (here 2×), which is the
real cost knob at 100 TB. Session windows shuffle on the session
key; skewed users are the risk case (AQE skew handling applies to
the shuffle, while a single user's session chain still sorts in one
task — same tradeoff as any per-key ordered computation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Fixed, non-overlapping event-time windows."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("win"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide
    windows (Spark expands them before the aggregate — shuffle
    volume scales with the overlap factor)."""
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("win"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("win.start"))
        .withColumn("window_end", F.col("win.end"))
        .drop("win")
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Gap-based session windows per key: session = maximal run of
    events where consecutive gaps are < ``gap``."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("win"), *keys)
        .agg(*aggs)
        .withColumn("session_start", F.col("win.start"))
        .withColumn("session_end", F.col("win.end"))
        .drop("win")
    )


def dedup_first_by_time(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak: str
) -> DataFrame:
    """Deterministic keep-first-by-event-time dedup — the batch
    equivalent of streaming ``withWatermark().dropDuplicates(keys)``
    but with a defined winner (earliest ts, then tiebreak), where
    ``dropDuplicates`` alone keeps an arbitrary row."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def with_watermark_batch(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Watermark declaration seam: a no-op in batch (Spark ignores
    watermarks outside streaming) kept so pipelines declare lateness
    bounds once and run unchanged under readStream."""
    return df.withWatermark(ts_col, delay) if df.isStreaming else df


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    tracked across subsequent weeks.

    Output: (cohort_week, week_offset, n_active, retention) where
    cohort_week = date_trunc('week', first event ts) per user,
    week_offset = whole weeks between cohort_week and the activity
    week, n_active = distinct users of that cohort active at that
    offset, retention = n_active / cohort size (offset-0 count —
    every user is active in their own first week by construction).

    Scale shape: two key shuffles. (1) min-ts per user — map-side
    partial min, |users| rows out; the per-user activity distinct
    reuses the SAME user-keyed exchange (Catalyst co-partitions the
    join). (2) the (cohort, offset) aggregate over |users × active
    weeks| rows. The offset-0 cohort size comes from a window over
    the already-tiny matrix, not a re-scan.
    """
    wk = lambda c: F.date_trunc("week", c)  # noqa: E731
    first = df.groupBy(user_col).agg(
        wk(F.min(ts_col)).alias("cohort_week")
    )
    active = df.select(
        F.col(user_col), wk(F.col(ts_col)).alias("__wk")
    ).distinct()
    matrix = (
        active.join(first, user_col)
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("__wk"), F.col("cohort_week"))
                / F.lit(period_days)
            )
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_active"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cohort_week")
    size0 = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(w)
    return matrix.withColumn(
        "retention",
        (F.col("n_active").cast("double") / size0.cast("double")),
    )
