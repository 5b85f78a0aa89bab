"""Event-time tier queries (SURVEY.md §2.9) over the ``events``
fixture: tumbling / sliding / session windows + time-based dedup.

Oracles reconstruct Spark's epoch-aligned window math in ANSI SQL:
tumbling = date_trunc; sliding = union of phase-shifted tumblings;
session = gap-and-island via lag + running sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.numeric import dec, money_sum
from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.eventtime import (
    dedup_first_by_time,
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from top_produce_etl_spark.queries import query


@query(
    "tumbling_daily_by_type", extended=True,
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)                 AS window_start,
           CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_daily_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = tumbling_window_agg(
        events,
        "ts",
        "1 day",
        ["event_type"],
        [F.count(F.lit(1)).alias("n_events"), money_sum("value", "sum_value")],
    )
    return out.select("window_start", "window_end", "event_type", "n_events", "sum_value")


@query(
    "sliding_daily_12h", extended=True,
    oracle="""
    WITH phased AS (
        SELECT TIMESTAMP '1970-01-01'
                 + (CAST(floor((epoch(ts) - p.off) / 86400) AS BIGINT) * 86400 + p.off)
                   * INTERVAL '1 second' AS window_start,
               value
        FROM events
        CROSS JOIN (VALUES (0), (43200)) p(off)
    )
    SELECT window_start,
           window_start + INTERVAL 1 DAY AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM phased
    GROUP BY 1, 2
    """,
)
def sliding_daily_12h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day windows sliding every 12h — every event in exactly 2
    windows; the oracle expresses the same thing as a union of two
    phase-shifted tumbling windows."""
    events = load_table(spark, sf_dir, "events")
    out = sliding_window_agg(
        events,
        "ts",
        "1 day",
        "12 hours",
        [],
        [F.count(F.lit(1)).alias("n_events"), money_sum("value", "sum_value")],
    )
    return out.select("window_start", "window_end", "n_events", "sum_value")


@query(
    "session_windows_30m", extended=True,
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS sess_id
        FROM marked
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sess_id
    """,
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 30-minute inactivity gap.
    Spark's [start, last+gap) semantics: a gap of exactly 30 min
    starts a new session — the oracle's island detection uses >=
    to match."""
    events = load_table(spark, sf_dir, "events")
    out = session_window_agg(
        events, "ts", "30 minutes", ["user_id"], [F.count(F.lit(1)).alias("n_events")]
    )
    return out.select("user_id", "session_start", "session_end", "n_events")


@query(
    "dedup_first_event_per_user_type",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM (
        SELECT event_id, user_id, event_type, ts,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def dedup_first_event_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the earliest event per (user, type) — deterministic
    time-based dedup (streaming dropDuplicates parity, §2.9)."""
    events = load_table(spark, sf_dir, "events")
    out = dedup_first_by_time(
        events.select("event_id", "user_id", "event_type", "ts"),
        keys=["user_id", "event_type"],
        ts_col="ts",
        tiebreak="event_id",
    )
    return out.select("event_id", "user_id", "event_type", "ts")


@query(
    "hierarchical_rollup_monthly", extended=True,
    oracle="""
    SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def hierarchical_rollup_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate pattern: the monthly
    answer is derived by RE-AGGREGATING materialized daily partials
    (count-sum / decimal-sum are associative and exact, so partial →
    total loses nothing), while the oracle aggregates the raw events
    directly — the check proves the two-level rollup is lossless.
    At scale the daily table is the stored rollup (|days × types|
    rows); month/quarter/year queries read it instead of the raw
    stream, and the decimal representation is what makes that
    re-aggregation safe."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value")).alias("sv"),  # stays decimal: re-aggregatable
    )
    return (
        daily.groupBy(
            F.date_trunc("month", "day").alias("month_start"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sv").cast("double").alias("sum_value"),
        )
    )


@query(
    "funnel_view_to_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
    ), p AS (
        SELECT user_id, ts AS buy_ts FROM events WHERE event_type = 'purchase'
    ), conv AS (
        SELECT DISTINCT v.user_id,
               CAST(date_trunc('day', v.view_ts) AS TIMESTAMP) AS day
        FROM v JOIN p ON v.user_id = p.user_id
         AND p.buy_ts >= v.view_ts
         AND p.buy_ts <  v.view_ts + INTERVAL 1 HOUR
    ), views AS (
        SELECT CAST(date_trunc('day', view_ts) AS TIMESTAMP) AS day,
               COUNT(DISTINCT user_id) AS viewers
        FROM v GROUP BY 1
    )
    SELECT views.day, views.viewers,
           COALESCE(c.converters, 0) AS converters
    FROM views LEFT JOIN (
        SELECT day, COUNT(*) AS converters FROM conv GROUP BY day
    ) c ON views.day = c.day
    """,
)
def funnel_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel: per day, distinct viewers and how many
    converted (purchase within 1 hour of a view). The sequence
    constraint is a time-bounded self-join on user — the same shape
    the stream-stream attribution job runs incrementally
    (streaming/jobs.py), here with the conversion dedup + two-level
    counts a funnel report needs. User-keyed joins shuffle on
    user_id; the time bound keeps the pair count linear in events
    per user-hour, not quadratic in history."""
    events = load_table(spark, sf_dir, "events")
    v = events.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("ts").alias("view_ts")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("buy_ts")
    )
    conv = (
        v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("buy_ts") >= F.col("view_ts"))
            & (F.col("buy_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("user_id", F.date_trunc("day", "view_ts").alias("day"))
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("converters"))
    )
    views = v.groupBy(F.date_trunc("day", "view_ts").alias("day")).agg(
        F.countDistinct("user_id").alias("viewers")
    )
    return (
        views.join(conv, "day", "left")
        .select(
            "day", "viewers",
            F.coalesce("converters", F.lit(0)).alias("converters"),
        )
    )


@query(
    "funnel_3step_strict", extended=True,
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click'
          AND e.ts > s1.t1 AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
        WHERE e.event_type = 'purchase'
          AND e.ts > s2.t2 AND e.ts <= s1.t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    )
    SELECT s1.user_id,
           CASE WHEN t3 IS NOT NULL THEN 3
                WHEN t2 IS NOT NULL THEN 2
                ELSE 1 END AS step_reached,
           s1.t1 AS first_ts,
           COALESCE(t3, t2, s1.t1) AS last_ts
    FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
    """,
)
def funnel_3step_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict 3-step ordered funnel view→click→purchase within 7
    days of the first view (operators/eventtime.py::ordered_funnel —
    ClickHouse-windowFunnel semantics as chained user-keyed
    min-aggregates, no per-user sort, no Python). The oracle unrolls
    the same chain as CTEs."""
    from top_produce_etl_spark.operators.eventtime import ordered_funnel

    events = load_table(spark, sf_dir, "events")
    return ordered_funnel(
        events, "user_id", "ts", "event_type",
        steps=["view", "click", "purchase"], within="7 DAYS",
    )


@query(
    "event_transition_matrix", extended=True,
    oracle="""
    WITH seq AS (
        SELECT event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev
        FROM events
    ), trans AS (
        SELECT prev AS prev_type, event_type AS next_type,
               COUNT(*) AS n
        FROM seq WHERE prev IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE) /
           CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
    FROM trans
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix with row-normalized
    probabilities (operators/eventtime.py::transition_matrix): one
    user-keyed exchange for the lag window, then |types|²-row
    aggregates — the classic behavioral-model feature at any scale."""
    from top_produce_etl_spark.operators.eventtime import transition_matrix

    events = load_table(spark, sf_dir, "events")
    return transition_matrix(events, "user_id", "ts", "event_type", "event_id")


@query(
    "gapfill_daily_counts_zero", extended=True,
    oracle="""
    WITH b AS (
        SELECT user_id, date_trunc('day', ts) AS day_ts, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT user_id, MIN(day_ts) AS lo, MAX(day_ts) AS hi
        FROM b GROUP BY 1
    ), grid AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day_ts
        FROM r
    )
    SELECT g.user_id, g.day_ts,
           COALESCE(b.n, 0) AS n,
           b.n IS NULL AS is_gap
    FROM grid g LEFT JOIN b USING (user_id, day_ts)
    """,
)
def gapfill_daily_counts_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series densification (hypertable time_bucket_gapfill
    shape): per-user daily event counts on a regular grid with
    zero-filled holes (operators/eventtime.py::gapfill)."""
    from top_produce_etl_spark.operators.eventtime import gapfill

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day_ts"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return gapfill(daily, "user_id", "day_ts", "n", step="1 day", fill="zero")


@query(
    "gapfill_daily_value_locf", extended=True,
    oracle="""
    WITH b AS (
        SELECT user_id, date_trunc('day', ts) AS day_ts,
               MAX(value) AS peak_value
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT user_id, MIN(day_ts) AS lo, MAX(day_ts) AS hi
        FROM b GROUP BY 1
    ), grid AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day_ts
        FROM r
    ), holes AS (
        SELECT g.user_id, g.day_ts, b.peak_value,
               b.peak_value IS NULL AS is_gap
        FROM grid g LEFT JOIN b USING (user_id, day_ts)
    )
    SELECT user_id, day_ts,
           last_value(peak_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS peak_value,
           is_gap
    FROM holes
    """,
)
def gapfill_daily_value_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with last-observation-carried-forward — the
    gauge/state-metric variant (operators/eventtime.py::gapfill)."""
    from top_produce_etl_spark.operators.eventtime import gapfill

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day_ts"))
        .agg(F.max("value").alias("peak_value"))
    )
    return gapfill(
        daily, "user_id", "day_ts", "peak_value", step="1 day", fill="locf"
    )


@query(
    "multi_touch_attribution_position", extended=True,
    oracle="""
    WITH c AS (
        SELECT event_id AS purchase_id, user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ), t AS (
        SELECT event_id AS click_id, user_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ), joined AS (
        SELECT c.purchase_id, t.click_id, c.value, t.click_ts
        FROM c JOIN t
          ON c.user_id = t.user_id
         AND t.click_ts >= c.ts - INTERVAL 7 DAY
         AND t.click_ts < c.ts
    ), ranked AS (
        SELECT purchase_id, click_id, value,
               ROW_NUMBER() OVER (PARTITION BY purchase_id
                                  ORDER BY click_ts, click_id)
                   AS touch_rank,
               COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
        FROM joined
    )
    SELECT purchase_id, click_id, touch_rank, n_touches,
           CAST(round(w * 1000000) AS BIGINT) AS weight_micro,
           CAST(round(value * w * 1000000) AS BIGINT) AS attributed_micro
    FROM (
        SELECT *,
               CASE WHEN n_touches = 2 THEN 0.5
                    WHEN n_touches = 1 THEN 1.0
                    WHEN touch_rank = 1 OR touch_rank = n_touches THEN 0.4
                    ELSE 0.2 / (CAST(n_touches AS DOUBLE) - 2.0)
               END AS w
        FROM ranked
    )
    """,
)
def multi_touch_attribution_position(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """U-shaped multi-touch attribution: every click within 7 days
    of a purchase gets fractional credit (40/20/40)
    (operators/attribution.py). Completes the attribution family:
    as-of join = last touch, funnel = path existence."""
    from top_produce_etl_spark.operators.attribution import (
        multi_touch_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts", "value"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    return multi_touch_attribution(
        purchases, clicks,
        user_col="user_id", conv_id="purchase_id", conv_ts="ts",
        value_col="value", touch_id="click_id", touch_ts="ts",
        lookback="7 days", model="position",
    )


@query(
    "rolling_active_users_7d", extended=True,
    oracle="""
    WITH b AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               user_id
        FROM events
    ), days AS (SELECT DISTINCT day FROM b)
    SELECT d.day,
           CAST(COUNT(DISTINCT b.user_id) AS BIGINT) AS est_distinct_7d
    FROM days d
    JOIN b ON b.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
    GROUP BY d.day
    """,
)
def rolling_active_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users from STORED daily HLL sketches
    (operators/sketches.py::hll_rolling_estimate): union over a
    ROWS frame instead of re-scanning a week of raw events per
    output day. Oracle is the exact trailing distinct — equal here
    because the per-window cardinality sits in the sketch's exact
    (sparse) regime, the same est==direct contract
    sketch_distinct_rollup pins."""
    from top_produce_etl_spark.operators.sketches import (
        hll_daily_sketches,
        hll_rolling_estimate,
    )

    events = load_table(spark, sf_dir, "events")
    return hll_rolling_estimate(
        hll_daily_sketches(events, "ts", "user_id"), 7
    )


@query(
    "conversion_lag_histogram", extended=True,
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'
    ), v AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    ), prior AS (
        SELECT p.event_id, p.ts AS pts, MAX(v.ts) AS vts
        FROM p LEFT JOIN v
          ON v.user_id = p.user_id AND v.ts <= p.ts
        GROUP BY p.event_id, p.ts
    )
    SELECT CASE WHEN vts IS NULL
                  OR date_diff('second', vts, pts) > 259200 THEN NULL
                ELSE date_diff('second', vts, pts) // 3600
           END AS lag_hours,
           COUNT(*) AS n
    FROM prior GROUP BY 1
    """,
)
def conversion_lag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: each purchase matched to the
    LATEST prior view via the as-of join's TOLERANCE path
    (operators/joins.py merge_asof semantics), lag bucketed to whole
    hours, exact counts (mergeable histogram, the repo's quantile
    convention). The 72-hour attribution window is the tolerance:
    purchases with no prior view OR whose last view is staler than
    the window land in the NULL bucket — never-viewed plus expired,
    the standard attribution-window semantics."""
    from top_produce_etl_spark.operators.joins import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts"
    )
    matched = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=[], tolerance=72 * 3600,
    )
    lag_sec = (
        F.unix_timestamp("ts") - F.unix_timestamp("ts_asof")
    ).cast("bigint")
    return (
        matched.select(lag_sec.alias("__lag"))  # NULL when no prior view
        .select(F.expr("__lag DIV 3600").alias("lag_hours"))
        .groupBy("lag_hours")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "gapfill_daily_value_linear", extended=True,
    oracle="""
    WITH b AS (
        SELECT user_id, date_trunc('day', ts) AS day_ts,
               MAX(value) AS peak_value
        FROM events GROUP BY 1, 2
    ), obs AS (
        SELECT * FROM b WHERE date_part('day', day_ts) % 3 = 0
    ), r AS (
        SELECT user_id, MIN(day_ts) AS lo, MAX(day_ts) AS hi
        FROM obs GROUP BY 1
    ), grid AS (
        SELECT user_id,
               unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day_ts
        FROM r
    ), holes AS (
        SELECT g.user_id, g.day_ts, o.peak_value AS v,
               o.peak_value IS NULL AS is_gap
        FROM grid g LEFT JOIN obs o USING (user_id, day_ts)
    ), br AS (
        SELECT user_id, day_ts, v, is_gap,
            last_value(v IGNORE NULLS) OVER w  AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN day_ts END
                       IGNORE NULLS) OVER w    AS pt,
            first_value(v IGNORE NULLS) OVER w2 AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN day_ts END
                        IGNORE NULLS) OVER w2  AS nt
        FROM holes
        WINDOW w AS (PARTITION BY user_id ORDER BY day_ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w2 AS (PARTITION BY user_id ORDER BY day_ts
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day_ts,
        CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                 pv + (nv - pv)
                      * CAST(date_diff('second', pt, day_ts) AS DOUBLE)
                      / CAST(date_diff('second', pt, nt) AS DOUBLE)
        END AS peak_value,
        is_gap
    FROM br
    """,
)
def gapfill_daily_value_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling with LINEAR interpolation (round 8 — the
    sensor/gauge variant completing the fill family: zero, locf,
    null, linear). Observations are thinned to every-third calendar
    day so the fixture genuinely has interior holes; interior gaps
    interpolate on the epoch-second axis with a fixed operand order
    (so DuckDB's IEEE doubles are bit-identical), leading/trailing
    gaps stay NULL (no bracket — extrapolation is a modeling
    decision, not a fill)."""
    from top_produce_etl_spark.operators.eventtime import gapfill

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("day_ts"))
        .agg(F.max("value").alias("peak_value"))
        .filter(F.dayofmonth("day_ts") % 3 == 0)
    )
    return gapfill(
        daily, "user_id", "day_ts", "peak_value",
        step="1 day", fill="linear",
    )
