"""Aggregation-tier queries (SURVEY.md §2.4): descriptive stats,
exact distinct counts, rollup/cube grouping sets, pivot.

All money-like sums route through exact DECIMAL (functions.numeric)
so results are order-independent; min/max/count are naturally exact.
Plan shape note: every groupBy here gets map-side partial
aggregation from Catalyst automatically — the shuffle carries
|groups| rows, not |input| rows, which is the property that keeps
these viable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.numeric import money_sum, units, units_sum
from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.queries import query


@query(
    "customer_stats", extended=True,
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def customer_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / exact count-distinct / min / max / exact-decimal sum+avg."""
    customer = load_table(spark, sf_dir, "customer")
    cnt = F.count(F.lit(1))
    return customer.groupBy("c_mktsegment").agg(
        cnt.alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        money_sum("c_acctbal", "sum_bal"),
        (units_sum(units("c_acctbal", 2), 2) / cnt).alias("avg_bal"),
    )


@query(
    "rollup_region_nation", extended=True,
    oracle="""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals: per nation, per region, grand total.
    Spark expands rollup into grouping sets in a single aggregate —
    one shuffle regardless of the number of levels."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money_sum("c_acctbal", "sum_bal"),
    )


@query(
    "cube_status_priority", extended=True,
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum("o_totalprice", "sum_price"),
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS F,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS O,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list — at scale, passing values
    avoids the extra distinct-scan job Spark otherwise runs to
    discover pivot columns. (NULLIF in the oracle mirrors Spark's
    null for empty pivot cells.)"""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )


@query(
    "approx_distinct_parts", extended=True,
    # approx_count_distinct is sketch-based and engine-specific →
    # oracle checks the EXACT distinct alongside; the approx column
    # is validated by a relative-error bound in unit tests instead.
    oracle="SELECT COUNT(DISTINCT l_partkey) AS n_parts_exact FROM lineitem",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct count (oracle-checked). The HLL approximate
    variant — the one you'd actually run at 100 TB, no shuffle of
    distinct values, fixed-size sketch — is covered in unit tests
    since its value is engine-specific."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.agg(F.countDistinct("l_partkey").alias("n_parts_exact"))


@query(
    "value_histogram_events", extended=True,
    oracle="""
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(value) AS DOUBLE) AS lo,
           CAST(MAX(value) AS DOUBLE) AS hi
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
)
def value_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of event values: floor-binning is a
    narrow map, so the whole histogram is one partial-aggregated
    shuffle of |buckets| rows — the constant-memory way to see a
    distribution at any scale (percentile sketches cover the
    quantile view; this is the density view)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy(
            F.floor(F.col("value") / F.lit(50.0)).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").cast("double").alias("lo"),
            F.max("value").cast("double").alias("hi"),
        )
    )


@query(
    "sketch_distinct_rollup", extended=True,
    # computable-error-bound oracle (r6 verdict #2): exact monthly
    # NDV hash-checks against DuckDB; the sketch estimate is
    # verified via a 3σ in-band flag (lgConfigK=12 → σ ≈ 1.6%,
    # 3σ ≈ 5%) and union fidelity (rollup within 2% of the direct
    # whole-month sketch — exactly equal in the sparse regime) as a
    # second flag; a broken sketch flips either and fails the hash.
    oracle="""
    SELECT CAST(date_trunc('month', ts) AS DATE) AS month_start,
           COUNT(DISTINCT user_id) AS exact_distinct,
           TRUE AS rollup_in_band,
           TRUE AS rollup_near_direct
    FROM events GROUP BY 1
    """,
)
def sketch_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct users derived from STORED daily HLL sketches
    (operators/sketches.py) verified against the exact answer from
    the raw table. COUNT DISTINCT partials aren't summable, so the
    continuous-aggregate pattern (hierarchical_rollup_monthly) needs
    a mergeable sketch for this metric at 100 TB. Battery shape (r6
    verdict #2): exact NDV + two flags — the 3σ error band, and
    union fidelity (daily-sketch rollup within 2% of the direct
    whole-month sketch; exactly equal in the sparse regime, a few
    per-mille apart once the HLL_4→HLL_8 union gadget promotes
    modes — measured 1488 vs 1499 at sf0.1)."""
    from top_produce_etl_spark.operators.sketches import (
        hll_daily_sketches,
        hll_rollup_estimate,
    )

    events = load_table(spark, sf_dir, "events")
    daily = hll_daily_sketches(events, "ts", "user_id")
    est = hll_rollup_estimate(daily)
    direct = events.groupBy(
        F.date_trunc("month", "ts").alias("month_start")
    ).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("user_id", F.lit(12))
        ).alias("direct_est")
    )
    exact = events.groupBy(
        F.date_trunc("month", "ts").alias("month_start")
    ).agg(F.countDistinct("user_id").alias("exact_distinct"))
    return (
        est.join(exact, "month_start")
        .join(direct, "month_start")
        .select(
            # DATE on both engines: DuckDB renders a month-truncated
            # TIMESTAMP without the midnight suffix, Spark with it —
            # the date cast makes the formatted compare identical
            F.col("month_start").cast("date").alias("month_start"),
            "exact_distinct",
            (
                F.abs(F.col("est_distinct") - F.col("exact_distinct"))
                <= 0.05 * F.col("exact_distinct")
            ).alias("rollup_in_band"),
            (
                F.abs(F.col("est_distinct") - F.col("direct_est"))
                <= 0.02 * F.col("exact_distinct")
            ).alias("rollup_near_direct"),
        )
    )
