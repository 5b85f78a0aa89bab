"""Window-function queries (SURVEY.md §2.5): ranking family,
lag/lead, running frames, distribution ranks.

Determinism discipline: every window ORDER BY ends with a unique
tiebreak column — without a total order, lag/row_number are
nondeterministic across runs and partitionings (SURVEY §7 risk #1).

Scale note: a window's partition key sets max parallelism AND the
skew exposure — per-customer/per-brand partitions are fine; a
single global window (no partitionBy) serializes onto one task, so
the only global window here runs over an already-small dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.numeric import units, units_sum_over
from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.queries import query


@query(
    "order_gaps_lag_lead", extended=True,
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           lag(o_orderkey) OVER w AS prev_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER w AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def order_gaps_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor access per customer: previous/next order and
    inter-order gap in days."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    )


@query(
    "running_customer_spend", extended=True,
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cum_spend,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS order_seq
    FROM orders
    """,
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer — running-frame aggregate
    (exact decimal, so the prefix sums are order-independent given
    the total order)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        units_sum_over(units("o_totalprice", 2), 2, frame).alias("cum_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "part_price_distribution", extended=True,
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           ntile(4)       OVER w AS price_quartile,
           percent_rank() OVER w AS price_pct_rank,
           cume_dist()    OVER w AS price_cume_dist
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
    """,
)
def part_price_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks per brand: ntile / percent_rank /
    cume_dist (rank-derived doubles — identical across engines
    given the deterministic order)."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
    return part.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.ntile(4).over(w).alias("price_quartile"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


@query(
    "brand_size_dense_rank", extended=True,
    oracle="""
    SELECT p_partkey, p_brand, p_size, dr
    FROM (
        SELECT p_partkey, p_brand, p_size,
               DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS dr
        FROM part
    )
    WHERE dr <= 2
    """,
)
def brand_size_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ties-share-rank top-N variant: all parts in the top-2
    DISTINCT sizes per brand (dense_rank semantics vs row_number's
    exactly-N — both exposed by operators.topn)."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    return (
        part.select(
            "p_partkey", "p_brand", "p_size", F.dense_rank().over(w).alias("dr")
        )
        .filter(F.col("dr") <= 2)
    )


@query(
    "first_last_order_per_customer", extended=True,
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_orderkey,
           last_value(o_orderkey)  OVER w AS last_orderkey
    FROM orders
    WINDOW w AS (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def first_last_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an unbounded frame (the frame spec matters:
    default frame ends at CURRENT ROW, which silently breaks
    last_value — a classic window footgun both engines share)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("last_orderkey"),
    ).distinct()
