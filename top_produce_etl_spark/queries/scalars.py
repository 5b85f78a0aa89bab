"""Scalar-function pack queries (SURVEY.md §2.8): string, date,
JSON, conditional. All pure column expressions — whole-stage
codegen'd JVM code, zero Python in the hot path, fully
pushdown/prune friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.queries import query


@query(
    "string_pack_part",
    oracle="""
    SELECT p_partkey,
           lower(p_name)                    AS name_lower,
           upper(p_type)                    AS type_upper,
           length(p_name)                   AS name_len,
           concat_ws('-', p_brand, p_type)  AS brand_type,
           substr(p_name, 1, 5)             AS name_prefix,
           replace(p_name, ' ', '_')        AS name_snake,
           string_split(p_type, ' ')[1]     AS type_first_token,
           trim(p_name)                     AS name_trim
    FROM part
    """,
)
def string_pack_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_type").alias("type_upper"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.split("p_type", " ").getItem(0).alias("type_first_token"),
        F.trim("p_name").alias("name_trim"),
    )


@query(
    "date_pack_orders", extended=True,
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                       AS order_year,
           month(o_orderdate)                      AS order_month,
           day(o_orderdate)                        AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           date_diff('day', DATE '1995-01-01',
                     CAST(o_orderdate AS DATE))    AS days_since_epoch95,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date
    FROM orders
    """,
)
def date_pack_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias(
            "days_since_epoch95"
        ),
        (F.to_date("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .cast("timestamp")
        .alias("due_date"),
    )


@query(
    "json_pack_events", extended=True,
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract(props, '$.k') AS INT) AS prop_k,
           length(props)                           AS props_len
    FROM events
    """,
)
def json_pack_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column
    (FIXTURES.md §B) — `get_json_object` stays JVM-side; for fixed
    schemas `from_json` gives typed structs (used in the event-time
    tier)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.length("props").alias("props_len"),
    )


@query(
    "conditional_pack_customer",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END            AS tier,
           coalesce(NULLIF(c_mktsegment, 'MACHINERY'), 'OTHER') AS segment_alias,
           greatest(c_acctbal, 0.0)           AS bal_floor,
           least(c_acctbal, 9000.0)           AS bal_cap
    FROM customer
    """,
)
def conditional_pack_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY")), F.lit("OTHER")
        ).alias("segment_alias"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor"),
        F.least(F.col("c_acctbal"), F.lit(9000.0)).alias("bal_cap"),
    )


@query(
    "null_handling_pack", extended=True,
    oracle="""
    SELECT o_orderkey,
           coalesce(days_late, 0)        AS days_late_filled,
           days_late IS NULL             AS was_null
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderstatus = 'O'
                    THEN NULL
                    ELSE date_diff('day', DATE '1995-06-01', CAST(o_orderdate AS DATE))
               END AS days_late
        FROM orders
    )
    """,
)
def null_handling_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null injection + na.fill + null predicate (SURVEY §2.2 null
    handling on a config-driven metric column)."""
    orders = load_table(spark, sf_dir, "orders")
    with_null = orders.select(
        "o_orderkey",
        F.when(
            F.col("o_orderstatus") != "O",
            F.datediff(F.col("o_orderdate"), F.lit("1995-06-01")),
        ).alias("days_late"),
    )
    return with_null.select(
        "o_orderkey",
        F.coalesce("days_late", F.lit(0)).alias("days_late_filled"),
        F.col("days_late").isNull().alias("was_null"),
    )
