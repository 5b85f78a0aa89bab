"""Join-tier queries (SURVEY.md §2.3): outer/semi/anti/cross,
equi+range joins, and the as-of join custom operator.

Scale notes:
- semi/anti joins never duplicate or widen rows — Spark runs them
  as broadcast/shuffled hash joins with existence bitmaps; always
  prefer them over `IN (subquery)`-shaped inner joins + distinct.
- the range join keeps an equi key so the planner uses a hash join
  with a residual range predicate — never a nested-loop cartesian.
- as-of join is one shuffle (union + per-key ordered window scan) —
  the formulation that survives 100 TB, vs. the naive range-join +
  groupBy-max which explodes pair counts first and reduces later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.joins import (
    anti_join,
    asof_join,
    broadcast_dim_join,
    range_join,
    semi_join,
)
from top_produce_etl_spark.queries import query


@query(
    "left_join_order_counts", extended=True,
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders
    (count(key) skips the nulls the outer join injects)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(
        orders, customer.c_custkey == orders.o_custkey, how="left"
    )
    return joined.groupBy("c_custkey", "c_mktsegment").agg(
        F.count("o_orderkey").alias("n_orders")
    )


@query(
    "full_outer_nation_activity",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ), supp AS (
        SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cust.nationkey, supp.nationkey) AS nationkey,
           cust.n_customers, supp.n_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
)
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates — nations with customers
    but no suppliers (and vice versa) survive with NULL counts."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    joined = cust.alias("c").join(
        supp.alias("s"), F.col("c.nationkey") == F.col("s.nationkey"), "full"
    )
    return joined.select(
        F.coalesce("c.nationkey", "s.nationkey").alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


@query(
    "semi_join_active_customers", extended=True,
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return semi_join(customer.select("c_custkey", "c_name"), finished, "c_custkey")


@query(
    "anti_join_inactive_customers", extended=True,
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def anti_join_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    keys = orders.select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(customer.select("c_custkey", "c_name"), keys, "c_custkey")


@query(
    "cross_join_region_status", extended=True,
    oracle="""
    SELECT r_name, o_orderstatus
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
    """,
)
def cross_join_region_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian of two tiny relations (the only shape where a
    cross join is legitimate — scaffold for dense reporting grids)."""
    region = load_table(spark, sf_dir, "region")
    statuses = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.select("r_name").crossJoin(statuses)


@query(
    "range_join_ship_window",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
    FROM lineitem l
    JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < CAST(CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY AS TIMESTAMP)
    """,
)
def range_join_ship_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi+interval join: lineitems shipped within 60 days of their
    order date. The orderkey equi-key keeps this a hash join with a
    residual range filter."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "ship_deadline",
        F.to_date("o_orderdate").cast("timestamp") + F.expr("INTERVAL 60 DAYS"),
    )
    joined = range_join(
        lineitem,
        orders,
        equi_on=[("l_orderkey", "o_orderkey")],
        left_ts="l_shipdate",
        right_lo="o_orderdate",
        right_hi="ship_deadline",
    )
    return joined.select(
        "l_orderkey", "l_linenumber", "o_orderdate", "l_shipdate"
    )


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS click_event_id,
           c.ts       AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (SURVEY §2.3): for each purchase, the most recent
    click by the same user at-or-before the purchase. Implemented as
    union + window last(ignorenulls) — one shuffle; DuckDB's native
    ASOF JOIN is the oracle."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="click_ts",
        right_cols=["click_event_id"],
    )
    return out.select(
        "event_id", "user_id", "ts", "click_event_id",
        F.col("click_ts_asof").alias("click_ts"),
    )


@query(
    "asof_forward_purchase_click", extended=True,
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           c.event_id AS click_event_id,
           c.ts       AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def asof_forward_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (merge_asof direction="forward"): for each
    purchase, the EARLIEST click by the same user at-or-after it —
    the "next touch" lookup. Same single union-sort shuffle as
    backward, filled from the following frame; DuckDB's ASOF JOIN
    with `<=` is the oracle."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts",
        right_ts="click_ts", right_cols=["click_event_id"],
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", "ts", "click_event_id",
        F.col("click_ts_asof").alias("click_ts"),
    )


@query(
    "asof_nearest_purchase_click", extended=True,
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'click'),
    b AS (
        SELECT p.event_id, p.user_id, p.ts,
               c.event_id AS b_id, c.ts AS b_ts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    ), f AS (
        SELECT p.event_id, c.event_id AS f_id, c.ts AS f_ts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts <= c.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN use_back THEN b_id ELSE f_id END AS click_event_id,
           CASE WHEN use_back THEN b_ts ELSE f_ts END AS click_ts
    FROM (
        SELECT b.*, f.f_id, f.f_ts,
               (f_ts IS NULL OR (b_ts IS NOT NULL AND
                epoch(b.ts) - epoch(b_ts) <= epoch(f_ts) - epoch(b.ts)))
               AS use_back
        FROM b JOIN f ON b.event_id = f.event_id
    ) b
    """,
)
def asof_nearest_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (merge_asof direction="nearest", ties to
    backward): each purchase matched to its closest click either
    side. Still ONE shuffle — both fills (preceding-frame last,
    following-frame first) ride the same union sort. Oracle composes
    DuckDB's backward and forward ASOF joins with the identical
    tie rule."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts",
        right_ts="click_ts", right_cols=["click_event_id"],
        direction="nearest",
    )
    return out.select(
        "event_id", "user_id", "ts", "click_event_id",
        F.col("click_ts_asof").alias("click_ts"),
    )


@query(
    "asof_tolerance_purchase_click", extended=True,
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN epoch(p.ts) - epoch(c.ts) <= 21600
                THEN c.event_id END AS click_event_id,
           CASE WHEN epoch(p.ts) - epoch(c.ts) <= 21600
                THEN c.ts END AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_tolerance_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with TOLERANCE (merge_asof tolerance): the
    latest prior click counts only within 6 hours of the purchase —
    beyond it the row keeps NULLs. Nulling the nearest candidate
    equals filtering (every other candidate is farther), which is
    exactly the CASE the oracle applies on DuckDB's ASOF match."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        purchases, clicks, on="user_id", left_ts="ts",
        right_ts="click_ts", right_cols=["click_event_id"],
        direction="backward", tolerance=6 * 3600,
    )
    return out.select(
        "event_id", "user_id", "ts", "click_event_id",
        F.col("click_ts_asof").alias("click_ts"),
    )


@query(
    "broadcast_join_supplier_nation", extended=True,
    oracle="""
    SELECT s.s_suppkey, s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def broadcast_join_supplier_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return broadcast_dim_join(
        supplier, nation, on=supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "s_name", "n_name")


@query(
    "null_semantics_pack", extended=True,
    oracle="""
    WITH l AS (
        SELECT nullif(o_custkey % 50, 0) AS k FROM orders
    ), r AS (
        SELECT nullif(c_custkey % 50, 7) AS k FROM customer
    )
    SELECT 'nullsafe_inner' AS op,
           (SELECT COUNT(*) FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k) AS n
    UNION ALL
    SELECT 'plain_inner',
           (SELECT COUNT(*) FROM l JOIN r ON l.k = r.k)
    UNION ALL
    SELECT 'not_in_trap',
           (SELECT COUNT(*) FROM l WHERE k NOT IN (SELECT k FROM r))
    UNION ALL
    SELECT 'not_exists',
           (SELECT COUNT(*) FROM l WHERE NOT EXISTS (
                SELECT 1 FROM r WHERE r.k = l.k))
    """,
)
def null_semantics_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL join semantics in one pack — the four shapes every
    engine must get right and users routinely get wrong:

    - ``nullsafe_inner``: ``<=>`` (eqNullSafe) matches NULL with
      NULL — NULL-keyed rows join each other (cartesian of the two
      NULL groups);
    - ``plain_inner``: ``=`` never matches NULL — NULL-keyed rows
      silently drop;
    - ``not_in_trap``: ``NOT IN`` against a set CONTAINING a NULL is
      three-valued-logic empty — the classic silent-zero footgun;
    - ``not_exists``: the anti-join (left_anti) keeps unmatched rows
      INCLUDING NULL-keyed ones — what ``NOT IN`` writers usually
      meant.

    Scale note: a null-safe equi key still hash-partitions (NULLs
    co-locate in one bucket — a skew source if NULL is frequent;
    the skew-salting operator applies)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    left = orders.select(
        F.nullif((F.col("o_custkey") % 50), F.lit(0)).alias("k")
    )
    right = customer.select(
        F.nullif((F.col("c_custkey") % 50), F.lit(7)).alias("k")
    )

    def cnt(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    nullsafe = left.join(right, left["k"].eqNullSafe(right["k"]))
    plain = left.join(right, left["k"] == right["k"])
    # NOT IN via the SQL expression (three-valued logic preserved)
    left.createOrReplaceTempView("__null_l")
    right.createOrReplaceTempView("__null_r")
    not_in = spark.sql(
        "SELECT k FROM __null_l WHERE k NOT IN (SELECT k FROM __null_r)"
    )
    not_exists = left.join(right, left["k"] == right["k"], "left_anti")
    return (
        cnt("nullsafe_inner", nullsafe)
        .unionByName(cnt("plain_inner", plain))
        .unionByName(cnt("not_in_trap", not_in))
        .unionByName(cnt("not_exists", not_exists))
    )
