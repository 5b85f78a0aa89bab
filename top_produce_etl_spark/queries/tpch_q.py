"""TPC-H-shaped multi-join analytics (SURVEY.md §2.3-§2.6): the
join-heavy query shapes a user of the reference's "sales analytics"
pipeline runs daily, adapted to the fixture schema.

Scale notes:
- Q3 shape: two large-table joins with selective predicates on both
  sides — correctness of pushdown matters more than join order here
  (Catalyst pushes both filters below the joins; AQE picks broadcast
  for the filtered customer side at real scale).
- Q5 shape: the classic "local supplier" pattern — the
  customer-nation and supplier-nation equality closes a cycle in the
  join graph; dims broadcast, the lineitem⨝orders backbone is the
  only big shuffle.
- label_centroids: posexplode of embedding vectors → (label, dim)
  aggregate. This is the k-means/IVF centroid building block; the
  long format keeps the shuffle row-width constant and lets the
  same plan scale to any dimensionality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.queries import query
from top_produce_etl_spark.queries.relational import REV_DEC


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({REV_DEC}) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 20
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters on both join inputs + group
    by a high-cardinality key + global top-k. Filters push below the
    joins; the final top-20 is TakeOrderedAndProject, not a sort."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    from top_produce_etl_spark.functions.numeric import revenue_expr

    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, customer.c_custkey == orders.o_custkey)
        .filter(F.col("o_orderdate") < "1998-01-01")
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .filter(F.col("l_shipdate") > "1998-01-01")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(20)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({REV_DEC}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the join graph closes a cycle
    (customer.nation = supplier.nation), so the supplier join is an
    equi-join on TWO keys. All dims broadcast; lineitem⨝orders is
    the only exchange-bearing join."""
    from top_produce_etl_spark.functions.numeric import revenue_expr

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    return (
        lineitem
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .groupBy("n_name")
        .agg(F.sum(revenue_expr()).cast("double").alias("revenue"))
    )


@query(
    "label_centroids",
    oracle="""
    SELECT label, CAST(i - 1 AS INT) AS dim,
           ROUND(AVG(CAST(embedding[i] AS DOUBLE)), 6) AS centroid
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    GROUP BY label, i
    """,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long (label, dim, value)
    format — the IVF/k-means building block. posexplode keeps the
    shuffle row-width constant regardless of vector dimensionality;
    the aggregate partial-combines map-side. Rounded to 6dp (float
    mean accumulation order differs between engines)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"))
    )
