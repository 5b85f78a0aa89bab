"""Set-operation queries (SURVEY.md §2.7).

The engine exposes by-name union only (`unionByName`) — positional
union over inferred schemas silently misaligns columns (§2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.queries import query


def _segments(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    customer = load_table(spark, sf_dir, "customer")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return building, rich


@query(
    "union_all_segments", extended=True,
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def union_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — no shuffle at all (a union is just a plan merge;
    dedup is what costs a shuffle, which is why the engine keeps
    UNION ALL and DISTINCT as separate explicit steps)."""
    building, rich = _segments(spark, sf_dir)
    return building.unionByName(rich)


@query(
    "union_distinct_segments", extended=True,
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def union_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    building, rich = _segments(spark, sf_dir)
    return building.unionByName(rich).distinct()


@query(
    "intersect_segments", extended=True,
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    building, rich = _segments(spark, sf_dir)
    return building.intersect(rich)


@query(
    "except_all_segments", extended=True,
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def except_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    building, rich = _segments(spark, sf_dir)
    return building.exceptAll(rich)


@query(
    "intersect_all_segments", extended=True,
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def intersect_all_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (per-row multiplicity = min of the two
    sides) — completes the §2.7 surface next to ``intersect``.
    Spark plans this as a single aggregate-of-counts, one shuffle."""
    building, rich = _segments(spark, sf_dir)
    return building.intersectAll(rich)
