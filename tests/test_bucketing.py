"""Bucketed co-located joins: the write-once-shuffle-never contract.

The value of bucketing IS its plan shape — these tests assert the
join of two co-bucketed tables contains no Exchange on either side
(and no Sort when buckets are sorted), while producing rows
identical to a plain join."""

from __future__ import annotations

import pytest

from top_produce_etl_spark.io.bucketing import (
    cobucket_join,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    from top_produce_etl_spark.io.sources import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", 4, sort_by="o_orderkey")
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 4, sort_by="o_orderkey")
    yield "b_orders", "b_lineitem", orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_cobucket_join_has_no_exchange(spark, bucketed_tables):
    """At fixture scale the planner would rather broadcast (which
    also proves nothing about bucketing) — disable broadcast to get
    the sort-merge shape a fact⨝fact join has at 100 TB, then
    assert the bucketed scan removed BOTH exchanges."""
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucket_join(
            spark, bucketed_tables[0], bucketed_tables[1], "o_orderkey"
        )
        p = _plan(joined.select("o_orderkey", "o_totalprice", "l_quantity"))
        assert "Exchange" not in p, p
        assert "Bucketed: true" in p, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)


def test_cobucket_join_values_match_plain(spark, bucketed_tables, sf_dir):
    _, _, orders, lineitem = bucketed_tables
    plain = (
        orders.join(lineitem, "o_orderkey")
        .select("o_orderkey", "l_linenumber", "l_quantity")
    )
    bucketed = cobucket_join(
        spark, bucketed_tables[0], bucketed_tables[1], "o_orderkey"
    ).select("o_orderkey", "l_linenumber", "l_quantity")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed.collect())
    )


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_tables):
    from pyspark.sql import functions as F

    df = read_bucketed(spark, bucketed_tables[1])
    agg = df.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("qty"))
    p = _plan(agg)
    assert "Exchange" not in p, p
