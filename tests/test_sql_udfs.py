"""SQL UDF surface: scalar + table functions, Catalyst inlining."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.functions.sql_udfs import register_sql_functions
from top_produce_etl_spark.io.sources import load_table


def test_sql_scalar_udf_matches_inline_expression(spark, sf_dir):
    register_sql_functions(spark)
    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("__li_sqludf")
    via_udf = spark.sql(
        "SELECT SUM(net_rev(l_extendedprice, l_discount)) AS r "
        "FROM __li_sqludf"
    ).first().r
    direct = (
        lineitem.agg(
            F.sum(F.col("l_extendedprice") * (1.0 - F.col("l_discount")))
        ).first()[0]
    )
    assert via_udf == direct  # inlined: literally the same expression


def test_sql_udf_inlines_no_python_in_plan(spark, sf_dir):
    register_sql_functions(spark)
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "__li_sqludf2"
    )
    df = spark.sql(
        "SELECT net_rev(l_extendedprice, l_discount) AS r FROM __li_sqludf2"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan, plan
    assert "net_rev" not in plan, plan  # fully inlined, not a call


def test_sql_table_function_day_spine(spark):
    register_sql_functions(spark)
    rows = spark.sql(
        "SELECT * FROM day_spine(TIMESTAMP '2025-01-01', "
        "TIMESTAMP '2025-01-05')"
    ).collect()
    assert [r.day_ts.day for r in rows] == [1, 2, 3, 4, 5]
    # composes laterally: one spine per input row
    n = spark.sql(
        """
        SELECT COUNT(*) AS n FROM (VALUES (1), (2)) t(x),
        LATERAL day_spine(TIMESTAMP '2025-01-01', TIMESTAMP '2025-01-03')
        """
    ).first().n
    assert n == 6
