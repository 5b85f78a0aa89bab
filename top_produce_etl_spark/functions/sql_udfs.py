"""SQL user-defined functions (Spark 4 ``CREATE FUNCTION ... RETURN``,
SURVEY §2.10 adjunct): scalar and TABLE functions whose bodies are
SQL expressions.

The load-bearing property vs every Python UDF tier: a SQL UDF is
INLINED by Catalyst at analysis time — the call site compiles to the
same whole-stage-codegen expression the user would have written by
hand, so it costs nothing at 100 TB while still giving the
abstraction/reuse a function provides (business definitions like
"net revenue" written once, referenced everywhere, optimizer fully
transparent). ``tests/test_sql_udfs.py`` pins the inlining (no
Python eval node in the plan).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_sql_functions(spark: SparkSession) -> None:
    """Idempotently (re)create the temporary SQL function surface."""
    # the engine's canonical business expression as a reusable
    # definition (functions/numeric.py revenue_expr twin)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_rev(p DOUBLE, d DOUBLE)
        RETURNS DOUBLE
        RETURN p * (1.0 - d)
        """
    )
    # SQL TABLE function: an inclusive day spine — composes with the
    # gapfill operator family (a grid you can LATERAL-join)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION day_spine(
            start_day TIMESTAMP, end_day TIMESTAMP)
        RETURNS TABLE(day_ts TIMESTAMP)
        RETURN SELECT explode(sequence(start_day, end_day,
                                       INTERVAL 1 DAY)) AS day_ts
        """
    )
