"""Fixed-point fast-path contract (functions/numeric.py).

The long-units summation (units / units_sum / money_sum /
revenue_sum / units_sum_over) must be BIT-IDENTICAL to the exact
decimal path it replaces — that identity is what lets the fast path
serve hash-checked oracle queries. These tests pin:

1. the data precondition (money columns are exactly 2-dp, quantity
   integral, discount 4-dp-safe) per scale factor — the fast path's
   ``round(x·10^f)`` recovery is only exact under it;
2. value identity vs the decimal path on real fixture aggregates,
   including negative values (c_acctbal) and grouped/windowed shapes;
3. the hi/lo split reconstruction on adversarial longs (negatives,
   values far beyond the low-20-bit base).
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.numeric import (
    dec,
    money_sum,
    revenue_expr,
    revenue_sum,
    units,
    units_sum,
    units_sum_over,
)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")


@pytest.mark.parametrize("sf_dir", sorted(glob.glob(os.path.join(TESTDATA, "sf*"))))
def test_money_columns_are_2dp_every_sf(sf_dir):
    """Precondition of the long-units fast path: every money-like
    column is exactly representable at its assumed granularity. A
    regenerated fixture with finer granularity must fail HERE, not
    as a silent oracle hash mismatch."""
    con = duckdb.connect()
    checks = {
        "lineitem": [
            ("l_extendedprice", 2),
            ("l_discount", 4),
            ("l_tax", 4),
            ("l_quantity", 1),
        ],
        "orders": [("o_totalprice", 2)],
        "customer": [("c_acctbal", 2)],
        "supplier": [("s_acctbal", 2)],
        "part": [("p_retailprice", 2)],
        "events": [("value", 2)],
    }
    for table, cols in checks.items():
        path = os.path.join(sf_dir, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        for col, frac in cols:
            bad, = con.execute(
                f"SELECT count(*) FROM read_parquet('{path}') "
                f"WHERE abs({col} - round({col}, {frac})) > 0"
            ).fetchone()
            assert bad == 0, f"{table}.{col} not exact at {frac} dp in {sf_dir}"


def test_units_sum_identical_to_decimal_sum_grouped(spark):
    """money_sum / revenue_sum == decimal sums, bit for bit, on the
    real fixture (grouped aggregate, includes negative acctbal)."""
    li = spark.read.parquet(os.path.join(SF_SMALL, "lineitem.parquet"))
    cust = spark.read.parquet(os.path.join(SF_SMALL, "customer.parquet"))

    fast = li.groupBy("l_returnflag").agg(
        money_sum("l_extendedprice", "s_price"),
        revenue_sum("s_rev"),
        units_sum(units("l_quantity", 1), 1, "s_qty"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.sum(dec("l_extendedprice")).cast("double").alias("s_price"),
        F.sum(revenue_expr()).cast("double").alias("s_rev"),
        F.sum(dec("l_quantity")).cast("double").alias("s_qty"),
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, exact.collect()))

    # negatives: c_acctbal spans sign
    f2 = cust.groupBy("c_mktsegment").agg(money_sum("c_acctbal", "s"))
    e2 = cust.groupBy("c_mktsegment").agg(
        F.sum(dec("c_acctbal")).cast("double").alias("s")
    )
    assert sorted(map(tuple, f2.collect())) == sorted(map(tuple, e2.collect()))


def test_units_sum_over_identical_to_decimal_window(spark):
    orders = spark.read.parquet(os.path.join(SF_SMALL, "orders.parquet"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fast = orders.select(
        "o_orderkey",
        units_sum_over(units("o_totalprice", 2), 2, w).alias("cum"),
    )
    exact = orders.select(
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("cum"),
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, exact.collect()))


def test_split_reconstruction_adversarial_longs(spark):
    """hi/lo split (shiftright + bitwiseAND) must reconstruct exact
    sums for negative units and magnitudes far beyond 2^20 — the
    cases where a naive mod/div split breaks."""
    vals = [
        0,
        1,
        -1,
        (1 << 20) - 1,
        1 << 20,
        -(1 << 20) - 7,
        10**11,
        -(10**11) - 3,
        987654321012345,
        -987654321012345,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "u long")
    got, = df.agg(units_sum(F.col("u"), 2).alias("s")).collect()
    expected = sum(vals) / 100.0  # exact: sum(vals) is small vs 2^53
    assert got["s"] == expected
