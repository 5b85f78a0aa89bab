"""DDSketch invariants (operators/ddsketch.py): lossless SUM merge,
grid-bounded size, and the γ relative-error guarantee against exact
percentiles."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.ddsketch import (
    GAMMA,
    dd_build,
    dd_merge,
    dd_quantiles,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_dd_merge_is_split_invariant(spark, sf_dir):
    o = _orders(spark, sf_dir)
    whole = dd_build(o, ["o_orderpriority"], "o_totalprice")
    a = dd_build(
        o.where("o_orderkey % 2 = 0"), ["o_orderpriority"], "o_totalprice"
    )
    b = dd_build(
        o.where("o_orderkey % 2 = 1"), ["o_orderpriority"], "o_totalprice"
    )
    merged = dd_merge(a.union(b), ["o_orderpriority"])
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_dd_sketch_is_grid_bounded(spark, sf_dir):
    """Bucket count is bounded by the LOG grid over the value range,
    not by row count — the mergeable-rollup storage argument."""
    o = _orders(spark, sf_dir)
    sk = dd_build(o, [], "o_totalprice")
    lo, hi = o.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).collect()[0]
    grid = math.log(hi / lo) / math.log(GAMMA) + 2
    assert sk.count() <= grid


def test_dd_quantiles_within_relative_error(spark, sf_dir):
    """Every estimate within the γ guarantee (±(γ−1) relative,
    loosened 2× for the micro-nat grid rounding) of the exact
    quantile."""
    o = _orders(spark, sf_dir)
    sk = dd_build(o, ["o_orderpriority"], "o_totalprice")
    est = {
        (r["o_orderpriority"], r["q"]): r["est"]
        for r in dd_quantiles(
            sk, ["o_orderpriority"], [0.5, 0.9, 0.99]
        ).collect()
    }
    assert len(est) == 15
    for q in (0.5, 0.9, 0.99):
        exact = {
            r["o_orderpriority"]: r["x"]
            for r in o.groupBy("o_orderpriority")
            .agg(F.expr(f"percentile(o_totalprice, {q})").alias("x"))
            .collect()
        }
        for grp, truth in exact.items():
            rel = abs(est[(grp, q)] - truth) / truth
            assert rel <= 2 * (GAMMA - 1), (grp, q, rel)
