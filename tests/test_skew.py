"""Skew-mitigation operators: salted rewrites must be exactly
value-equivalent to their plain counterparts (salting is physical,
not semantic), including under heavy key skew and duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.skew import salted_agg, salted_join


def _skewed_df(spark):
    # 'hot' carries 90% of rows; duplicates present.
    rows = [("hot", i % 7, float(i % 11)) for i in range(900)]
    rows += [(f"k{i % 5}", i % 3, float(i)) for i in range(100)]
    return spark.createDataFrame(rows, "k string, sub int, v double")


def test_salted_agg_equals_plain(spark):
    df = _skewed_df(spark)
    plain = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("sub").alias("s"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["n_rows"] and r["k"]): (r["n_rows"], r["s"], r["mx"])
        for r in salted_agg(
            df, "k", {"n_rows": ("count", "*"), "s": ("sum", "sub"), "mx": ("max", "v")},
            salt_buckets=16,
        ).collect()
    }
    assert {k: v for k, v in plain.items()} == {
        r: v for r, v in salted.items()
    }


def test_salted_join_equals_plain_inner(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame(
        [("hot", 100), ("k1", 200), ("k3", 300), ("absent", 400)],
        "k string, w int",
    )
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(
        map(tuple, salted_join(left, right, "k", salt_buckets=4).collect())
    )
    assert plain == salted


def test_salted_join_equals_plain_left(spark):
    left = _skewed_df(spark)
    right = spark.createDataFrame([("hot", 1), ("k2", 2)], "k string, w int")
    plain = sorted(
        map(tuple, left.join(right, "k", "left").fillna(-1).collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(left, right, "k", salt_buckets=4, how="left")
            .fillna(-1)
            .collect(),
        )
    )
    assert plain == salted


def test_salt_is_deterministic(spark):
    """Two computations of the same salted plan agree row-for-row —
    rand()-based salts would not survive task retries."""
    df = _skewed_df(spark)
    a = sorted(map(tuple, salted_agg(df, "k", {"s": ("sum", "v")}).collect()))
    b = sorted(map(tuple, salted_agg(df, "k", {"s": ("sum", "v")}).collect()))
    assert a == b


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew handling (the runtime safety net beside explicit
    salting): with thresholds scaled to test size, a join whose one
    key carries 100x the others must show SortMergeJoin(skew=true)
    + AQEShuffleRead skewed in the FINAL adaptive plan — and the
    result must equal the unsplit join exactly."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.skew import aqe_skew_tuning

    left = (
        spark.range(0, 500_000)
        .select(F.lit(0).alias("k"), F.col("id").alias("v"))
        .union(
            spark.range(0, 5_000).select(
                (F.col("id") % 50 + 1).alias("k"), F.col("id").alias("v")
            )
        )
    )
    right = spark.range(0, 51).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    with aqe_skew_tuning(spark):
        j = left.join(right, "k")
        agg = {
            (r.k, r.n, r.sv)
            for r in j.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .collect()
        }
        plan = j._jdf.queryExecution().executedPlan().toString()
    # plan inspection needs the join's own executed QE → collect it
    with aqe_skew_tuning(spark):
        j2 = left.join(right, "k")
        j2.collect()
        plan = j2._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead skewed" in plan, plan
    want = {
        (r.k, r.n, r.sv)
        for r in left.join(F.broadcast(right), "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
        .collect()
    }
    assert agg == want


def test_skew_report_ranks_and_ratios(spark):
    from top_produce_etl_spark.operators.skew import skew_report

    # 3 keys: a=6 rows, b=2, c=1 → total 9, nkeys 3, mean 3
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, ["k"])
    out = skew_report(df, ["k"], top_n=2).collect()
    assert [(r.k, r.n) for r in out] == [("a", 6), ("b", 2)]
    top = out[0]
    assert top.share_micro == round(6 / 9 * 1e6)
    assert top.ratio_to_mean_micro == 2_000_000  # 6 vs mean 3
    import pytest

    with pytest.raises(ValueError):
        skew_report(df, [], 5)
