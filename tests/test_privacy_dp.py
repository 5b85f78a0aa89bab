"""Differential-privacy release invariants (operators/privacy.py):
seeded determinism, epsilon calibration, clipping-bounded
sensitivity, and cross-engine parity of the seeded Laplace draw."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.operators.privacy import (
    dp_noisy_counts,
    dp_noisy_counts_oracle_sql,
    dp_noisy_sum,
    dp_noisy_sum_oracle_sql,
)


def _groups(spark, n_groups=200, per_group=50):
    return spark.createDataFrame(
        [(f"g{i % n_groups:04d}", float(i % 7)) for i in range(n_groups * per_group)],
        "grp string, v double",
    )


def test_dp_counts_deterministic_and_calibrated(spark):
    df = _groups(spark)
    a = {r["grp"]: r["noisy_count"]
         for r in dp_noisy_counts(df, ["grp"], epsilon=0.5, allow_insecure_salt=True).collect()}
    b = {r["grp"]: r["noisy_count"]
         for r in dp_noisy_counts(df, ["grp"], epsilon=0.5, allow_insecure_salt=True).collect()}
    assert a == b and len(a) == 200  # re-release is bit-identical
    # mean |noise| over 200 groups ~ b = 1/eps = 2; loose 3x band
    errs = [abs(v - 50) for v in a.values()]
    assert 0.5 < sum(errs) / len(errs) < 6.0
    # a different salt draws different noise
    c = {r["grp"]: r["noisy_count"]
         for r in dp_noisy_counts(df, ["grp"], 0.5, salt="dp-v2", allow_insecure_salt=True).collect()}
    assert c != a


def test_dp_counts_epsilon_scaling(spark):
    """Smaller epsilon -> proportionally larger noise (b = 1/eps):
    the mean |noise| ratio over 200 groups must track 10x within a
    loose band (same seeds, scaled draws -> the ratio is EXACT per
    group before rounding)."""
    df = _groups(spark)
    tight = dp_noisy_counts(df, ["grp"], epsilon=1.0, allow_insecure_salt=True).collect()
    loose = dp_noisy_counts(df, ["grp"], epsilon=0.1, allow_insecure_salt=True).collect()
    mt = sum(abs(r["noisy_count"] - 50) for r in tight) / len(tight)
    ml = sum(abs(r["noisy_count"] - 50) for r in loose) / len(loose)
    assert 6.0 < ml / max(mt, 0.1) < 14.0


def test_dp_sum_clipping_bounds_outlier_influence(spark):
    """One row moving from in-range to arbitrarily huge changes the
    released sum by AT MOST the clip bound (the sensitivity story) —
    without clipping the release would track the outlier."""
    base = [("g", 10.0)] * 20
    a = spark.createDataFrame(base + [("g", 100.0)], "grp string, v double")
    b = spark.createDataFrame(base + [("g", 1e9)], "grp string, v double")
    ra = dp_noisy_sum(a, ["grp"], "v", 0.0, 100.0, epsilon=1.0, allow_insecure_salt=True).collect()[0]
    rb = dp_noisy_sum(b, ["grp"], "v", 0.0, 100.0, epsilon=1.0, allow_insecure_salt=True).collect()[0]
    # same group key -> same noise; clipped sums are equal
    assert ra["noisy_sum_milli"] == rb["noisy_sum_milli"]


def test_dp_release_never_emits_exact_alongside(spark):
    df = _groups(spark, 5, 10)
    out = dp_noisy_counts(df, ["grp"], epsilon=1.0, allow_insecure_salt=True)
    assert out.columns == ["grp", "noisy_count"]
    out2 = dp_noisy_sum(df, ["grp"], "v", 0.0, 10.0, epsilon=1.0, allow_insecure_salt=True)
    assert out2.columns == ["grp", "noisy_sum_milli"]


def test_dp_cross_engine_parity_duckdb(spark):
    import duckdb

    df = _groups(spark, 37, 11)
    got_c = {
        r["grp"]: r["noisy_count"]
        for r in dp_noisy_counts(df, ["grp"], epsilon=0.3, allow_insecure_salt=True).collect()
    }
    got_s = {
        r["grp"]: r["noisy_sum_milli"]
        for r in dp_noisy_sum(
            df, ["grp"], "v", -5.0, 5.0, epsilon=0.7,
            allow_insecure_salt=True,
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want_c = dict(con.execute(
        dp_noisy_counts_oracle_sql("t", ["grp"], epsilon=0.3, allow_insecure_salt=True)
    ).fetchall())
    want_s = dict(con.execute(
        dp_noisy_sum_oracle_sql("t", ["grp"], "v", -5.0, 5.0, epsilon=0.7, allow_insecure_salt=True)
    ).fetchall())
    assert got_c == want_c
    assert got_s == want_s


def test_dp_rejects_bad_params(spark):
    df = _groups(spark, 2, 2)
    with pytest.raises(ValueError, match="epsilon"):
        dp_noisy_counts(df, ["grp"], epsilon=0.0, allow_insecure_salt=True)
    with pytest.raises(ValueError, match="clip_lo"):
        dp_noisy_sum(df, ["grp"], "v", 5.0, 5.0, epsilon=1.0, allow_insecure_salt=True)


def test_dp_salt_gate_and_full_key_hash(spark):
    """Round-8 advisor fixes: (1) a short (code-visible-default) salt
    is REJECTED unless the caller opts into reproducible-noise mode;
    a >=16-char salt passes without the flag. (2) The noise key is
    hashed FULL-LENGTH: group keys sharing a 40-char prefix draw
    independent noise (the old composite hash truncated at 40 chars
    and gave them identical draws)."""
    df = _groups(spark, 3, 4)
    with pytest.raises(ValueError, match="allow_insecure_salt"):
        dp_noisy_counts(df, ["grp"], epsilon=1.0)
    with pytest.raises(ValueError, match="allow_insecure_salt"):
        dp_noisy_sum(df, ["grp"], "v", 0.0, 10.0, epsilon=1.0)
    with pytest.raises(ValueError, match="allow_insecure_salt"):
        dp_noisy_counts_oracle_sql("t", ["grp"], epsilon=1.0)
    # long salt: accepted without the flag
    dp_noisy_counts(df, ["grp"], epsilon=1.0,
                    salt="a-sufficiently-long-secret").collect()
    # full-key hashing: two 60-char keys sharing a 40+ char prefix
    # (default salt 'dp-v1|' used to consume 6 of the 40 hashed chars)
    pre = "P" * 50
    long_df = spark.createDataFrame(
        [(pre + "SUFFIX-A", 1.0)] * 10 + [(pre + "SUFFIX-B", 1.0)] * 10,
        "grp string, v double",
    )
    rel = {
        r["grp"]: r["noisy_count"]
        for r in dp_noisy_counts(
            long_df, ["grp"], epsilon=0.05, allow_insecure_salt=True
        ).collect()
    }
    # equal true counts (10 each) at eps=0.05 (b=20): identical noise
    # would give identical releases with overwhelming probability
    assert rel[pre + "SUFFIX-A"] != rel[pre + "SUFFIX-B"]
