"""Poisson-bootstrap invariants (operators/bootstrap.py):
replicate weights are deterministic, CIs bracket sensibly, and the
distributed shape holds (one hash per row, weights as narrow
expressions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.bootstrap import (
    _POIS_CDF,
    bootstrap_ci,
    bootstrap_means,
)


def _df(spark):
    return spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(100 + (i * 37) % 50))
         for i in range(400)],
        "id long, grp string, x double",
    )


def test_pois_cdf_is_a_cdf():
    assert all(b > a for a, b in zip(_POIS_CDF, _POIS_CDF[1:]))
    assert 0.999 < _POIS_CDF[-1] < 1.0
    assert abs(_POIS_CDF[0] - 0.36787944117144233) < 1e-15


def test_bootstrap_means_deterministic_and_complete(spark):
    df = _df(spark)
    a = bootstrap_means(df, ["grp"], "id", "x", b=20).collect()
    b = bootstrap_means(df, ["grp"], "id", "x", b=20).collect()
    key = lambda r: (r["grp"], r["rep"])  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    # every (group, replicate) cell present (no empty-resample drops
    # at n=200 rows/group)
    assert len(a) == 2 * 20


def test_bootstrap_ci_brackets_point_estimate(spark):
    df = _df(spark)
    rows = bootstrap_ci(df, ["grp"], "id", "x", b=50).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_reps"] == 50
        assert r["ci_lo"] <= r["point_est"] <= r["ci_hi"]
        # CI width scales like sigma/sqrt(n): sigma~14.4, n=200 →
        # ~2; gate loosely
        assert 0.5 < (r["ci_hi"] - r["ci_lo"]) < 20.0


def test_bootstrap_salt_changes_replicates(spark):
    df = _df(spark)
    a = {
        (r["grp"], r["rep"]): r["boot_mean"]
        for r in bootstrap_means(df, ["grp"], "id", "x", b=10).collect()
    }
    b = {
        (r["grp"], r["rep"]): r["boot_mean"]
        for r in bootstrap_means(
            df, ["grp"], "id", "x", b=10, salt="boot-v2"
        ).collect()
    }
    assert a != b  # a fresh salt is a fresh bootstrap


def test_bootstrap_weights_vary_across_replicates(spark):
    """Counter-mix sanity: a row's multiplicity must differ across
    replicates (a broken mix that ignores rep collapses every
    replicate to the same mean)."""
    df = _df(spark)
    means = bootstrap_means(df, ["grp"], "id", "x", b=20)
    per_grp = (
        means.groupBy("grp")
        .agg(F.countDistinct("boot_mean").alias("d"))
        .collect()
    )
    assert all(r["d"] >= 15 for r in per_grp)
