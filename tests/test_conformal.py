"""Split-conformal invariants (operators/conformal.py): interval
validity mechanics, rank-overflow honesty, and split disjointness."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.conformal import (
    conformal_coverage,
    conformal_intervals,
)


def _df(spark, n=2000):
    return spark.createDataFrame(
        [(i, "g1" if i % 2 == 0 else "g2",
          float(100 + (i * 97) % 41) + (1000.0 if i % 2 else 0.0))
         for i in range(n)],
        "id long, grp string, y double",
    )


def test_intervals_shape_and_symmetry(spark):
    iv = {
        r["grp"]: r
        for r in conformal_intervals(
            _df(spark), ["grp"], "id", "y", alpha=0.1
        ).collect()
    }
    assert set(iv) == {"g1", "g2"}
    for r in iv.values():
        assert r["qhat"] is not None and r["qhat"] >= 0
        assert abs((r["pred"] - r["lo"]) - r["qhat"]) < 1e-9
        assert abs((r["hi"] - r["pred"]) - r["qhat"]) < 1e-9
        assert r["q_rank"] <= r["n_cal"]
        # splits are genuinely disjoint fractions of n
        assert 0 < r["n_train"] < 2000 and 0 < r["n_cal"] < 2000


def test_rank_overflow_emits_null_not_clipped(spark):
    """A tiny calibration set must yield NULL bounds (the +inf
    half-width), never a silently clipped interval."""
    tiny = _df(spark, n=8)
    rows = conformal_intervals(
        tiny, ["grp"], "id", "y", alpha=0.01
    ).collect()
    for r in rows:
        if r["q_rank"] > r["n_cal"]:
            assert r["qhat"] is None and r["lo"] is None


def test_empirical_coverage_near_nominal(spark):
    """On 2000 exchangeable rows the 90% interval must cover the
    test slice at roughly the nominal rate (loose gate: >= 80%,
    <= 100%)."""
    cov = conformal_coverage(
        _df(spark), ["grp"], "id", "y", alpha=0.1
    ).collect()
    for r in cov:
        assert r["n_test"] > 100
        assert 800 <= r["coverage_milli"] <= 1000


def test_alpha_monotonicity(spark):
    """A smaller alpha (more confidence) never narrows the
    interval."""
    df = _df(spark)
    q90 = {
        r["grp"]: r["qhat"]
        for r in conformal_intervals(
            df, ["grp"], "id", "y", alpha=0.1
        ).collect()
    }
    q99 = {
        r["grp"]: r["qhat"]
        for r in conformal_intervals(
            df, ["grp"], "id", "y", alpha=0.01
        ).collect()
    }
    for g in q90:
        assert q99[g] is None or q99[g] >= q90[g]


def test_tiny_calibration_group_null_parity_with_duckdb(spark):
    """ADVICE r6: a group whose calibration slice is too small for
    the finite-sample rank must read NULL coverage on BOTH engines
    (undefined, not 0%) — the latent Spark-NULL-vs-DuckDB-0
    divergence, pinned cross-engine here."""
    import duckdb

    from top_produce_etl_spark.operators.conformal import (
        conformal_coverage_oracle_sql,
    )

    # g_big: plenty of calibration rows; g_tiny: so few that
    # ceil((n_cal+1)*0.99) > n_cal -> NULL interval -> NULL coverage
    rows = [(i, "g_big", float(100 + i % 37)) for i in range(600)]
    rows += [(10_000 + i, "g_tiny", 50.0 + i) for i in range(6)]
    df = spark.createDataFrame(rows, "id long, grp string, y double")

    got = {
        r["grp"]: (r["n_covered"], r["coverage_milli"])
        for r in conformal_coverage(
            df, ["grp"], "id", "y", alpha=0.01
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    sql = conformal_coverage_oracle_sql(
        "t", ["grp"], "id", "y", alpha=0.01
    )
    want = {
        g: (nc, cm) for g, _, nc, cm in con.execute(sql).fetchall()
    }
    assert set(got) == set(want)
    for g in got:
        assert got[g] == want[g], (g, got[g], want[g])
    if "g_tiny" in got:
        assert got["g_tiny"] == (None, None)
    assert got["g_big"][0] is not None
