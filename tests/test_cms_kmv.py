"""Count-min + KMV sketch invariants (operators/countmin.py,
operators/kmv.py): the one-sided CMS guarantee, lossless mergeability
(the whole point of storing sketches), and KMV exactness below k /
estimator sanity above k."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.countmin import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from top_produce_etl_spark.operators.kmv import (
    kmv_estimate,
    kmv_overlap,
    kmv_sketch,
    kmv_union,
)


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def test_cms_estimate_is_one_sided(spark, sf_dir):
    """estimate ≥ exact for EVERY key — the CMS contract."""
    ev = _events(spark, sf_dir)
    sketch = cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact, "user_id")
    bad = est.where(F.col("cms_est") < F.col("exact")).count()
    assert bad == 0
    # and with width >> distinct keys, most estimates are exact
    n = est.count()
    tight = est.where(F.col("cms_est") == F.col("exact")).count()
    assert tight >= n * 0.5


def test_cms_merge_equals_whole(spark, sf_dir):
    """SUM-merging per-day sketches == sketching the whole stream:
    the property that makes the stored daily rollup lossless."""
    ev = _events(spark, sf_dir)
    day = F.to_date("ts")
    cutoff = ev.agg(F.min(day).alias("d")).collect()[0]["d"]
    a = cms_build(ev.where(day <= F.lit(cutoff)), "user_id")
    b = cms_build(ev.where(day > F.lit(cutoff)), "user_id")
    merged = cms_merge(a.union(b))
    whole = cms_build(ev, "user_id")
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_sketch_is_bounded(spark, sf_dir):
    """The sketch never exceeds depth × width rows regardless of
    input size — the 100 TB argument in one assert."""
    ev = _events(spark, sf_dir)
    sketch = cms_build(ev, "user_id", depth=4, width=64)
    assert sketch.count() <= 4 * 64


def test_kmv_exact_below_k(spark, sf_dir):
    """Fewer distinct keys than k ⇒ the sketch is the set and the
    estimate is exact (user_id DIV 4 keeps distincts < k=64)."""
    ev = _events(spark, sf_dir)
    key = "CAST(user_id DIV 4 AS STRING)"
    sk = kmv_sketch(ev, ["event_type"], key, k=64)
    est = kmv_estimate(sk, ["event_type"], k=64)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct(F.expr(key)).alias("exact")
    )
    rows = est.join(exact, "event_type").collect()
    assert rows and all(r["exact"] < 64 for r in rows)
    assert all(r["distinct_est"] == r["exact"] for r in rows)


def test_kmv_rejects_overflow_k(spark, sf_dir):
    """k > 128 would overflow the int64 estimator numerator — the
    guard raises up front instead of failing in codegen."""
    import pytest

    ev = _events(spark, sf_dir)
    with pytest.raises(ValueError, match="128"):
        kmv_sketch(ev, [], "CAST(user_id AS STRING)", k=256)


def test_kmv_estimator_in_band_above_k(spark, sf_dir):
    """Above k the estimate is approximate; k=64 gives ~12.5% rel.
    std. error — assert a generous 4σ band."""
    ev = _events(spark, sf_dir)
    key = "concat(CAST(user_id AS STRING), '@', CAST(event_id AS STRING))"
    sk = kmv_sketch(ev, [], key, k=64)
    est = kmv_estimate(sk, [], k=64).collect()[0]["distinct_est"]
    exact = ev.selectExpr(key).distinct().count()
    assert exact > 64
    assert abs(est - exact) <= exact * 0.5


def test_kmv_union_and_overlap(spark, sf_dir):
    """Union sketch == sketch of the union (lossless merge), and the
    overlap estimate of a set with itself is its own cardinality
    estimate (ρ = 1)."""
    ev = _events(spark, sf_dir)
    key = "concat(CAST(user_id AS STRING), '@', CAST(event_id AS STRING))"
    a = kmv_sketch(ev.where("event_type = 'view'"), [], key, k=64)
    b = kmv_sketch(ev.where("event_type = 'click'"), [], key, k=64)
    both = kmv_sketch(
        ev.where("event_type IN ('view','click')"), [], key, k=64
    )
    u = kmv_union(a, b, k=64)
    assert u.exceptAll(both.select("h")).count() == 0
    assert both.select("h").exceptAll(u).count() == 0

    self_ov = kmv_overlap(a, a, k=64).collect()[0]
    assert self_ov["inter_est"] == self_ov["union_est"]

    # disjoint key spaces (view vs click event_ids) ⇒ tiny overlap
    ov = kmv_overlap(a, b, k=64).collect()[0]
    assert ov["inter_est"] <= ov["union_est"] * 0.2


def test_kmv_fast_twin_accuracy_parity(spark, sf_dir):
    """The xxhash64 production path estimates the same cardinality
    within the k=64 error band (±4σ ≈ ±50%), and its sketch is
    bounded like the oracle path's."""
    ev = _events(spark, sf_dir)
    key = "concat(CAST(user_id AS STRING), '@', CAST(event_id AS STRING))"
    exact = ev.selectExpr(key).distinct().count()
    sk = kmv_sketch(ev, [], key, k=64, hasher="xxhash64")
    assert sk.count() <= 64
    est = kmv_estimate(sk, [], k=64).collect()[0]["distinct_est"]
    assert abs(est - exact) <= exact * 0.5


def test_kmv_rejects_unknown_hasher(spark, sf_dir):
    import pytest

    ev = _events(spark, sf_dir)
    with pytest.raises(ValueError, match="hasher"):
        kmv_sketch(ev, [], "CAST(user_id AS STRING)", hasher="md5")


def test_cms_sum_sketch_one_sided(spark, sf_dir):
    """The SUM variant keeps the one-sided guarantee for
    non-negative values: estimate ≥ exact for every key."""
    ev = _events(spark, sf_dir)
    val = "CAST(round(value * 1000) AS BIGINT)"  # non-negative milli
    sketch = cms_build(
        ev.where("value >= 0"), "user_id", value_sql=val
    )
    exact = (
        ev.where("value >= 0")
        .groupBy("user_id")
        .agg(F.sum(F.expr(val)).alias("exact"))
    )
    est = cms_estimate(sketch, exact, "user_id")
    assert est.where(F.col("cms_est") < F.col("exact")).count() == 0


def test_cms_fast_twin_one_sided(spark, sf_dir):
    """The xxhash64 production path keeps the CMS contract: a
    different (equally uniform) bucketing, estimate ≥ exact for
    every key, sketch still bounded."""
    ev = _events(spark, sf_dir)
    sketch = cms_build(ev, "user_id", hasher="xxhash64")
    assert sketch.count() <= 4 * 512
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(sketch, exact, "user_id", hasher="xxhash64")
    assert est.where(F.col("cms_est") < F.col("exact")).count() == 0


def test_cms_estimate_expression_key(spark, sf_dir):
    """ADVICE r6: _bucket accepts SQL expressions, so the NULL-probe
    guard must too (F.expr, not F.col) — probe with a computed key
    and with a NULL-producing expression."""
    ev = _events(spark, sf_dir)
    expr = "concat(event_type, '|', CAST(user_id % 10 AS STRING))"
    sketch = cms_build(ev, expr)
    exact = (
        ev.selectExpr(f"{expr} AS k")
        .groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    )
    probes = exact.selectExpr(
        "concat(split(k, '\\\\|')[0], '|', split(k, '\\\\|')[1]) AS k",
        "exact",
    )
    est = cms_estimate(sketch, probes, "k")
    assert est.where(F.col("cms_est") < F.col("exact")).count() == 0
    # a NULL-valued expression key must surface NULL, not 0
    nulls = spark.createDataFrame([(None,)], "k string")
    got = cms_estimate(
        sketch, nulls, "coalesce(k, CAST(NULL AS STRING))"
    ).collect()
    assert got[0]["cms_est"] is None


def test_cms_join_size_one_sided_and_tight(spark, sf_dir):
    """The AMS/CMS inner-product join estimate: >= exact always
    (collisions only add), and within the depth-min envelope on the
    fixture; symmetric in its arguments."""
    from top_produce_etl_spark.operators.countmin import (
        cms_build,
        cms_join_size,
    )

    ev = _events(spark, sf_dir)
    view = ev.where(F.col("event_type") == "view")
    click = ev.where(F.col("event_type") == "click")
    sa, sb = cms_build(view, "user_id"), cms_build(click, "user_id")
    est = cms_join_size(sa, sb).collect()[0]["est_join_size"]
    est_sym = cms_join_size(sb, sa).collect()[0]["est_join_size"]
    exact = (
        view.groupBy("user_id").count().withColumnRenamed("count", "a")
        .join(
            click.groupBy("user_id").count()
            .withColumnRenamed("count", "b"),
            "user_id",
        )
        .selectExpr("CAST(SUM(a * b) AS BIGINT) AS x")
        .collect()[0]["x"]
    )
    assert est == est_sym
    assert est >= exact
    # collision mass ~ Na*Nb/width; 3x headroom on the fixture
    na, nb = view.count(), click.count()
    assert est <= exact + 3 * na * nb / 512


def test_cms_join_size_disjoint_returns_zero(spark):
    """Round-8 advisor fix: sketches of disjoint key sets (with small
    enough mass that some depth has zero bucket overlap) must return
    0 — never NULL — and a zero-overlap depth must be allowed to win
    the min (the sparse-cell inner join used to drop it). Checked on
    both engines (Spark operator + DuckDB oracle twin)."""
    import duckdb

    from top_produce_etl_spark.operators.countmin import (
        cms_build,
        cms_cells_oracle_sql,
        cms_join_size,
        cms_join_size_oracle_sql,
    )

    a = spark.createDataFrame([(f"a{i}",) for i in range(3)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(3)], "k string")
    got = cms_join_size(cms_build(a, "k"), cms_build(b, "k")).collect()
    assert got[0]["est_join_size"] == 0

    con = duckdb.connect()
    con.register("ta", a.toPandas())
    con.register("tb", b.toPandas())
    want = con.execute(
        cms_join_size_oracle_sql(
            cms_cells_oracle_sql("ta", "k"),
            cms_cells_oracle_sql("tb", "k"),
        )
    ).fetchone()[0]
    assert want == 0
