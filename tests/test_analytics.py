"""Unit tests for the round-4 analytics/scale operators: runtime
bloom-filter pruning, heavy hitters, cohort retention, outlier
fences, and int8-quantized ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.heavy import frequent_items_exact
from top_produce_etl_spark.operators.runtime_filter import (
    pruned_semi_join,
    runtime_filter_tuning,
)
from top_produce_etl_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_quantized,
    quantize_embeddings,
)


# ---------------------------------------------------------------- heavy


def _zipf_stream(spark, n=20_000, n_keys=5_000):
    """Deterministic zipf-ish stream: key = floor(n_keys / rank)
    concentrates mass on few small keys while the tail stays wide."""
    return spark.range(n).select(
        (
            F.lit(n_keys)
            / (F.pmod(F.xxhash64("id"), F.lit(n_keys)) + F.lit(1))
        )
        .cast("long")
        .cast("string")
        .alias("item")
    )


def test_frequent_items_matches_exact_groupby(spark):
    stream = _zipf_stream(spark)
    phi = 0.01
    got = {
        (r["item"], r["cnt"])
        for r in frequent_items_exact(
            stream, "item", phi=phi, capacity=256
        ).collect()
    }
    n = stream.count()
    import math

    want = {
        (r["item"], r["cnt"])
        for r in stream.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= math.ceil(n * phi))
        .collect()
    }
    assert got == want and len(want) > 0


def test_frequent_items_candidates_bounded_on_skew(spark):
    """On a skewed stream the MG stage must shrink the verify set
    far below the distinct-key count — that's the whole point of the
    sketch (the exact groupBy would shuffle every distinct key)."""
    stream = _zipf_stream(spark)
    distinct = stream.distinct().count()
    # reproduce the candidate stage only
    from top_produce_etl_spark.operators.heavy import (
        _TOTAL_KEY,
        _mg_partial,
        _SUMMARY_SCHEMA,
    )

    summaries = stream.mapInPandas(_mg_partial(256), _SUMMARY_SCHEMA)
    merged = summaries.groupBy("item").agg(F.sum("weight").alias("lb"))
    n = stream.count()
    cand = (
        merged.filter(F.col("item") != _TOTAL_KEY)
        .filter(F.col("lb") + n / 257 >= F.ceil(F.lit(n * 0.01)))
        .count()
    )
    assert cand < distinct / 4, (cand, distinct)


def test_frequent_items_rejects_bad_phi(spark):
    import pytest

    with pytest.raises(ValueError):
        frequent_items_exact(_zipf_stream(spark, 100), "item", phi=0.0)


# --------------------------------------------------- runtime filter


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """With cluster-scale thresholds tuned down and the broadcast
    path disabled, Catalyst must inject might_contain/bloom_filter
    aggregates into the semi-join — the runtime-filter scale path
    observed at test size."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    with runtime_filter_tuning(
        spark, app_side_scan_threshold="1KB", force_shuffle_join=True
    ):
        df = pruned_semi_join(lineitem, urgent, "l_orderkey", "o_orderkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        pruned_count = df.count()
    # and the rewrite is semantics-preserving vs the untouched plan
    plain = lineitem.join(
        urgent, lineitem.l_orderkey == urgent.o_orderkey, "left_semi"
    ).count()
    assert pruned_count == plain > 0


def test_runtime_filter_tuning_restores_confs(spark):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    with runtime_filter_tuning(spark, force_shuffle_join=True):
        assert (
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
        )
    after = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    assert after == before


# ------------------------------------------------------------ cohort


def test_cohort_retention_invariants(spark, sf_dir):
    from top_produce_etl_spark.operators.eventtime import cohort_retention

    events = load_table(spark, sf_dir, "events")
    rows = cohort_retention(events, "user_id", "ts").collect()
    assert rows
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_week"], []).append(r)
        assert 0.0 < r["retention"] <= 1.0
        assert r["week_offset"] >= 0
    for cohort, rs in by_cohort.items():
        base = [r for r in rs if r["week_offset"] == 0]
        assert len(base) == 1 and base[0]["retention"] == 1.0
        # retention never exceeds the cohort size
        assert all(r["n_active"] <= base[0]["n_active"] for r in rs)


# ----------------------------------------------------------- anomaly


def test_iqr_outliers_flag_exactly_the_fence_crossers(spark):
    from top_produce_etl_spark.operators.anomaly import iqr_outlier_rows

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 101)] + [("a", 500.0), ("a", 800.0)],
        "g string, v double",
    )
    out = iqr_outlier_rows(df, ["g"], "v", keep_cols=["g", "v"])
    vals = sorted(r["v"] for r in out.collect())
    # q1≈26.25 q3≈76.75, fence≈152.5 → only the two planted spikes
    assert vals == [500.0, 800.0]
    z = {r["v"]: r["zscore6"] for r in out.collect()}
    assert z[800.0] > z[500.0] > 2.0


# --------------------------------------------------------- quantized


def test_quantize_embeddings_range_and_norm(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb, "embedding")
    row = q.select(
        F.max(F.array_max("qvec")).alias("hi"),
        F.min(F.array_min("qvec")).alias("lo"),
        # every vector's max-|component| quantizes to exactly ±127
        F.min(
            F.array_max(F.transform("qvec", lambda x: F.abs(x)))
        ).alias("peak"),
    ).collect()[0]
    assert -127 <= row["lo"] and row["hi"] <= 127
    assert row["peak"] == 127


def test_quantized_topk_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_bruteforce(
            emb, queries, "vec_id", "embedding", k=3
        ).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_quantized(
            emb, queries, "vec_id", "embedding", k=3
        ).collect()
    }
    recall = len(exact & quant) / len(exact)
    # 8-bit rounding on 64 dims preserves neighbor ordering almost
    # everywhere; anything below this bound means the quantizer broke
    assert recall >= 0.9, recall


# ------------------------------------------------------------ funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_ordered_funnel_strict_order_and_window(spark):
    import datetime as dt

    from top_produce_etl_spark.operators.eventtime import ordered_funnel

    t = lambda d, h=0: dt.datetime(2024, 1, d, h)  # noqa: E731
    rows = [
        # u1: full path in order, inside the window
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: click BEFORE first view → strict order rejects it
        (2, t(1), "click"), (2, t(2), "view"), (2, t(3), "purchase"),
        # u3: click after the 7-day window → stops at step 1
        (3, t(1), "view"), (3, t(9), "click"),
        # u4: purchase without click → step 2 never reached, so 3
        # can't be either (ordered semantics, not set semantics)
        (4, t(1), "view"), (4, t(2), "purchase"),
        # u5: never does step 1 → absent from the result
        (5, t(1), "click"), (5, t(2), "purchase"),
    ]
    out = {
        r["user_id"]: r["step_reached"]
        for r in ordered_funnel(
            _ev(spark, rows), "user_id", "ts", "event_type",
            steps=["view", "click", "purchase"], within="7 DAYS",
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 1, 4: 1}


def test_ordered_funnel_no_window_allows_any_gap(spark):
    import datetime as dt

    from top_produce_etl_spark.operators.eventtime import ordered_funnel

    rows = [
        (1, dt.datetime(2024, 1, 1), "view"),
        (1, dt.datetime(2024, 3, 1), "click"),
    ]
    out = ordered_funnel(
        _ev(spark, rows), "user_id", "ts", "event_type",
        steps=["view", "click"],
    ).collect()
    assert out[0]["step_reached"] == 2


def test_transition_matrix_probabilities_sum_to_one(spark, sf_dir):
    from top_produce_etl_spark.operators.eventtime import transition_matrix

    events = load_table(spark, sf_dir, "events")
    rows = transition_matrix(
        events, "user_id", "ts", "event_type", "event_id"
    ).collect()
    from collections import defaultdict

    sums = defaultdict(float)
    for r in rows:
        sums[r["prev_type"]] += r["p"]
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


# ---------------------------------------------------------- pagerank


def test_pagerank_known_graph(spark):
    from top_produce_etl_spark.operators.graph import pagerank

    # star: a->b, c->b (unit weights): b accrues, a/c stay at base
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("c", "b", 1.0)], "s string, d string, w double"
    )
    r = {
        row["node"]: row["rank"]
        for row in pagerank(edges, "s", "d", "w", iterations=3).collect()
    }
    base = round((1 - 0.85) / 3, 6)
    assert r["a"] == base and r["c"] == base
    # b = base + 0.85*(r_a + r_c) after convergence of the leaves
    assert abs(r["b"] - (base + 0.85 * 2 * base)) < 1e-6
    assert sum(r.values()) <= 1.0 + 1e-9  # dangling b leaks mass


def test_pagerank_dangling_redistribution_conserves_mass(spark):
    """Both variants on the same dangling graph (star a->b, c->b; b
    has no out-edges): the default leaks b's mass, the redistributing
    variant conserves Σrank = 1 (up to 6dp rounding) and boosts every
    node by the spread D/N term."""
    from top_produce_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("c", "b", 1.0)], "s string, d string, w double"
    )
    leak = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "s", "d", "w", iterations=3).collect()
    }
    cons = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, "s", "d", "w", iterations=3, redistribute_dangling=True
        ).collect()
    }
    assert sum(leak.values()) < 0.75  # the leak is real on this graph
    assert abs(sum(cons.values()) - 1.0) < 1e-4  # conserved
    # redistribution only ADDS mass, uniformly
    assert all(cons[n] > leak[n] for n in leak)
    # hand-check round 1: D_0 = 1/3 -> every node gets d*D/N on top
    base, d = 1 / 3, 0.85
    one = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, "s", "d", "w", iterations=1, redistribute_dangling=True
        ).collect()
    }
    spread = d * round(base, 6) / 3
    assert abs(one["a"] - ((1 - d) / 3 + spread)) < 1e-6
    assert abs(one["b"] - ((1 - d) / 3 + d * 2 * round(base, 6) + spread)) < 2e-6


def test_pagerank_weight_proportionality(spark):
    from top_produce_etl_spark.operators.graph import pagerank

    # a splits 3:1 between b and c → contributions split 3:1
    edges = spark.createDataFrame(
        [("a", "b", 3.0), ("a", "c", 1.0)], "s string, d string, w double"
    )
    r = {
        row["node"]: row["rank"]
        for row in pagerank(edges, "s", "d", "w", iterations=1).collect()
    }
    base = round(1 / 3, 6)
    d = 0.85
    assert abs(r["b"] - ((1 - d) / 3 + d * base * 0.75)) < 1e-6
    assert abs(r["c"] - ((1 - d) / 3 + d * base * 0.25)) < 1e-6


def test_personalized_pagerank_restarts_at_seeds(spark):
    from top_produce_etl_spark.operators.graph import pagerank

    # a→b→c→a triangle plus an off-path d→a: seeding on {a} puts
    # r0 = (1, 0, 0, 0) and every teleport lands back on a — d gets
    # NO inflow and NO teleport, so its rank pins to exactly 0,
    # while in classic PageRank d holds (1-damping)/4 > 0
    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0),
         ("d", "a", 1.0)],
        "s string, d string, w double",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    ppr = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, "s", "d", "w", iterations=3, seeds=seeds
        ).collect()
    }
    classic = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "s", "d", "w", iterations=3).collect()
    }
    assert ppr["d"] == 0.0 and classic["d"] > 0
    assert ppr["a"] > ppr["b"] > 0  # proximity ordering from the seed
    # round 1 exact: r1(a) = 0.15·1 + 0.85·(r0(c)·1 + r0(d)·1) = 0.15
    one = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, "s", "d", "w", iterations=1, seeds=seeds
        ).collect()
    }
    assert abs(one["a"] - 0.15) < 1e-9
    assert abs(one["b"] - 0.85) < 1e-9  # all of a's r0 flows to b


def test_personalized_pagerank_dangling_returns_to_seeds(spark):
    from top_produce_etl_spark.operators.graph import pagerank

    # a→b where b dangles; seed {a}: with redistribution b's parked
    # mass re-enters at a (not uniformly), so total mass stays 1
    edges = spark.createDataFrame(
        [("a", "b", 1.0)], "s string, d string, w double"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    r = {
        row["node"]: row["rank"]
        for row in pagerank(
            edges, "s", "d", "w", iterations=3, seeds=seeds,
            redistribute_dangling=True,
        ).collect()
    }
    assert abs(sum(r.values()) - 1.0) < 1e-4


# --------------------------------------------- histogram quantiles


def test_histogram_quantile_close_to_exact(spark, sf_dir):
    """Histogram estimates vs exact order-statistic percentiles on
    the DENSE lifetime grain. The in-bin interpolation error is ≤
    one bin width; comparing against order-statistic percentiles
    adds at most one local inter-point gap (the q·N vs 1+(n−1)·q
    position conventions differ by <1 rank), so 2× width is the
    honest bound — per-month groups at sf0.001 (~19 rows) are too
    sparse for any bin-width-scale bound and are exercised by the
    oracle query instead."""
    from top_produce_etl_spark.operators.sketches import (
        binned_histogram,
        histogram_quantiles,
    )

    orders = load_table(spark, sf_dir, "orders")
    lifetime = binned_histogram(
        orders, F.lit("all"), "o_totalprice",
        lo=0.0, hi=512000.0, n_bins=128,
    )
    est = histogram_quantiles(
        lifetime, [0.5, 0.9], lo=0.0, hi=512000.0, n_bins=128
    ).collect()[0]
    exact = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
    ).collect()[0]
    width = 512000.0 / 128
    assert abs(est["est_p50"] - exact["p50"]) <= 2 * width
    assert abs(est["est_p90"] - exact["p90"]) <= 2 * width


def test_histogram_merge_is_lossless(spark, sf_dir):
    """Monthly-from-daily must equal monthly-direct — the property
    that makes the stored rollup trustworthy (HLL-union analogue)."""
    from top_produce_etl_spark.operators.sketches import (
        binned_histogram,
        merge_histograms,
    )

    orders = load_table(spark, sf_dir, "orders")
    daily = binned_histogram(
        orders, F.date_trunc("day", F.col("o_orderdate")),
        "o_totalprice", lo=0.0, hi=512000.0, n_bins=128,
    )
    via_daily = {
        (r["grain"], r["bin"]): r["cnt"]
        for r in merge_histograms(
            daily, F.date_trunc("month", F.col("grain"))
        ).collect()
    }
    direct = {
        (r["grain"], r["bin"]): r["cnt"]
        for r in binned_histogram(
            orders, F.date_trunc("month", F.col("o_orderdate")),
            "o_totalprice", lo=0.0, hi=512000.0, n_bins=128,
        ).collect()
    }
    assert via_daily == direct


# ----------------------------------------------------- text quality


def test_repetition_stats_detects_planted_repetition(spark):
    from top_produce_etl_spark.operators.textquality import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight"),
            (3, "ab"),  # shorter than the n-gram → zero fractions
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs, "doc_id", "text").collect()}
    # all trigrams identical → 3 dup of 4; all tokens identical
    assert abs(out[1]["dup_3gram_frac"] - 3 / 4) < 1e-12
    assert out[1]["top_token_frac"] == 1.0
    assert out[2]["dup_3gram_frac"] == 0.0
    assert abs(out[2]["top_token_frac"] - 1 / 8) < 1e-12
    assert out[3]["dup_3gram_frac"] == 0.0 and out[3]["top_token_frac"] == 1.0


def test_repetition_stats_plan_is_narrow(spark, sf_dir):
    """The whole point: per-doc stats with no exchange at all."""
    from top_produce_etl_spark.operators.textquality import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        repetition_stats(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


# ------------------------------------------------- incremental agg


def test_merge_agg_state_equals_full_recompute(spark, sf_dir):
    from top_produce_etl_spark.operators.merge import merge_agg_state

    events = load_table(spark, sf_dir, "events")

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        )

    cutoff = F.lit("2024-01-15").cast("timestamp")
    merged = merge_agg_state(
        partial(events.filter(F.col("ts") < cutoff)),
        partial(events.filter(F.col("ts") >= cutoff)),
        keys="event_type",
        sum_cols=["s"],
    )
    got = {(r["event_type"], r["cnt"], r["s"]) for r in merged.collect()}
    want = {(r["event_type"], r["cnt"], r["s"]) for r in partial(events).collect()}
    assert got == want


def test_merge_agg_state_is_iterable(spark):
    """Folding two deltas one at a time equals folding their union —
    associativity, the property that lets the state roll forward
    day after day."""
    from top_produce_etl_spark.operators.merge import merge_agg_state

    def frame(rows):
        return spark.createDataFrame(rows, "k string, cnt long, s long")

    state = frame([("a", 2, 10), ("b", 1, 5)])
    d1 = frame([("a", 1, 7)])
    d2 = frame([("c", 3, 9), ("a", 1, 1)])
    step = merge_agg_state(
        merge_agg_state(state, d1, "k", ["s"]), d2, "k", ["s"]
    )
    at_once = merge_agg_state(
        state, d1.unionByName(d2), "k", ["s"]
    )
    assert {tuple(r) for r in step.collect()} == {
        tuple(r) for r in at_once.collect()
    } == {("a", 4, 18), ("b", 1, 5), ("c", 3, 9)}


def test_gapfill_edges(spark):
    """Gapfill: locf carries values across holes, zero fills counts,
    single-bucket series yields one non-gap row, bad fill rejects."""
    import datetime as dt

    import pytest
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.eventtime import gapfill

    t = lambda d: dt.datetime(2025, 1, d)  # noqa: E731
    df = spark.createDataFrame(
        [("a", t(1), 10.0), ("a", t(4), 40.0), ("b", t(2), 5.0)],
        "k string, ts timestamp, v double",
    )
    locf = {
        (r.k, r.ts.day): (r.v, r.is_gap)
        for r in gapfill(df, "k", "ts", "v", "1 day", "locf").collect()
    }
    assert locf == {
        ("a", 1): (10.0, False),
        ("a", 2): (10.0, True),
        ("a", 3): (10.0, True),
        ("a", 4): (40.0, False),
        ("b", 2): (5.0, False),
    }
    zero = gapfill(df, "k", "ts", "v", "1 day", "zero")
    assert zero.filter(F.col("is_gap")).agg(F.sum("v")).first()[0] == 0.0
    nul = gapfill(df, "k", "ts", "v", "1 day", "null")
    assert nul.filter(F.col("is_gap") & F.col("v").isNotNull()).count() == 0
    with pytest.raises(ValueError):
        gapfill(df, "k", "ts", "v", "1 day", "interpolate")


def test_pairwise_stats_exact_and_guarded(spark):
    """Known tiny dataset: corr(x,y)=1 for y=2x; constant column
    yields NULL corr/beta; two-pass equality (determinism)."""
    import pytest

    from top_produce_etl_spark.operators.stats import pairwise_stats

    df = spark.createDataFrame(
        [(1.0, 2.0, 7.0), (2.0, 4.0, 7.0), (3.0, 6.0, 7.0)],
        "x double, y double, c double",
    )
    rows = {
        (r.x, r.y): (r.n, r.corr_micro, r.beta_micro)
        for r in pairwise_stats(df, ["x", "y", "c"]).collect()
    }
    assert rows[("x", "y")] == (3, 1_000_000, 2_000_000)  # y = 2x exactly
    # zero variance in c: corr undefined; slope of c~x is exactly 0
    assert rows[("x", "c")] == (3, None, 0)
    rows2 = {
        (r.x, r.y): (r.n, r.corr_micro, r.beta_micro)
        for r in pairwise_stats(df, ["x", "y", "c"]).collect()
    }
    assert rows == rows2
    with pytest.raises(ValueError):
        pairwise_stats(df, ["x"])


def test_multi_touch_attribution_weights(spark):
    """Position model: n=1 -> 100%; n=2 -> 50/50; n=4 -> 40/10/10/40;
    weights sum to 1e6 per conversion; linear model uniform."""
    import datetime as dt

    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.attribution import (
        multi_touch_attribution,
    )

    t = lambda d, h=0: dt.datetime(2025, 1, d, h)  # noqa: E731
    conv = spark.createDataFrame(
        [(1, 101, t(8), 100.0), (2, 102, t(8), 100.0),
         (3, 103, t(8), 100.0)],
        "user_id long, pid long, ts timestamp, value double",
    )
    touches = spark.createDataFrame(
        [(1, 11, t(7, 1)),
         (2, 21, t(7, 1)), (2, 22, t(7, 2)),
         (3, 31, t(7, 1)), (3, 32, t(7, 2)), (3, 33, t(7, 3)),
         (3, 34, t(7, 4)),
         (3, 35, t(20))],  # AFTER conversion: excluded
        "user_id long, cid long, ts timestamp",
    )
    got = multi_touch_attribution(
        conv, touches, "user_id", "pid", "ts", "value", "cid", "ts",
        lookback="7 days", model="position",
    )
    by_conv = {}
    for r in got.collect():
        by_conv.setdefault(r.pid, {})[r.cid] = r.weight_micro
    assert by_conv[101] == {11: 1_000_000}
    assert by_conv[102] == {21: 500_000, 22: 500_000}
    assert by_conv[103] == {31: 400_000, 32: 100_000, 33: 100_000,
                            34: 400_000}
    sums = got.groupBy("pid").agg(F.sum("weight_micro").alias("s")).collect()
    assert all(r.s == 1_000_000 for r in sums)

    lin = multi_touch_attribution(
        conv, touches, "user_id", "pid", "ts", "value", "cid", "ts",
        lookback="7 days", model="linear",
    )
    w3 = {r.cid: r.weight_micro for r in lin.filter("pid = 103").collect()}
    assert set(w3.values()) == {250_000}


def test_chi_squared_known_value(spark):
    """2x2 table [[10,20],[20,10]]: chi2 = 60*(10*10-20*20)^2 /
    (30*30*30*30) = 6.666..., dof 1."""
    from top_produce_etl_spark.operators.stats import chi_squared

    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 20
        + [("b", "x")] * 20 + [("b", "y")] * 10
    )
    df = spark.createDataFrame(rows, "g string, h string")
    r = chi_squared(df, "g", "h").first()
    assert r.n == 60 and r.dof == 1
    assert abs(r.chi2_micro - 6_666_667) <= 2  # 20/3 ≈ 6.666667


def test_seasonal_zscores_detects_planted_spike(spark):
    """Synthetic 6 weeks of flat weekday counts with one spiked
    Tuesday: that day gets the max z; same-weekday flat days stay
    near zero; zero-variance seasons yield NULL."""
    import datetime as dt

    from top_produce_etl_spark.operators.anomaly import seasonal_zscores

    rows = []
    eid = 0
    base = dt.datetime(2025, 1, 6)  # a Monday
    for week in range(6):
        for dow in range(7):
            day = base + dt.timedelta(days=week * 7 + dow)
            n = 10
            if dow == 1 and week == 3:  # spiked Tuesday
                n = 50
            if dow == 5:
                n = 7  # Saturdays flat at a different level (var 0)
            for _ in range(n):
                rows.append((eid, day))
                eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r.day.date(): (r.z_micro, r.n) for r in
           seasonal_zscores(df, "ts").collect()}
    spike_day = (base + dt.timedelta(days=3 * 7 + 1)).date()
    zs = {d: z for d, (z, _) in out.items() if z is not None}
    assert max(zs, key=zs.get) == spike_day
    sat = (base + dt.timedelta(days=5)).date()
    assert out[sat][0] is None  # zero-variance season


def test_interval_guard_rejects_injection(spark):
    import datetime as dt

    import pytest

    from top_produce_etl_spark.operators.eventtime import (
        check_interval,
        gapfill,
    )

    assert check_interval("1 day") == "1 day"
    assert check_interval("30 MINUTES") == "30 MINUTES"
    for bad in ("1 day'--", "day", "1; DROP", "1 fortnight"):
        with pytest.raises(ValueError):
            check_interval(bad)
    df = spark.createDataFrame(
        [("a", dt.datetime(2025, 1, 1), 1.0)],
        "k string, ts timestamp, v double",
    )
    with pytest.raises(ValueError):
        gapfill(df, "k", "ts", "v", step="1 day) --", fill="zero")


def test_distribution_divergence_properties(spark):
    """Identical slices -> 0 everywhere; disjoint supports -> JS
    approaches ln 2; KL is asymmetric on a skewed pair; all checked
    in exact micro-nats."""
    from top_produce_etl_spark.operators.stats import (
        distribution_divergence,
    )

    same = spark.createDataFrame(
        [(f"c{i % 10}",) for i in range(1000)], "c string"
    )
    r = distribution_divergence(same, same, "c").collect()[0]
    assert (r["kl_ab_micro"], r["kl_ba_micro"], r["js_micro"]) == (0, 0, 0)
    assert r["vocab"] == 10 and r["n_a"] == 1000

    a = spark.createDataFrame([(f"a{i % 50}",) for i in range(5000)], "c string")
    b = spark.createDataFrame([(f"b{i % 50}",) for i in range(5000)], "c string")
    r = distribution_divergence(a, b, "c").collect()[0]
    assert 600_000 < r["js_micro"] <= 693_148  # ln 2 bound

    skew_a = spark.createDataFrame(
        [("x",)] * 900 + [("y",)] * 100, "c string"
    )
    skew_b = spark.createDataFrame(
        [("x",)] * 500 + [("y",)] * 500, "c string"
    )
    r = distribution_divergence(skew_a, skew_b, "c").collect()[0]
    assert r["kl_ab_micro"] != r["kl_ba_micro"]
    assert r["js_micro"] > 0


def test_distribution_divergence_duckdb_parity(spark):
    import duckdb

    from top_produce_etl_spark.operators.stats import (
        distribution_divergence,
        distribution_divergence_oracle_sql,
    )

    rows_a = [(f"t{(i * 13) % 37}",) for i in range(777)]
    rows_b = [(f"t{(i * 7) % 23}",) for i in range(555)]
    a = spark.createDataFrame(rows_a, "c string")
    b = spark.createDataFrame(rows_b, "c string")
    got = distribution_divergence(a, b, "c").collect()[0].asDict()
    con = duckdb.connect()
    con.register("ra", a.toPandas())
    con.register("rb", b.toPandas())
    cols, vals = zip(*got.items())
    want = con.execute(
        distribution_divergence_oracle_sql("ra", "rb", "c")
    ).fetchdf().iloc[0]
    for k in cols:
        assert int(want[k]) == int(got[k]), (k, want[k], got[k])


def test_cusum_detects_planted_level_shift(spark):
    """Planted mean shift at t=100: the UP alarm must fire only
    after the shift, the DOWN alarm only in the low first half
    (two-sided CUSUM against the whole-series mean), and both
    statistics clamp at 0 where the running min resets."""
    from top_produce_etl_spark.operators.anomaly import (
        cusum_changepoints,
    )

    rows = [("s", t, 10.0) for t in range(100)]
    rows += [("s", t, 20.0) for t in range(100, 200)]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    out = {
        r["t"]: r
        for r in cusum_changepoints(df, ["grp"], "t", "v").collect()
    }
    assert len(out) == 200
    assert out[0]["s_pos_micro"] == 0  # clamp at the start
    ups = sorted(t for t, r in out.items() if r["alarm_up"])
    downs = sorted(t for t, r in out.items() if r["alarm_down"])
    assert ups and min(ups) >= 100  # fires only after the shift
    assert max(ups) == 199  # and stays latched to the end
    # the low-side alarm arms DURING the low first half and decays
    # (no post-alarm reset in tabular CUSUM) within ~S/7.5 steps of
    # the shift — it must start early and die out well before the end
    assert downs and min(downs) < 100 and max(downs) < 150


def test_cusum_duckdb_parity(spark):
    import duckdb

    from top_produce_etl_spark.operators.anomaly import (
        cusum_changepoints,
        cusum_oracle_sql,
    )

    rows = [
        ("a", t, float(10 + (t * 7) % 5 + (5 if t > 30 else 0)))
        for t in range(60)
    ] + [("b", t, float((t * 3) % 11)) for t in range(40)]
    df = spark.createDataFrame(rows, "grp string, t int, v double")
    got = {
        (r["grp"], r["t"]): (
            r["s_pos_micro"], r["s_neg_micro"],
            r["alarm_up"], r["alarm_down"],
        )
        for r in cusum_changepoints(df, ["grp"], "t", "v").collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        (g, t): (sp, sn, au, ad)
        for g, t, _v, sp, sn, au, ad in con.execute(
            cusum_oracle_sql("t", ["grp"], "t", "v")
        ).fetchall()
    }
    assert got == want and len(got) == 100


def test_cusum_rejects_bad_params(spark):
    import pytest

    from top_produce_etl_spark.operators.anomaly import (
        cusum_changepoints,
    )

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, t int, v double")
    with pytest.raises(ValueError, match="k_milli"):
        cusum_changepoints(df, ["g"], "t", "v", k_milli=-1)


def test_mad_outliers_robust_to_contamination(spark):
    """The property that kills the moment z-score: 5 wild rows in a
    tight group inflate stddev so badly the classic 3-sigma screen
    misses them — MAD flags all 5 and nothing else."""
    from top_produce_etl_spark.operators.anomaly import (
        mad_outlier_rows,
    )

    # 20% contamination: the masking regime (mean ~20k, stddev ~40k
    # -> the wild rows' classic z is ~2, under any 3.5 screen)
    rows = [("g", i, 100.0 + (i % 7) * 0.5) for i in range(80)]
    rows += [("g", 100 + i, 100000.0 + i) for i in range(20)]  # wild
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    got = {
        r["id"]
        for r in mad_outlier_rows(
            df, ["grp"], "v", keep_cols=["grp", "id"]
        ).collect()
    }
    assert got == {100 + i for i in range(20)}
    # contrast: classic z at 3.5 sigma misses ALL of them
    from pyspark.sql import functions as F

    stats = df.groupBy("grp").agg(
        F.avg("v").alias("m"), F.stddev("v").alias("s")
    )
    z_flagged = (
        df.join(stats, "grp")
        .where((F.col("v") - F.col("m")) / F.col("s") > 3.5)
        .count()
    )
    assert z_flagged == 0


def test_mad_outliers_zero_mad_guard(spark):
    """A constant group (MAD 0) must flag nothing, not divide by
    zero."""
    from top_produce_etl_spark.operators.anomaly import (
        mad_outlier_rows,
    )

    df = spark.createDataFrame(
        [("g", i, 5.0) for i in range(10)], "grp string, id long, v double"
    )
    assert mad_outlier_rows(df, ["grp"], "v").count() == 0
