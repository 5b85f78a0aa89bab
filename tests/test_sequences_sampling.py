"""Round-5 operator wave: session path mining, trailing EWMA,
weighted reservoir sampling, boilerplate stripping, and label
propagation. Oracle parity is locked by the extended battery
(session_top_paths, ewma_daily_revenue, weighted_sample_orders,
strip_boilerplate_docs, supply_communities_lpa); these tests pin the
operator-level contracts the oracles can't see — truncation,
determinism under repartitioning, null/edge handling, and known
tiny-input answers.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.operators.graph import label_propagation
from top_produce_etl_spark.operators.sequences import session_paths, top_paths
from top_produce_etl_spark.operators.splits import weighted_reservoir
from top_produce_etl_spark.operators.stats import (
    ewma_weights,
    trailing_ewma,
)
from top_produce_etl_spark.operators.textquality import strip_boilerplate


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def test_session_paths_orders_truncates_and_marks(spark):
    rows = [
        # one user, one session of 4 events (gap < 30m), shuffled input
        ("u1", _ts(3), 3, "c"),
        ("u1", _ts(0), 1, "a"),
        ("u1", _ts(1), 2, "b"),
        ("u1", _ts(5), 4, "d"),
        # second session after a 40-minute gap
        ("u1", _ts(45), 5, "x"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "step"])
    out = session_paths(
        df, "user_id", "ts", "step", "event_id",
        gap="30 minutes", max_steps=3,
    ).orderBy("session_start")
    got = [(r.path, r.n_steps) for r in out.collect()]
    # 4 steps truncated at 3 with the ellipsis marker; order is by ts
    assert got == [("a>b>c>…", 4), ("x", 1)]


def test_session_paths_tiebreak_on_equal_ts(spark):
    rows = [("u", _ts(0), 2, "late"), ("u", _ts(0), 1, "early")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id", "step"])
    out = session_paths(df, "user_id", "ts", "step", "event_id")
    assert out.collect()[0].path == "early>late"


def test_top_paths_deterministic_tie_cut(spark):
    paths = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",)], ["path"]
    )
    # counts: a=2, b=1, c=1 — the n=2 cut must take (a, b): count
    # DESC then path ASC.
    got = {r.path: r.n_sessions for r in top_paths(paths, 2).collect()}
    assert got == {"a": 2, "b": 1}
    with pytest.raises(ValueError):
        top_paths(paths, 0)


def test_ewma_matches_hand_series_and_renormalizes_head(spark):
    df = spark.createDataFrame(
        [("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 30.0)],
        ["key", "t", "x"],
    )
    out = {
        r.t: r.ewma_micro
        for r in trailing_ewma(
            df, ["key"], ["t"], "x", alpha=0.5, span=3
        ).collect()
    }
    # adjust=True semantics: head rows renormalize over existing lags
    assert out[1] == 10_000_000
    assert out[2] == round((20 + 0.5 * 10) / 1.5 * 1e6)
    assert out[3] == round((30 + 0.5 * 20 + 0.25 * 10) / 1.75 * 1e6)


def test_ewma_weights_guards():
    assert ewma_weights(1.0, 2) == [1.0, 0.0]
    with pytest.raises(ValueError):
        ewma_weights(0.0, 3)
    with pytest.raises(ValueError):
        ewma_weights(0.5, 0)


def test_weighted_reservoir_exact_n_stable_and_filters(spark):
    df = spark.createDataFrame(
        [(i, "g" + str(i % 2), float(i + 1)) for i in range(40)]
        + [(100, "g0", 0.0), (101, "g1", None)],
        ["k", "g", "w"],
    )
    a = weighted_reservoir(df, "k", "w", 5, group_cols=["g"])
    got = sorted(r.k for r in a.collect())
    assert len(got) == 10  # exactly 5 per group
    assert 100 not in got and 101 not in got  # zero/null weight out
    # deterministic under repartitioning
    b = weighted_reservoir(
        df.repartition(7, "g"), "k", "w", 5, group_cols=["g"]
    )
    assert sorted(r.k for r in b.collect()) == got
    # a different salt is an independent draw (overwhelmingly)
    c = weighted_reservoir(df, "k", "w", 5, group_cols=["g"], salt="wrs-v2")
    assert sorted(r.k for r in c.collect()) != got
    # global (ungrouped) path: TakeOrderedAndProject, same contract
    g = weighted_reservoir(df, "k", "w", 3)
    assert g.count() == 3
    assert "__r" not in g.columns


def test_weighted_reservoir_prefers_heavy_rows(spark):
    # one row carries ~all the mass: it must be sampled for any salt
    df = spark.createDataFrame(
        [(0, 1e12)] + [(i, 1e-6) for i in range(1, 30)], ["k", "w"]
    )
    for salt in ("s1", "s2", "s3"):
        got = {r.k for r in weighted_reservoir(df, "k", "w", 1, salt=salt).collect()}
        assert got == {0}, salt


def test_strip_boilerplate_known_corpus(spark):
    shared = "alpha beta gamma delta"  # one 4-token chunk, in 2 docs
    docs = spark.createDataFrame(
        [
            (1, shared + " unique one two three"),
            (2, shared),
            (3, "solo words only here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.id: r
        for r in strip_boilerplate(docs, "doc_id", "text", 4, 2).collect()
    }
    assert out[1].cleaned_text == "unique one two three"
    assert out[1].n_chunks == 2 and out[1].n_removed == 1
    # fully-boilerplate doc still emits a row, with empty text
    assert out[2].cleaned_text == "" and out[2].n_removed == 1
    # untouched doc passes through byte-identical
    assert out[3].cleaned_text == "solo words only here"
    assert out[3].n_removed == 0
    with pytest.raises(ValueError):
        strip_boilerplate(docs, "doc_id", "text", 4, 1)


def test_label_propagation_two_cliques(spark):
    # two triangles joined by one weak bridge: each triangle must
    # converge to its own min node label; the bridge must not merge
    # them (triangle edges w=10 vs bridge w=1).
    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("x", "y"), ("y", "z"), ("x", "z")]
    edges = spark.createDataFrame(
        [(u, v, 10) for u, v in tri1 + tri2] + [("c", "x", 1)],
        ["u", "v", "w"],
    )
    got = {
        r.node: r.label
        for r in label_propagation(edges, "u", "v", "w", 4).collect()
    }
    assert {got[n] for n in "abc"} == {"a"}
    assert {got[n] for n in "xyz"} == {"x"}
    with pytest.raises(ValueError):
        label_propagation(edges, "u", "v", "w", 0)


def test_mmr_diversifies_against_pure_relevance(spark):
    from top_produce_etl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        mmr_topk,
    )

    # corpus: two near-identical high-relevance vectors (1, 2), one
    # moderately relevant orthogonal-ish vector (3). Pure top-2 takes
    # {1, 2}; MMR must swap the redundant twin for the diverse doc.
    rows = [
        (0, [1.0, 0.0, 0.0]),       # query
        (1, [0.99, 0.1, 0.0]),
        (2, [0.99, 0.11, 0.0]),
        (3, [0.6, 0.0, 0.8]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 0)
    rel = cosine_topk_bruteforce(df, q, "vec_id", "embedding", k=2)
    assert {r.neighbor_id for r in rel.collect()} == {1, 2}
    mmr = mmr_topk(
        df, q, "vec_id", "embedding", k=2, pool=3,
        rel_weight=50, div_weight=50,
    )
    got = {r.mmr_rank: r.neighbor_id for r in mmr.collect()}
    assert got[1] in (1, 2)  # round 1 is pure relevance
    assert got[2] == 3       # round 2 penalizes the twin
    with pytest.raises(ValueError):
        mmr_topk(df, q, "vec_id", "embedding", k=5, pool=3)


def test_grouped_trend_known_slope(spark):
    from top_produce_etl_spark.operators.stats import grouped_trend

    df = spark.createDataFrame(
        # g1: y = 2x + 1 exactly; g2: constant (zero variance in y);
        # g3: single point (zero variance in x)
        [("g1", 1.0, 3.0), ("g1", 2.0, 5.0), ("g1", 3.0, 7.0),
         ("g2", 1.0, 4.0), ("g2", 2.0, 4.0),
         ("g3", 5.0, 9.0)],
        ["g", "x", "y"],
    )
    out = {r.g: r for r in grouped_trend(df, ["g"], "x", "y").collect()}
    assert out["g1"].beta_micro == 2_000_000
    assert out["g1"].corr_micro == 1_000_000
    assert out["g2"].beta_micro == 0 and out["g2"].corr_micro is None
    assert out["g3"].beta_micro is None
    with pytest.raises(ValueError):
        grouped_trend(df, [], "x", "y")


def test_standardize_embeddings_known_values(spark):
    from top_produce_etl_spark.operators.similarity import (
        standardize_embeddings,
    )

    # dim 0: values 0,10 → mean 5, pop-std 5 → z = ∓1
    # dim 1: constant → zero variance → NULL z
    df = spark.createDataFrame(
        [(1, [0.0, 7.0]), (2, [10.0, 7.0])], ["vec_id", "embedding"]
    )
    out = {
        r.id: r.z_micro
        for r in standardize_embeddings(df, "vec_id", "embedding", 2).collect()
    }
    assert out[1] == [-1_000_000, None]
    assert out[2] == [1_000_000, None]
    with pytest.raises(ValueError):
        standardize_embeddings(df, "vec_id", "embedding", 0)


def test_loo_target_encode_known_values(spark):
    from top_produce_etl_spark.operators.stats import loo_target_encode

    df = spark.createDataFrame(
        [("A", 10.0), ("A", 20.0), ("A", 30.0), ("B", 7.0)],
        ["cat", "y"],
    )
    out = loo_target_encode(df, "cat", "y").collect()
    got = {(r.cat, r.y): r.loo_micro for r in out}
    assert got[("A", 10.0)] == 25_000_000  # mean of 20, 30
    assert got[("A", 20.0)] == 20_000_000  # mean of 10, 30
    assert got[("B", 7.0)] is None         # singleton: no peers


def test_user_survival_km_censoring_and_curve(spark):
    from top_produce_etl_spark.operators.eventtime import user_survival_km

    d0 = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = []
    # three users, same cohort week, all long-dead (churned):
    # lifetimes 0, 1, 2 days
    for uid, life in [(1, 0), (2, 1), (3, 2)]:
        rows.append((uid, d0))
        if life:
            rows.append((uid, d0 + life * day))
    # a fourth user active at the corpus edge → censored
    rows += [(4, d0), (4, d0 + 30 * day)]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {
        r.life_days: r
        for r in user_survival_km(df, "user_id", "ts", 7).collect()
    }
    import math

    # t=0: 4 at risk, 1 churned → ln(3/4)
    assert out[0].n_risk == 4 and out[0].d_churned == 1
    assert out[0].log_surv_micro == round(math.log(3 / 4) * 1e6)
    # t=1: 3 at risk, 1 churned → cumulative ln(3/4)+ln(2/3)
    assert out[1].log_surv_micro == (
        round(math.log(3 / 4) * 1e6) + round(math.log(2 / 3) * 1e6)
    )
    # t=2: 2 at risk, 1 churned; curve stays alive (censored user)
    assert out[2].n_risk == 2 and out[2].log_surv_micro is not None
    # t=30: the censored user: 1 at risk, 0 churned, factor ln(1)=0
    assert out[30].d_churned == 0
    with pytest.raises(ValueError):
        user_survival_km(df, "user_id", "ts", -1)


def test_pair_rules_known_baskets(spark):
    from top_produce_etl_spark.operators.basket import pair_rules

    # baskets: {x,y} twice, {x,y,z} once, {z} once → N=4
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"),
            (3, "x"), (3, "y"), (3, "z"), (4, "z"),
            (1, "x")]  # duplicate line must not inflate counts
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {(r.item_a, r.item_b): r for r in pair_rules(df, "basket", "item", 2).collect()}
    xy = out[("x", "y")]
    assert xy.n_pairs == 3
    assert xy.support_micro == 750_000          # 3/4
    assert xy.conf_a_to_b_micro == 1_000_000    # 3/3
    assert xy.lift_micro == round(3 * 4 / (3 * 3) * 1e6)
    assert ("x", "z") not in out                # co-count 1 < min 2
    with pytest.raises(ValueError):
        pair_rules(df, "basket", "item", 0)


def test_two_proportion_ztest_known_counts(spark):
    import math

    from top_produce_etl_spark.operators.stats import two_proportion_ztest

    # arm 0: 2/4 convert; arm 1: 3/4 convert
    rows = [(0, 1), (0, 1), (0, 0), (0, 0),
            (1, 1), (1, 1), (1, 1), (1, 0)]
    df = spark.createDataFrame(rows, ["arm", "success"])
    r = two_proportion_ztest(df, "arm", "success").collect()[0]
    assert (r.n0, r.x0, r.n1, r.x1) == (4, 2, 4, 3)
    assert r.lift_micro == 250_000
    pp = 5 / 8
    z = (0.75 - 0.5) / math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 4))
    assert r.z_micro == round(z * 1e6)
    # degenerate: all one arm → NULL z
    one = spark.createDataFrame([(1, 1), (1, 0)], ["arm", "success"])
    assert two_proportion_ztest(one, "arm", "success").collect()[0].z_micro is None


def test_cuped_perfect_covariate_removes_all_variance(spark):
    from top_produce_etl_spark.operators.stats import cuped_adjusted_lift

    # Y == X exactly: theta = 1, rho² = 1, and the adjusted lift
    # must collapse to 0 (the raw lift was pure pre-period imbalance)
    df = spark.createDataFrame(
        [(0, 1.0, 1.0), (0, 3.0, 3.0), (1, 2.0, 2.0), (1, 4.0, 4.0)],
        ["arm", "x", "y"],
    )
    r = cuped_adjusted_lift(df, "arm", "x", "y").collect()[0]
    assert (r.n0, r.n1) == (2, 2)
    assert r.theta_micro == 1_000_000
    assert r.rho2_micro == 1_000_000
    assert r.lift_micro == 1_000_000
    assert r.adj_lift_micro == 0
    # degenerate: zero covariate variance → NULL theta, raw lift kept
    flat = spark.createDataFrame(
        [(0, 5.0, 1.0), (1, 5.0, 2.0)], ["arm", "x", "y"]
    )
    r2 = cuped_adjusted_lift(flat, "arm", "x", "y").collect()[0]
    assert r2.theta_micro is None and r2.lift_micro == 1_000_000


def test_psi_report_detects_planted_shift(spark):
    from top_produce_etl_spark.operators.anomaly import psi_report

    ref = [(float(i % 100), 0) for i in range(1000)]
    same = [(float(i % 100), 1) for i in range(1000)]
    shifted = [(float(i % 100) + 50.0, 1) for i in range(1000)]
    mk = lambda cur: spark.createDataFrame(ref + cur, ["v", "cur"])  # noqa: E731
    psi = lambda df: sum(  # noqa: E731
        r.psi_contrib_micro or 0
        for r in psi_report(df, "v", "cur", 10).collect()
    )
    assert psi(mk(same)) == 0          # identical distribution
    assert psi(mk(shifted)) > 500_000  # gross shift → PSI >> 0.25
    out = psi_report(mk(same), "v", "cur", 10).collect()
    assert len(out) == 10 and all(r.n_ref == 100 for r in out)
    with pytest.raises(ValueError):
        psi_report(mk(same), "v", "cur", 1)


def test_trimmed_mean_excludes_tails(spark):
    from top_produce_etl_spark.operators.stats import trimmed_mean

    # one group: 1..8 plus a gross outlier 1000; 10-90% trim drops it
    rows = [("g", float(i)) for i in range(1, 9)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, ["g", "v"])
    r = trimmed_mean(df, ["g"], "v", 0.1, 0.9).collect()[0]
    assert r.n == 9 and r.n_used < 9
    assert r.trimmed_mean_micro < 10_000_000  # outlier excluded
    with pytest.raises(ValueError):
        trimmed_mean(df, ["g"], "v", 0.9, 0.1)


def test_count_triangles_known_graph(spark):
    from top_produce_etl_spark.operators.graph import count_triangles

    # K4 minus one edge: edges (canonical a<b) of {1,2,3,4} without
    # (3,4) → triangles (1,2,3) and (1,2,4) only
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], ["a", "b"]
    )
    r = count_triangles(edges, "a", "b").collect()[0]
    assert r.n_edges == 5
    assert r.n_triangles == 2
    # wedges through ordered two-paths: (1,2,3),(1,2,4),(1,3,?),(2,3,?)...
    assert r.n_wedges >= r.n_triangles


def test_audience_overlap_known_sets(spark):
    from top_produce_etl_spark.operators.sequences import audience_overlap

    # A = {1,2,3}, B = {2,3,4}, C = {9} (disjoint → no row for pairs
    # with zero intersection)
    rows = [("A", 1), ("A", 2), ("A", 3), ("A", 3),
            ("B", 2), ("B", 3), ("B", 4), ("C", 9)]
    df = spark.createDataFrame(rows, ["g", "u"])
    out = {(r.group_a, r.group_b): r for r in audience_overlap(df, "g", "u").collect()}
    ab = out[("A", "B")]
    assert (ab.n_a, ab.n_b, ab.n_both) == (3, 3, 2)
    assert ab.jaccard_micro == 500_000  # 2/4
    assert ("A", "C") not in out and ("B", "C") not in out


def test_benford_uniform_data_flags_high_chi2(spark):
    from top_produce_etl_spark.operators.anomaly import benford_report

    # fabricated-looking uniform amounts 100..999: every digit share
    # ≈ 1/9, far from Benford → digit-1 contribution must be large;
    # values < 1 are excluded from the screen
    df = spark.createDataFrame(
        [(float(v),) for v in range(100, 1000)] + [(0.5,)], ["v"]
    )
    out = {r.digit: r for r in benford_report(df, "v").collect()}
    assert sum(r.n for r in out.values()) == 900  # 0.5 excluded
    assert set(out) == {str(d) for d in range(1, 10)}
    assert out["1"].obs_micro == round(100 / 900 * 1e6)
    assert out["1"].chi2_contrib_micro > 10_000_000  # gross misfit


def test_gini_known_distributions(spark):
    from top_produce_etl_spark.operators.stats import gini_by_group

    rows = (
        # perfectly equal group → G = 0
        [("eq", i, 10.0) for i in range(1, 5)]
        # fully concentrated: one account holds everything
        + [("cc", 1, 0.0), ("cc", 2, 0.0), ("cc", 3, 0.0), ("cc", 4, 100.0)]
    )
    df = spark.createDataFrame(rows, ["g", "k", "v"])
    out = {r.g: r.gini_micro for r in gini_by_group(df, ["g"], "v", "k").collect()}
    assert out["eq"] == 0
    assert out["cc"] == 750_000  # (n-1)/n = 3/4 for full concentration
    with pytest.raises(ValueError):
        gini_by_group(df, [], "v", "k")


def test_sequence_gaps_reports_ranges_once(spark):
    from top_produce_etl_spark.operators.sequences import sequence_gaps

    # key a: 1,2,5,6,10 → gaps [3,4] and [7,9]; key b: contiguous
    rows = [("a", 1), ("a", 2), ("a", 5), ("a", 6), ("a", 10),
            ("a", 5),  # duplicate must not create a zero-gap
            ("b", 7), ("b", 8)]
    df = spark.createDataFrame(rows, ["k", "seq"])
    out = sorted(
        (r.k, r.gap_start, r.gap_end, r.gap_len)
        for r in sequence_gaps(df, ["k"], "seq").collect()
    )
    assert out == [("a", 3, 4, 2), ("a", 7, 9, 3)]
    with pytest.raises(ValueError):
        sequence_gaps(df, [], "seq")


def test_ks_two_sample_known_distributions(spark):
    from top_produce_etl_spark.operators.anomaly import ks_two_sample

    # identical slices → D = 0; disjoint ranges → D = 1
    same = [("g", float(i % 10), c) for i in range(50) for c in (0, 1)]
    df = spark.createDataFrame(same, ["g", "v", "cur"])
    r = ks_two_sample(df, ["g"], "v", "cur").collect()[0]
    assert r.ks_micro == 0 and r.n_ref == 50 and r.n_cur == 50
    disjoint = [("g", float(i), 0) for i in range(10)] + [
        ("g", float(i + 100), 1) for i in range(10)
    ]
    df2 = spark.createDataFrame(disjoint, ["g", "v", "cur"])
    assert ks_two_sample(df2, ["g"], "v", "cur").collect()[0].ks_micro == 1_000_000
    with pytest.raises(ValueError):
        ks_two_sample(df, [], "v", "cur")


def test_entropy_by_group_known_values(spark):
    import math

    from top_produce_etl_spark.operators.stats import entropy_by_group

    rows = (
        [("u", c) for c in ("a", "b", "c", "d")]       # uniform over 4
        + [("s", "x")] * 5                              # single category
        + [("m", "a"), ("m", "a"), ("m", "a"), ("m", "b")]  # skewed
    )
    df = spark.createDataFrame(rows, ["g", "c"])
    out = {r.g: r for r in entropy_by_group(df, ["g"], "c").collect()}
    assert out["u"].entropy_micro == 4 * round(0.25 * math.log(4) * 1e6)
    # per-category micro-rounding happens BEFORE the sum (the
    # determinism contract), so evenness can sit a micro above 1
    assert abs(out["u"].evenness_micro - 1_000_000) <= 2
    assert out["s"].entropy_micro == 0 and out["s"].evenness_micro == 0
    assert 0 < out["m"].evenness_micro < 1_000_000
    with pytest.raises(ValueError):
        entropy_by_group(df, [], "c")


def test_audience_overlap_hll_matches_exact_within_bound(spark, sf_dir):
    from top_produce_etl_spark.io.sources import load_table
    from top_produce_etl_spark.operators.sequences import (
        audience_overlap,
        audience_overlap_hll,
    )

    ev = load_table(spark, sf_dir, "events")
    exact = {
        (r.group_a, r.group_b): (r.n_a, r.n_b, r.n_both)
        for r in audience_overlap(ev, "event_type", "user_id").collect()
    }
    approx = {
        (r.group_a, r.group_b): (r.est_a, r.est_b, r.est_both)
        for r in audience_overlap_hll(ev, "event_type", "user_id").collect()
    }
    assert set(approx) == set(exact)
    for k, (na, nb, nboth) in exact.items():
        ea, eb, eboth = approx[k]
        # lgk=12 → ~1.6% standard error; allow 5% (3σ-ish) per figure
        assert abs(ea - na) <= max(3, 0.05 * na)
        assert abs(eb - nb) <= max(3, 0.05 * nb)
        assert abs(eboth - nboth) <= max(3, 0.05 * max(nboth, 1))
