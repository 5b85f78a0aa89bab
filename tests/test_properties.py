"""Property-based tests (hypothesis) — SURVEY.md §5.4.

Top-N invariants that must hold for ANY input, not just fixtures:
output ⊆ input, ≤N rows per group, metric monotone within group,
window and agg strategies agree exactly, and the result is stable
under input permutation (deterministic tiebreak). Small generated
frames, many shapes — complements the fixture-based oracle checks.
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from top_produce_etl_spark.operators.topn import top_n_agg, top_n_window

# (group, product, sales) rows; small domains force collisions/ties.
ROWS = st.lists(
    st.tuples(
        st.sampled_from(["east", "west", "north"]),
        st.integers(min_value=0, max_value=9),
        st.sampled_from([0.0, 1.0, 1.5, 2.0, 2.0, 7.25, -3.0]),
    ),
    min_size=0,
    max_size=25,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [(g, str(p), s) for g, p, s in rows],
        "region string, product string, sales double",
    )


def _key(r):
    return (r["region"], r["product"], r["sales"], r["rank"])


@given(rows=ROWS, n=st.integers(min_value=1, max_value=4))
@SETTINGS
def test_topn_invariants(spark, rows, n):
    df = _df(spark, rows)
    out = top_n_window(df, "region", "sales", n, tiebreak="product").collect()

    in_set = {(g, str(p), s) for g, p, s in rows}
    per_group: dict[str, list] = {}
    for r in out:
        assert (r["region"], r["product"], r["sales"]) in in_set
        per_group.setdefault(r["region"], []).append(r)
    for g, rs in per_group.items():
        assert len(rs) <= n
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        sales = [r["sales"] for r in rs]
        assert sales == sorted(sales, reverse=True)
        # every kept row beats-or-ties the n-th best of its group
        # (multiset of raw input rows, duplicates counted)
        group_sales = sorted((s for gg, _, s in rows if gg == g), reverse=True)
        if len(rs) == n:
            assert min(sales) >= group_sales[n - 1]


@given(rows=ROWS, n=st.integers(min_value=1, max_value=4))
@SETTINGS
def test_window_and_agg_strategies_agree(spark, rows, n):
    df = _df(spark, rows)
    w = top_n_window(df, "region", "sales", n, tiebreak="product").select(
        "region", "product", "sales", "rank"
    )
    a = top_n_agg(df, "region", "sales", n, tiebreak="product").select(
        "region", "product", "sales", "rank"
    )
    assert sorted(map(_key, w.collect())) == sorted(map(_key, a.collect()))


@given(rows=ROWS)
@SETTINGS
def test_stable_under_permutation(spark, rows):
    shuffled = rows[:]
    random.Random(7).shuffle(shuffled)
    a = top_n_window(_df(spark, rows), "region", "sales", 3, tiebreak="product")
    b = top_n_window(_df(spark, shuffled), "region", "sales", 3, tiebreak="product")
    assert sorted(map(_key, a.collect())) == sorted(map(_key, b.collect()))


@pytest.mark.parametrize("method,tiebreak,expect", [
    # sales: A=5, B=5, C=1. With a tiebreak row_number totally
    # orders the tie; without one, rank shares position 1 and
    # dense_rank additionally admits the next distinct value.
    ("row_number", "product", {("A", 1), ("B", 2)}),
    ("rank", None, {("A", 1), ("B", 1)}),
    ("dense_rank", None, {("A", 1), ("B", 1), ("C", 2)}),
])
def test_tie_semantics_by_method(spark, method, tiebreak, expect):
    df = spark.createDataFrame(
        [("east", "A", 5.0), ("east", "B", 5.0), ("east", "C", 1.0)],
        "region string, product string, sales double",
    )
    out = top_n_window(df, "region", "sales", 2, tiebreak=tiebreak, method=method)
    assert {(r["product"], r["rank"]) for r in out.collect()} == expect


def test_connected_components_properties(spark):
    """Invariants for any pair list: every node gets exactly one
    label; rep_id <= id (min-representative); rep_id is itself a
    node; and both endpoints of every pair share a label."""
    import random

    rng = random.Random(7)
    nodes = list(range(40))
    pairs = [
        (a, b)
        for a, b in (
            sorted(rng.sample(nodes, 2)) for _ in range(30)
        )
    ]
    from top_produce_etl_spark.operators.dedup import connected_components

    pdf = spark.createDataFrame(pairs, "a_id bigint, b_id bigint")
    out = {r["id"]: r["rep_id"] for r in connected_components(pdf).collect()}
    touched = {a for a, _ in pairs} | {b for _, b in pairs}
    assert set(out) == touched
    assert all(rep <= i for i, rep in out.items())
    assert all(rep in out for rep in out.values())
    assert all(out[a] == out[b] for a, b in pairs)


# ----------------------------------------------------- mixture sizing


WCOUNTS = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d"]),
    st.integers(min_value=1, max_value=60),
    min_size=2,
    max_size=4,
)
WEIGHTS = st.dictionaries(
    st.sampled_from(["a", "b", "c", "d"]),
    st.integers(min_value=1, max_value=9),
    min_size=2,
    max_size=4,
)


@given(counts=WCOUNTS, weights=WEIGHTS)
@SETTINGS
def test_mixture_sizing_invariants(spark, counts, weights):
    """For ANY counts/weights: keep_c <= n_c (never upsample), the
    kept set is a subset, exact strategy hits the integer sizing
    rule exactly, and achieved proportions are within integer-floor
    slack of the recipe."""
    weights = {k: v for k, v in weights.items() if k in counts}
    if len(weights) < 2:
        return
    from top_produce_etl_spark.operators.mixture import rebalance_mixture

    rows = [
        (f"{cat}-{i}", cat) for cat, n in counts.items() for i in range(n)
    ]
    df = spark.createDataFrame(rows, "k string, cat string")
    out = rebalance_mixture(df, "cat", "k", weights, strategy="exact")
    got = {r.cat: r.n for r in out.groupBy("cat").count()
           .withColumnRenamed("count", "n").collect()}
    W = sum(weights.values())
    S = min(counts[c] * W // weights[c] for c in weights)
    want = {c: weights[c] * S // W for c in weights}
    assert {c: got.get(c, 0) for c in weights} == want
    assert all(got.get(c, 0) <= counts[c] for c in weights)


# ------------------------------------------------------------ gapfill


@given(
    points=st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.integers(min_value=1, max_value=12),
            st.floats(min_value=-5, max_value=5, allow_nan=False),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),
    )
)
@SETTINGS
def test_gapfill_properties(spark, points):
    """For ANY sparse series: the grid is dense (every day between a
    key's min and max present exactly once), observed rows survive
    unchanged and un-flagged, locf never yields NULL after the first
    observation, and gap count = grid - observed."""
    import datetime as dt

    from top_produce_etl_spark.operators.eventtime import gapfill

    df = spark.createDataFrame(
        [(k, dt.datetime(2025, 3, d), v) for k, d, v in points],
        "k string, ts timestamp, v double",
    )
    out = gapfill(df, "k", "ts", "v", "1 day", "locf").collect()
    obs = {(k, d): v for k, d, v in points}
    spans = {}
    for k, d, _ in points:
        lo, hi = spans.get(k, (d, d))
        spans[k] = (min(lo, d), max(hi, d))
    grid = {(k, d) for k, (lo, hi) in spans.items()
            for d in range(lo, hi + 1)}
    got_keys = [(r.k, r.ts.day) for r in out]
    assert sorted(got_keys) == sorted(grid)  # dense, exactly once
    for r in out:
        key = (r.k, r.ts.day)
        if key in obs:
            assert not r.is_gap and r.v == obs[key]
        else:
            assert r.is_gap and r.v is not None  # locf filled


# ------------------------------------------------- skyline (r5w4)

SKY_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.sampled_from([0.0, 1.0, 2.0, 2.0, 3.5, 7.0]),
        st.sampled_from([0.0, 1.0, 1.0, 2.0, 4.25]),
    ),
    min_size=0,
    max_size=20,
)


def _dominates(u, v):
    """minimize cost (index 1), maximize gain (index 2)."""
    le = u[1] <= v[1] and u[2] >= v[2]
    lt = u[1] < v[1] or u[2] > v[2]
    return le and lt


@given(rows=SKY_ROWS)
@SETTINGS
def test_skyline_matches_naive_reference(spark, rows):
    """Distributed two-phase skyline == the O(n²) python reference
    on ANY input (ties, duplicates, empty)."""
    from top_produce_etl_spark.operators.pareto import skyline

    df = spark.createDataFrame(
        [(i, c, g) for i, (rid, c, g) in enumerate(rows)],
        "id int, cost double, gain double",
    )
    got = {
        (r.id, r.cost, r.gain)
        for r in skyline(df, minimize=["cost"], maximize=["gain"]).collect()
    }
    pts = [(i, c, g) for i, (rid, c, g) in enumerate(rows)]
    want = {
        p for p in pts if not any(_dominates(q, p) for q in pts if q != p)
    }
    assert got == want


# -------------------------------------------------- k-core (r5w4)

EDGE_LISTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),
        st.integers(min_value=0, max_value=12),
    ),
    min_size=0,
    max_size=30,
)


@given(edges=EDGE_LISTS, k=st.integers(min_value=2, max_value=4))
@SETTINGS
def test_kcore_fixpoint_properties(spark, edges, k):
    """For ANY graph: every k-core member has within-core degree
    >= k, and the result equals the python peel-to-fixpoint."""
    from top_produce_etl_spark.operators.graph import k_core

    df = spark.createDataFrame(
        edges or [(0, 0)], "a int, b int"  # (0,0) self-loop = empty graph
    )
    got = {r.node: r.degree for r in k_core(df, "a", "b", k=k).collect()}
    # python reference
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        drop = [n for n, s in adj.items() if len(s) < k]
        if not drop:
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    want = {n: len(s) for n, s in adj.items()}
    assert got == want
    assert all(d >= k for d in got.values())


# --------------------------------------- random projection (r5w4)

VEC_LISTS = st.lists(
    st.lists(
        st.sampled_from([0.0, 0.5, -1.0, 2.0, -2.5]),
        min_size=6,
        max_size=6,
    ),
    min_size=1,
    max_size=8,
)


@given(vecs=VEC_LISTS)
@SETTINGS
def test_random_projection_is_linear(spark, vecs):
    """proj(a) + proj(b) == proj(a + b) component-wise for ANY
    vectors — the projection is a fixed linear map, so any
    nonlinearity (hash instability, rounding drift beyond the final
    6 dp) breaks this."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators.similarity import random_project

    a = vecs[0]
    b = vecs[-1]
    ab = [x + y for x, y in zip(a, b)]
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, ab)], "id int, v array<double>"
    )
    out = {
        r.id: r.proj
        for r in random_project(df, "v", 4).select("id", "proj").collect()
    }
    for j in range(4):
        assert out[0][j] + out[1][j] == _pytest.approx(
            out[2][j], abs=2e-6
        )


# --- duplicate-span family: detection and strip must PARTITION each
# document (span mass + kept tokens == all tokens), spans must be
# disjoint and in-bounds, and a pure within-document repeat must
# never produce a span at min_docs=2.

# Tiny alphabet + short docs → heavy cross-doc shingle collisions.
SPAN_DOCS = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=8,
)


@given(docs=SPAN_DOCS, k=st.integers(min_value=2, max_value=4))
@SETTINGS
def test_duplicate_spans_partition_document(spark, docs, k):
    from top_produce_etl_spark.operators.dedup import (
        duplicate_spans,
        strip_duplicate_spans,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id int, text string",
    )
    spans = duplicate_spans(df, "doc_id", "text", k=k, min_docs=2)
    stripped = strip_duplicate_spans(df, "doc_id", "text", k=k, min_docs=2)

    by_doc: dict[int, list] = {}
    for r in spans.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    kept = {r["doc_id"]: r for r in stripped.collect()}

    # every input doc survives the strip; token counts agree
    assert set(kept) == set(range(len(docs)))
    for i, toks in enumerate(docs):
        assert kept[i]["n_tokens"] == len(toks)
        doc_spans = sorted(
            by_doc.get(i, []), key=lambda r: r["span_start"]
        )
        dup_mass = sum(r["span_len"] for r in doc_spans)
        # partition: removed + kept == all tokens
        assert dup_mass + kept[i]["kept_tokens"] == len(toks)
        # disjoint, in-bounds, non-adjacent (adjacent would have
        # merged), and never wider than the document
        prev_end = None
        for r in doc_spans:
            assert 0 <= r["span_start"]
            assert r["span_start"] + r["span_len"] <= len(toks)
            assert r["span_len"] >= k
            if prev_end is not None:
                assert r["span_start"] > prev_end  # gap-island merge
            prev_end = r["span_start"] + r["span_len"]
        # the cleaned text is exactly the unspanned tokens, in order
        expect = [
            t
            for p, t in enumerate(toks)
            if not any(
                r["span_start"] <= p < r["span_start"] + r["span_len"]
                for r in doc_spans
            )
        ]
        assert kept[i]["text_clean"] == " ".join(expect)


def test_upsample_append_stable(spark):
    """Adding documents must not change existing keys' copy counts
    (the salted-hash contract shared with splits/rebalance)."""
    from top_produce_etl_spark.operators.mixture import upsample_mixture

    base = [(i, "wiki") for i in range(30)]
    grown = base + [(i, "wiki") for i in range(30, 60)]
    def copies(rows):
        out = upsample_mixture(
            spark.createDataFrame(rows, ["k", "cat"]),
            "cat", "k", {"wiki": 1.5},
        ).collect()
        c: dict[int, int] = {}
        for r in out:
            c[r["k"]] = c.get(r["k"], 0) + 1
        return c
    before, after = copies(base), copies(grown)
    assert all(after[k] == v for k, v in before.items())


@given(rows=SPAN_DOCS, parts=st.integers(min_value=1, max_value=7))
@SETTINGS
def test_duplicate_spans_partitioning_invariant(spark, rows, parts):
    """Span output must not depend on physical partitioning."""
    from top_produce_etl_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(rows)],
        "doc_id int, text string",
    )
    a = sorted(
        map(tuple, duplicate_spans(df, "doc_id", "text", k=3).collect())
    )
    b = sorted(
        map(
            tuple,
            duplicate_spans(
                df.repartition(parts), "doc_id", "text", k=3
            ).collect(),
        )
    )
    assert a == b


# --- sketch algebra properties (r5w6) -------------------------------

KEYS = st.lists(
    st.integers(min_value=0, max_value=40), min_size=0, max_size=30
)


def _kdf(spark, keys):
    return spark.createDataFrame(
        [(int(k),) for k in keys], "k bigint"
    )


@given(keys=KEYS, cut=st.integers(min_value=0, max_value=40))
@SETTINGS
def test_cms_merge_is_split_invariant(spark, keys, cut):
    """Sketching any 2-way split and SUM-merging equals sketching
    the whole — for EVERY split point, not just the day boundary the
    example test uses."""
    from top_produce_etl_spark.operators.countmin import (
        cms_build,
        cms_merge,
    )

    df = _kdf(spark, keys)
    whole = cms_build(df, "k", depth=2, width=16)
    a = cms_build(df.where(f"k < {cut}"), "k", depth=2, width=16)
    b = cms_build(df.where(f"k >= {cut}"), "k", depth=2, width=16)
    merged = cms_merge(a.union(b))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


@given(keys=KEYS)
@SETTINGS
def test_kmv_union_commutes_and_below_k_exact(spark, keys):
    """kmv_union(a, b) == kmv_union(b, a), and with few distinct
    keys the union sketch IS the distinct hash set (k larger than
    the key space ⇒ estimator exact)."""
    from top_produce_etl_spark.operators.kmv import (
        kmv_estimate,
        kmv_sketch,
        kmv_union,
    )

    df = _kdf(spark, keys)
    a = kmv_sketch(df.where("k % 2 = 0"), [], "CAST(k AS STRING)", k=64)
    b = kmv_sketch(df.where("k % 2 = 1"), [], "CAST(k AS STRING)", k=64)
    ab = sorted(r["h"] for r in kmv_union(a, b, k=64).collect())
    ba = sorted(r["h"] for r in kmv_union(b, a, k=64).collect())
    assert ab == ba
    est = kmv_estimate(
        spark.createDataFrame(
            [(h,) for h in ab], "h bigint"
        ) if ab else a.limit(0),
        [],
        k=64,
    ).collect()
    exact = df.select("k").distinct().count()
    if exact:
        assert est[0]["distinct_est"] == exact
