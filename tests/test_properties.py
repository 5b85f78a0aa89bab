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
