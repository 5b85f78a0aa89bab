"""k-core peel and multi-source bounded BFS
(operators/graph.py wave 4): known-graph results, convergence
guard, hop bounding, multi-source min semantics."""

from __future__ import annotations

import pytest

from top_produce_etl_spark.operators.graph import bfs_distances, k_core


def _edges(spark, rows):
    return spark.createDataFrame(rows, "a int, b int")


def test_kcore_known_graph(spark):
    # triangle {1,2,3} + pendant 4-1 + disconnected chain 5-6:
    # the 2-core is exactly the triangle, every member at degree 2
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (4, 1), (5, 6)])
    got = {r.node: r.degree for r in k_core(e, "a", "b", k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_multi_edges_and_self_loops_ignored(spark):
    # duplicate + reversed + self-loop edges must not inflate degree
    e = _edges(
        spark,
        [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (1, 1), (4, 1)],
    )
    got = {r.node for r in k_core(e, "a", "b", k=2).collect()}
    assert got == {1, 2, 3}


def test_kcore_iterative_unravel(spark):
    # chain 1-2-3-4-5: k=2 peels endpoints round by round until
    # nothing is left — the cascade case a one-shot degree filter
    # gets wrong (2,3,4 all start at degree 2)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert k_core(e, "a", "b", k=2).count() == 0


def test_kcore_convergence_guard(spark):
    # a 12-node chain needs ~6 peel rounds at k=2; max_rounds=2
    # must raise rather than return a partially peeled "core"
    e = _edges(spark, [(i, i + 1) for i in range(1, 12)])
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(e, "a", "b", k=2, max_rounds=2)


def test_kcore_validation(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError, match="k must be"):
        k_core(e, "a", "b", k=0)


def _sources(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node int")


def test_bfs_single_source(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 5)])
    got = {
        r.node: r.hops
        for r in bfs_distances(
            e, "a", "b", _sources(spark, [1]), max_hops=2
        ).collect()
    }
    assert got == {1: 0, 2: 1, 5: 1, 3: 2}  # 4 is 3 hops out — absent


def test_bfs_directed(spark):
    # edges are directed: 2 reaches 3 but nothing reaches 1
    e = _edges(spark, [(1, 2), (2, 3)])
    got = {
        r.node: r.hops
        for r in bfs_distances(
            e, "a", "b", _sources(spark, [3]), max_hops=3
        ).collect()
    }
    assert got == {3: 0}


def test_bfs_multi_source_min(spark):
    # 4 is 3 hops from 1 but 1 hop from 9 — min wins
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (9, 4)])
    got = {
        r.node: r.hops
        for r in bfs_distances(
            e, "a", "b", _sources(spark, [1, 9]), max_hops=3
        ).collect()
    }
    assert got == {1: 0, 9: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_zero_hops(spark):
    e = _edges(spark, [(1, 2)])
    got = bfs_distances(e, "a", "b", _sources(spark, [1]), max_hops=0)
    assert [(r.node, r.hops) for r in got.collect()] == [(1, 0)]


def test_local_clustering_known_graph(spark):
    from top_produce_etl_spark.operators.graph import local_clustering

    # triangle {1,2,3} + pendant 4-1 (duplicate/reversed edges must
    # not change anything): lcc(1) = 2·1/(3·2), lcc(2) = lcc(3) = 1,
    # lcc(4) undefined (degree 1)
    e = _edges(
        spark, [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1), (1, 4)]
    )
    got = {
        r.node: (r.degree, r.n_triangles, r.lcc_micro)
        for r in local_clustering(e, "a", "b").collect()
    }
    assert got == {
        1: (3, 1, 333333),
        2: (2, 1, 1000000),
        3: (2, 1, 1000000),
        4: (1, 0, None),
    }
