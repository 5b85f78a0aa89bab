"""Pareto skyline (operators/pareto.py): dominance semantics on a
known frontier, tie handling, idempotence, partition invariance,
validation, and the phase-1/phase-2 plan contract."""

from __future__ import annotations

import pytest

from top_produce_etl_spark.operators.pareto import skyline

# (id, cost ↓, quality ↑, weight ↓) — frontier computed by hand.
ROWS = [
    (1, 10.0, 5.0, 2.0),   # frontier
    (2, 10.0, 5.0, 2.0),   # duplicate of 1 — equal rows both survive
    (3, 12.0, 5.0, 2.0),   # dominated by 1 (worse cost, else equal)
    (4, 8.0, 3.0, 2.0),    # frontier (cheapest at q=3, w=2)
    (5, 8.0, 3.0, 1.0),    # frontier (dominates nothing vs 4? no:
                           # same cost/quality, lighter → dominates 4)
    (6, 20.0, 9.0, 5.0),   # frontier (best quality)
    (7, 21.0, 9.0, 5.0),   # dominated by 6
    (8, 15.0, 4.0, 1.5),   # dominated by 5 (8 vs 15 cost, 3<4 q...)
]
# Careful frontier derivation:
#  5 dominates 4 (<= all, < weight)  → 4 out
#  1 vs 5: 1 has q=5 > 3 but cost 10 > 8, w 2 > 1 → incomparable
#  8 vs 5: cost 15>8, q 4>3, w 1.5>1 → incomparable (q better) — wait
#    minimize cost, maximize quality, minimize weight:
#    5=(8,3,1), 8=(15,4,1.5): 5 better cost+weight, 8 better quality
#    → incomparable → 8 on frontier? vs 1=(10,5,2): 1 worse cost &
#    weight but better quality → incomparable. vs 6: worse everything
#    except... 6=(20,9,5): 8 better cost/weight, 6 better quality →
#    incomparable. So 8 IS on the frontier.
EXPECT = {1, 2, 5, 6, 8}


def _df(spark):
    return spark.createDataFrame(
        ROWS, "id int, cost double, quality double, weight double"
    )


def test_known_frontier(spark):
    got = {
        r.id
        for r in skyline(
            _df(spark),
            minimize=["cost", "weight"],
            maximize=["quality"],
        ).collect()
    }
    assert got == EXPECT


def test_equal_rows_both_survive(spark):
    got = [
        r.id
        for r in skyline(
            _df(spark), minimize=["cost", "weight"], maximize=["quality"]
        ).collect()
        if r.id in (1, 2)
    ]
    assert sorted(got) == [1, 2]


def test_idempotent(spark):
    once = skyline(
        _df(spark), minimize=["cost", "weight"], maximize=["quality"]
    )
    twice = skyline(
        once, minimize=["cost", "weight"], maximize=["quality"]
    )
    assert {r.id for r in twice.collect()} == EXPECT


def test_partition_invariance(spark):
    base = _df(spark)
    for n in (1, 3, 8):
        got = {
            r.id
            for r in skyline(
                base.repartition(n),
                minimize=["cost", "weight"],
                maximize=["quality"],
            ).collect()
        }
        assert got == EXPECT, f"partitioning {n} changed the skyline"


def test_single_objective_is_min(spark):
    got = skyline(_df(spark), minimize=["cost"]).collect()
    assert {r.id for r in got} == {4, 5}  # both at min cost 8.0


def test_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="at least one"):
        skyline(df)
    with pytest.raises(ValueError, match="overlap"):
        skyline(df, minimize=["cost"], maximize=["cost"])
    with pytest.raises(ValueError, match="not in df"):
        skyline(df, minimize=["nope"])


def test_plan_shape(spark):
    """Phase 1 is an Arrow-batched mapInPandas (no row Python UDF);
    the phase-2 dominance anti-join is broadcast (its nested-loop
    shape is over the pruned candidate union only — the documented
    registry-audit exemption)."""
    from top_produce_etl_spark.plans.audit import plan_audit

    audit = plan_audit(
        skyline(_df(spark), minimize=["cost"], maximize=["quality"])
    )
    assert not audit["python_row_udf"]
    assert audit["arrow_udf"]
