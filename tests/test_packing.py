"""Sequence packing (operators/packing.py): greedy fill rule,
oversized documents, and the mean-fill audit."""

from __future__ import annotations

from top_produce_etl_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)


def _layout(spark, rows, budget, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id long, n long")
    packed = pack_sequences(df, "doc_id", "n", budget, n_shards=n_shards)
    return {r.doc_id: (r.shard, r.bin, r.pos) for r in packed.collect()}, packed


def test_pack_greedy_fill_and_new_bin(spark):
    """10+10 fits a 25-budget bin; the 10 that would overflow opens
    bin 1; pos is the running fill at placement time."""
    got, _ = _layout(
        spark, [(1, 10), (2, 10), (3, 10), (4, 5)], budget=25
    )
    assert got[1] == (0, 0, 0)
    assert got[2] == (0, 0, 10)
    assert got[3] == (0, 1, 0)   # 20 + 10 > 25 -> new bin
    assert got[4] == (0, 1, 10)


def test_pack_oversized_doc_gets_own_bin(spark):
    """A document longer than the budget is emitted alone (pos 0),
    not dropped; the next document starts a fresh bin."""
    got, packed = _layout(spark, [(1, 100), (2, 10)], budget=32)
    assert got[1] == (0, 0, 0)
    assert got[2] == (0, 1, 0)
    stats = packing_stats(packed, budget=32).collect()[0]
    # oversized bin counts as full (truncated downstream): (1 + 10/32)/2
    assert stats.n_bins == 2
    assert abs(stats.mean_fill - round((1.0 + 10 / 32) / 2, 6)) < 1e-9


def test_pack_shards_partition_by_id_mod(spark):
    """Sharding is id mod n_shards — deterministic, no RNG — and
    each shard packs independently from fill 0."""
    got, _ = _layout(
        spark, [(0, 20), (1, 20), (2, 20), (3, 20)], budget=25,
        n_shards=2,
    )
    assert got[0] == (0, 0, 0) and got[2] == (0, 1, 0)
    assert got[1] == (1, 0, 0) and got[3] == (1, 1, 0)
