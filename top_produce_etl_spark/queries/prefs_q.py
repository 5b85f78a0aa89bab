"""Preference-rating queries (round 10 — operators/preferences.py):
Bradley-Terry MM ratings over a deterministic pair fixture with
planted strengths, hash-checked against the unrolled DuckDB oracle
bit for bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.preferences import (
    bt_ratings,
    bt_ratings_oracle_sql,
)
from top_produce_etl_spark.queries import query

N_ITEMS = 13
ITERS = 3

# Pair fixture from orders: contestants a = k % 13 and
# b = (a + 1 + (k // 13) % 12) % 13 (offset 1..12, never a draw
# against self); planted strength IS the item id — the stronger
# item wins except on every 4th ROUND (k // 156 % 4 = 0, one round
# = all 156 (a, offset) classes), a 25% upset rate that is EXACTLY
# uniform per pair class: keying the upset on k % 4 instead would
# correlate it with the pair identity (k mod 156 pins k mod 4 up to
# gcd 4), skewing per-pair win rates — so ratings recover the
# planted strength order without any win probability saturating.
_PAIRS_SQL = f"""
    SELECT CASE WHEN (o_orderkey // 156) % 4 = 0
                THEN LEAST(o_orderkey % {N_ITEMS},
                           (o_orderkey % {N_ITEMS} + 1
                            + (o_orderkey // {N_ITEMS}) % 12)
                           % {N_ITEMS})
                ELSE GREATEST(o_orderkey % {N_ITEMS},
                              (o_orderkey % {N_ITEMS} + 1
                               + (o_orderkey // {N_ITEMS}) % 12)
                              % {N_ITEMS}) END AS winner,
           CASE WHEN (o_orderkey // 156) % 4 = 0
                THEN GREATEST(o_orderkey % {N_ITEMS},
                              (o_orderkey % {N_ITEMS} + 1
                               + (o_orderkey // {N_ITEMS}) % 12)
                              % {N_ITEMS})
                ELSE LEAST(o_orderkey % {N_ITEMS},
                           (o_orderkey % {N_ITEMS} + 1
                            + (o_orderkey // {N_ITEMS}) % 12)
                           % {N_ITEMS}) END AS loser
    FROM orders
"""


def synthesize_preference_pairs(
    orders: DataFrame, with_pair_id: bool = False
) -> DataFrame:
    """Spark twin of the fixture (pure expressions).
    ``with_pair_id`` carries ``o_orderkey`` through as a unique
    deterministic ``pair_id`` (the per-pair cap key the r11
    curation pipeline needs)."""
    k = F.col("o_orderkey")
    a = k % N_ITEMS
    b = (a + 1 + F.expr(f"o_orderkey div {N_ITEMS}") % 12) % N_ITEMS
    upset = F.expr("o_orderkey div 156") % 4 == 0
    cols = [
        F.when(upset, F.least(a, b))
        .otherwise(F.greatest(a, b))
        .alias("winner"),
        F.when(upset, F.greatest(a, b))
        .otherwise(F.least(a, b))
        .alias("loser"),
    ]
    if with_pair_id:
        cols.insert(0, k.alias("pair_id"))
    return orders.select(*cols)


@query(
    "bt_preference_ratings",
    extended=True,
    oracle=bt_ratings_oracle_sql(_PAIRS_SQL, iters=ITERS),
)
def bt_preference_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry ratings by 3 MM updates over pairwise
    preference outcomes (round 10 — the RLHF-data curation family:
    rank response variants / annotators from preference pairs,
    order-independent where Elo cannot be). Integer pico-unit
    fixed point end to end, so the (item, games, wins, r_micro)
    relation hash-matches the unrolled DuckDB oracle bit for bit;
    per update the game-count relation joins the DISTRIBUTED
    ratings on each side and one |items|-wide aggregate folds the
    denominators — the pagerank loop discipline, nothing
    corpus-sized on the driver."""
    orders = load_table(spark, sf_dir, "orders")
    return bt_ratings(
        synthesize_preference_pairs(orders), iters=ITERS
    )
