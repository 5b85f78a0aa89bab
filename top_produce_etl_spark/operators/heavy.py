"""Frequent-items (heavy hitters) with sketch-bounded shuffles and
EXACT output.

The naive way to find items with count ≥ φ·N in a token stream is
``explode → groupBy → count`` — at 100 TB that shuffles one row per
TOKEN OCCURRENCE keyed by a vocabulary that can be billions of
distinct n-grams. This operator keeps the result exact while
bounding the shuffle with a two-stage design (same
sketch-then-verify pattern as MinHash→exact-Jaccard in
operators/dedup.py):

1. **Misra-Gries summaries per partition** (``mapInPandas``, Arrow
   batches — Python is the honest slow path here, there is no
   native MG in Spark; the pass is a single scan emitting at most
   ``capacity`` (item, weight) rows + one total-count row per
   partition). MG guarantees each partition undercounts any item by
   at most n_p/(capacity+1); summing summaries across partitions
   undercounts by at most N/(capacity+1) — and never overcounts.
2. **Candidate selection + exact verification**: items whose summed
   lower bound + N/(capacity+1) ≥ the threshold are a SUPERSET of
   the true frequent items (no false negatives, by the MG bound).
   The token stream is then re-scanned, filtered by a BROADCAST of
   the candidate set BEFORE the exchange, and counted exactly — the
   groupBy shuffle carries only candidate-token occurrences.

Output = exactly the items with count ≥ threshold, with exact
counts: oracle-checkable against plain ``GROUP BY … HAVING``.

Choose ``capacity`` ≥ 1/φ so the candidate-selection slack N/(cap+1)
stays below the threshold φ·N — otherwise the candidate set degrades
toward "everything" (still correct, no longer cheap). On a
near-uniform stream (like the synthetic fixture) few items clear
φ·N; the candidate bound's value shows on skewed streams — see
tests/test_heavy.py's zipf case.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUMMARY_SCHEMA = "item string, weight long"
# sentinel item carrying each partition's total stream length; "\x00"
# cannot collide with real tokens (fixture text is ASCII words).
_TOTAL_KEY = "\x00__total__"


def _mg_partial(capacity: int):
    """Build the per-partition Misra-Gries pass for mapInPandas."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[Any, int] = {}
        total = 0
        for pdf in batches:
            for item in pdf["item"]:
                total += 1
                if item in counters:
                    counters[item] += 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    # decrement-all step: amortized O(1) via dict
                    # rebuild; each such step discounts ≤1 per item
                    # and happens ≤ n_p/(capacity+1) times.
                    counters = {
                        i: c - 1 for i, c in counters.items() if c > 1
                    }
        counters[_TOTAL_KEY] = total
        yield pd.DataFrame(
            {"item": list(counters), "weight": list(counters.values())}
        )

    return summarize


def frequent_items_exact(
    items: DataFrame,
    item_col: str,
    phi: float,
    capacity: int = 1024,
) -> DataFrame:
    """Exact items with count ≥ ``phi`` · N over ``items[item_col]``.

    Returns (item, cnt) with exact counts. See module docstring for
    the two-stage scale design. ``items`` is scanned twice (summary
    pass + verify pass) — at scale, persist the input or fuse this
    after a cheap narrow source.
    """
    if not 0 < phi <= 1:
        raise ValueError(f"phi must be in (0, 1], got {phi}")
    stream = items.select(F.col(item_col).cast("string").alias("item"))
    summaries = stream.mapInPandas(_mg_partial(capacity), _SUMMARY_SCHEMA)
    merged = summaries.groupBy("item").agg(
        F.sum("weight").alias("lower_bound")
    )
    # always-0 NON-FOLDABLE key: makes the one-row totals attach as
    # a BroadcastHashJoin instead of a nested-loop cross (house
    # pattern, see operators/retrieval.py BM25 stats note)
    k0 = lambda c: F.pmod(F.col(c), F.lit(1)).cast("int")  # noqa: E731
    # one-row frame: N and the absolute threshold/slack derived from it
    totals = (
        merged.filter(F.col("item") == _TOTAL_KEY)
        .select(
            F.col("lower_bound").alias("n_total"),
            F.ceil(F.col("lower_bound") * F.lit(float(phi))).alias(
                "threshold"
            ),
            (F.col("lower_bound") / F.lit(capacity + 1)).alias("slack"),
        )
        .withColumn("__k", k0("n_total"))
    )
    candidates = (
        merged.filter(F.col("item") != _TOTAL_KEY)
        .withColumn("__k", k0("lower_bound"))
        .join(F.broadcast(totals), "__k")
        .filter(
            F.col("lower_bound") + F.col("slack") >= F.col("threshold")
        )
        .select("item", "threshold")
    )
    # exact verify: broadcast-semi-filter BEFORE the count shuffle
    verified = (
        stream.join(F.broadcast(candidates.select("item")), "item", "left_semi")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("__k", k0("cnt"))
        .join(F.broadcast(totals.select("__k", "threshold")), "__k")
        .filter(F.col("cnt") >= F.col("threshold"))
        .select("item", "cnt")
    )
    return verified
