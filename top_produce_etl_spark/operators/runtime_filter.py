"""Runtime bloom-filter join pruning (SURVEY.md §2.3 scale path).

At 100 TB the dominant cost of a selective fact⨝dim join is
shuffling fact rows that the join will discard. Catalyst's runtime
filter rule (``spark.sql.optimizer.runtime.bloomFilter.enabled``,
default on) fixes this WITHOUT any manual plumbing: when one join
side carries a selective filter, Spark builds a bloom filter over
that side's join keys at runtime and injects a
``might_contain(xxhash64(key))`` predicate into the OTHER side's
scan, so discarded rows die before the exchange instead of after
it. False positives only cost a little extra shuffle — the join
itself still verifies every match, so results are exact.

This module makes the behavior first-class instead of incidental:

- :func:`runtime_filter_tuning` pins the confs that govern
  injection (the defaults are cluster-scaled: the application side
  must scan ≥10 GB before Spark bothers — far above any local test
  input, so plan tests tune it down to observe the rewrite).
- :func:`pruned_semi_join` is the canonical consumer shape: an
  exact existence filter whose big side is scan-pruned by the
  injected bloom filter once the plan is eligible.

Eligibility (Spark's ``InjectRuntimeFilter`` rule): the join must
be shuffle-based (a broadcast join already prunes via its hash
relation), the creation side must be under
``runtime.bloomFilter.creationSideThreshold`` (default 10 MB) and
carry a selective predicate, and the application side scan must
exceed ``runtime.bloomFilter.applicationSideScanSizeThreshold``
(default 10 GB).

Reference parity note: the reference engine (98-LoC scaffold) has
no runtime filtering; this row is part of the beyond-reference
scale surface, same tier as AQE skew handling.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_TUNABLE = (
    "spark.sql.optimizer.runtime.bloomFilter.enabled",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
    "spark.sql.autoBroadcastJoinThreshold",
)


@contextmanager
def runtime_filter_tuning(
    spark: SparkSession,
    app_side_scan_threshold: str = "10GB",
    creation_side_threshold: str = "10MB",
    force_shuffle_join: bool = False,
) -> Iterator[None]:
    """Temporarily pin the runtime-filter confs, restoring on exit.

    ``force_shuffle_join=True`` additionally disables the broadcast
    threshold so a small-dim join plans as a shuffle join — only
    sensible in plan tests, where the point is observing the
    injected ``might_contain`` on an input that would otherwise
    broadcast. Production code should NOT force this: when the dim
    fits in memory a broadcast join dominates (it prunes the fact
    side at the probe, no bloom needed).

    Conf changes affect PLANNING time, which for a lazy DataFrame is
    the action/explain call — run those inside the context.
    """
    old = {k: spark.conf.get(k, None) for k in _TUNABLE}
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            app_side_scan_threshold,
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            creation_side_threshold,
        )
        if force_shuffle_join:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def pruned_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    keys_key: str,
) -> DataFrame:
    """Exact existence filter of ``fact`` by ``keys`` whose fact-side
    scan is bloom-pruned when the plan is eligible (see module doc).

    Semantically identical to a plain left-semi join at ANY conf
    setting — the bloom filter is a plan-level optimization, so this
    function carries no correctness risk and needs no fallback
    logic. It exists to name the pattern and anchor the plan test.
    """
    return fact.join(
        keys, on=fact[fact_key] == keys[keys_key], how="left_semi"
    )
