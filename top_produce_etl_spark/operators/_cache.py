"""Shared persisted-DataFrame registry for multi-consumer plans.

Iterative operators (dedup signature tables, PageRank/LPA edge
relations, MMR candidate pools) reference the same base relation
from every round's plan; without an explicit persist, Spark's lazy
lineage re-executes that base PER ROUND and per downstream branch —
an O(rounds) recompute that bench exposed directly (MMR 13 s → ~2 s
once its pool stopped being rebuilt five times).

The registry keeps the house contract from operators/dedup.py (its
original home): operators persist what they'll re-read, callers
release everything with ONE :func:`unpersist_all` after
materializing the result — caches exist only to share work across
the consumers of one plan, never across queries. MEMORY_AND_DISK:
these relations are model/pool/edge-aggregate sized; if one ever
outgrows memory it spills instead of evicting mid-job.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` (memory-and-disk) and track it for release."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
    return df


def unpersist_all() -> int:
    """Release every tracked persist since the last call; returns
    the number released. Call after materializing the output."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n
