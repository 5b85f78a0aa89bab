"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``):
a deterministic synthetic-document generator.

Why this exists: load-testing the text/dedup/similarity tiers at
ARBITRARY scale without pre-built fixtures. ``spark.read.format(
"synthdocs").option("rows", N).option("partitions", P)`` yields N
documents split evenly across P input partitions — each partition
generates its own id range executor-side, so a 10-billion-doc corpus
costs zero storage and no driver memory, and scan parallelism is P
regardless of N.

Determinism contract: doc text is a pure function of doc_id (seeded
xorshift over a fixed vocabulary), so any two reads — any
partitioning, any engine — produce identical rows; planted
duplicates appear every ``dup_every`` ids (text of id is reused at
id+1), giving the dedup operators known ground truth at any scale.

This is also the §2.1 coverage row for the Python DataSource API
itself: schema declaration, option plumbing, partition planning
(``partitions``), and executor-side iteration.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

VOCAB = (
    "the a data row key value table scan join merge sort hash filter "
    "window batch stream fast slow big small group query line part "
    "order customer agg spark"
).split()


def _doc_text(doc_id: int, n_tokens: int, dup_every: int) -> str:
    # planted duplicate: id k*dup_every+1 repeats k*dup_every's text
    base = doc_id - 1 if dup_every and doc_id % dup_every == 1 else doc_id
    x = (base * 2654435761 + 1) & 0xFFFFFFFF
    out = []
    for _ in range(n_tokens):
        # xorshift32 — cheap, deterministic, seedable per doc
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(VOCAB[x % len(VOCAB)])
    return " ".join(out)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = max(1, int(options.get("partitions", 8)))
        self.n_tokens = int(options.get("tokens", 50))
        self.dup_every = int(options.get("dup_every", 0))

    def partitions(self):
        step = -(-self.rows // self.n_parts)
        return [
            _RangePartition(i, min(i + step, self.rows))
            for i in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield doc_id, _doc_text(doc_id, self.n_tokens, self.dup_every)


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs")`` after
    :func:`register_synth_source`."""

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)


def register_synth_source(spark) -> None:
    """Idempotently register the synthetic corpus source."""
    spark.dataSource.register(SynthDocsDataSource)
