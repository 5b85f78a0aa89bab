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
partitioning, any engine — produce identical rows. Ground-truth
plants for the dedup tier:

- ``dup_every``: id k·dup_every+1 reuses k·dup_every's text — one
  exact-dup pair per ``dup_every`` ids, at any scale.
- ``hot_cluster``: the LAST ``hot_cluster`` ids all share one text —
  a pathological hot-key duplicate cluster (every near-dup band
  bucket for those ids collides), the skew case a 100 TB dedup run
  must survive. Downstream, connected components must collapse the
  cluster into ONE group of exactly ``hot_cluster`` members.
- ``zipf``: token draw skew. 0 (default) = uniform over the vocab
  (byte-identical to the original generator); s > 0 draws token
  ranks from a Zipf(s) distribution, concentrating mass on a few
  hot tokens — and therefore hot SHINGLES, the shuffle-skew stressor
  for the inverted-index/jaccard paths.
- ``vocab``: vocabulary size. Defaults to the built-in 30-word list;
  larger values switch to generated tokens ``t0..t{vocab-1}``.
  Zipf skew REQUIRES a realistically large vocab: over a 30-word
  vocab, Zipf concentration makes every pair of documents genuinely
  similar (the shingle space collapses), so a near-dup join's output
  is legitimately quadratic — that is corpus degeneracy, not
  operator stress. Real text is Zipf over 10^4-10^6 types; with
  ``vocab=10000, zipf=1.1`` individual shingles get hot (the skew
  stressor) while unrelated docs stay dissimilar.

The generation kernel is numpy-vectorized per partition (the per-row
Python loop was the probe bottleneck at 500k docs); the scalar
:func:`_doc_text` remains the reference implementation and the
vectorized path is pinned bit-identical to it by unit test.

This is also the §2.1 coverage row for the Python DataSource API
itself: schema declaration, option plumbing, partition planning
(``partitions``), and executor-side iteration.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

VOCAB = (
    "the a data row key value table scan join merge sort hash filter "
    "window batch stream fast slow big small group query line part "
    "order customer agg spark"
).split()

_M32 = 0xFFFFFFFF


def _zipf_cdf(s: float, n: int) -> np.ndarray:
    """CDF over ``n`` vocab ranks with p(r) ∝ 1/r^s (rank = vocab
    position). Computed in float64 once; BOTH the scalar and
    vectorized paths draw through this same array, so they agree
    bitwise."""
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w) / np.sum(w)


def _vocab_array(n: int) -> np.ndarray:
    """The token strings for a vocab of size ``n``: the built-in
    word list when it suffices, generated ``t{i}`` tokens beyond."""
    if n <= len(VOCAB):
        return np.array(VOCAB[:n])
    return np.char.add("t", np.arange(n).astype(str))


def _effective_id(
    doc_id: int, rows: int, dup_every: int, hot_cluster: int
) -> int:
    """The id whose seed actually generates doc_id's text (identity
    for ordinary docs; the shared base id for planted dups and the
    hot cluster)."""
    if hot_cluster and doc_id >= rows - hot_cluster:
        doc_id = rows - hot_cluster
    if dup_every and doc_id % dup_every == 1:
        doc_id -= 1
    return doc_id


def _doc_text(
    doc_id: int,
    n_tokens: int,
    dup_every: int,
    rows: int = 0,
    hot_cluster: int = 0,
    zipf: float = 0.0,
    vocab: int | None = None,
) -> str:
    """Scalar reference generator — pure function of doc_id."""
    base = _effective_id(doc_id, rows, dup_every, hot_cluster)
    n_vocab = vocab or len(VOCAB)
    words = _vocab_array(n_vocab)
    cdf = _zipf_cdf(zipf, n_vocab) if zipf > 0 else None
    x = (base * 2654435761 + 1) & _M32
    out = []
    for _ in range(n_tokens):
        # xorshift32 — cheap, deterministic, seedable per doc
        x ^= (x << 13) & _M32
        x ^= x >> 17
        x ^= (x << 5) & _M32
        if cdf is None:
            out.append(words[x % n_vocab])
        else:
            u = x / 4294967296.0
            out.append(words[int(np.searchsorted(cdf, u, side="right"))])
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
        self.hot_cluster = int(options.get("hot_cluster", 0))
        self.zipf = float(options.get("zipf", 0.0))
        self.vocab = int(options.get("vocab", len(VOCAB)))

    def partitions(self):
        step = -(-self.rows // self.n_parts)
        return [
            _RangePartition(i, min(i + step, self.rows))
            for i in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        # Vectorized across the partition's docs: the xorshift state
        # advances once per TOKEN over an (n_docs,) uint32 vector, so
        # the Python-level loop is n_tokens long, not n_docs*n_tokens.
        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        eff = ids.copy()
        if self.hot_cluster:
            hot_base = self.rows - self.hot_cluster
            eff[eff >= hot_base] = hot_base
        if self.dup_every:
            eff = eff - (eff % self.dup_every == 1)
        x = ((eff * 2654435761 + 1) & _M32).astype(np.uint32)
        cdf = _zipf_cdf(self.zipf, self.vocab) if self.zipf > 0 else None
        vocab = _vocab_array(self.vocab)
        cols = []
        for _ in range(self.n_tokens):
            x ^= x << np.uint32(13)
            x ^= x >> np.uint32(17)
            x ^= x << np.uint32(5)
            if cdf is None:
                cols.append(x % np.uint32(self.vocab))
            else:
                u = x.astype(np.float64) / 4294967296.0
                cols.append(
                    np.searchsorted(cdf, u, side="right").astype(np.uint32)
                )
        # (n_docs, n_tokens) token-index matrix -> joined strings
        idx = np.stack(cols, axis=1)
        toks = vocab[idx]
        for doc_id, row in zip(ids.tolist(), toks):
            yield doc_id, " ".join(row)


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


class SynthEmbsReader(DataSourceReader):
    """Separable clustered embeddings with PLANTED neighbor truth —
    the fixture a PQ/IVF recall gate needs (the sf embeddings table
    is near-uniform: true top-3 gaps sit below any 32× compressor's
    noise floor, so recall there is structurally meaningless — see
    BASELINE.md wave-6 and tests/test_pq.py).

    Construction: ``groups`` groups of ``rows/groups`` members.
    Group g's vector concatenates one CANONICAL pattern per
    subspace, picked by a per-subspace digit:

        digit_s(g) = (g + s) % codes               (s even)
        digit_s(g) = (g + g//codes + s) % codes    (s odd)

    Patterns are signed one-hots (value v → +1/−1 at position v%d),
    so two patterns dot to 0 or −1. The digit map guarantees, for
    groups ≤ codes²: (a) the ``codes`` lowest ids — PQ-train's init
    — cover ALL canonical values in EVERY subspace (ids interleave
    groups: id % groups), and (b) any two distinct groups differ in
    ≥ half the subspaces, so cross-group cosine ≤ ~0.5 while
    groupmates sit at ~1.0 (members differ only by ``noise``·U[-1,1)
    jitter). With members = k+1 = 4, a query's true top-3 are
    exactly its 3 groupmates, and a CORRECT PQ — whose codebooks
    recover the canonical patterns — retrieves exactly them
    (recall 1.0); a broken one can't. Deterministic: pure function
    of vec_id (xorshift noise seeded per id)."""

    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 256))
        self.n_parts = max(1, int(options.get("partitions", 4)))
        self.groups = int(options.get("groups", 64))
        self.dim = int(options.get("dim", 64))
        self.subspaces = int(options.get("subspaces", 8))
        self.codes = int(options.get("codes", 16))
        self.noise = float(options.get("noise", 0.02))
        if self.dim % self.subspaces:
            raise ValueError("dim must divide into subspaces")
        if self.groups > self.codes * self.codes:
            raise ValueError(
                "groups > codes^2 would alias group code patterns"
            )

    def partitions(self):
        step = -(-self.rows // self.n_parts)
        return [
            _RangePartition(i, min(i + step, self.rows))
            for i in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        ids = np.arange(partition.start, partition.end, dtype=np.int64)
        g = ids % self.groups
        d = self.dim // self.subspaces
        emb = np.zeros((len(ids), self.dim), dtype=np.float64)
        rowix = np.arange(len(ids))
        for s in range(self.subspaces):
            if s % 2 == 0:
                v = (g + s) % self.codes
            else:
                v = (g + g // self.codes + s) % self.codes
            pos = (v % d).astype(np.int64)
            sign = np.where(v < d, 1.0, -1.0)
            emb[rowix, s * d + pos] = sign
        # deterministic jitter: one xorshift32 stream per id,
        # advanced once per coordinate
        x = ((ids * 2654435761 + 7919) & _M32).astype(np.uint32)
        for i in range(self.dim):
            x ^= x << np.uint32(13)
            x ^= x >> np.uint32(17)
            x ^= x << np.uint32(5)
            u = x.astype(np.float64) / 4294967296.0 * 2.0 - 1.0
            emb[:, i] += self.noise * u
        for vid, gg, row in zip(ids.tolist(), g.tolist(), emb):
            yield vid, int(gg), [float(val) for val in row]


class SynthEmbsDataSource(DataSource):
    """``spark.read.format("synthembs")`` after
    :func:`register_synth_source`."""

    @classmethod
    def name(cls) -> str:
        return "synthembs"

    def schema(self) -> str:
        return "vec_id bigint, grp bigint, embedding array<double>"

    def reader(self, schema) -> SynthEmbsReader:
        return SynthEmbsReader(self.options)


def register_synth_source(spark) -> None:
    """Idempotently register the synthetic corpus sources."""
    spark.dataSource.register(SynthDocsDataSource)
    spark.dataSource.register(SynthEmbsDataSource)
