"""Training-sequence packing (SURVEY.md §2.12 beyond-reference
tier): greedily pack variable-length documents into fixed
token-budget training sequences — the step between a curated corpus
and a dataloader that wants dense, fixed-width batches.

Packing is inherently sequential (bin boundaries depend on every
earlier document), so the 100 TB shape is SHARDED sequential
packing: documents are deterministically salted into ``n_shards``
independent streams (shard = id mod n_shards), each shard is packed
left-to-right by one task, and shards pack in parallel with zero
coordination. Fill efficiency is within noise of single-stream
greedy packing once shards hold ≳1000 documents, and the layout is
reproducible run-to-run (no RNG, no partition-order dependence) —
the same determinism argument as operators/splits.py.

The per-shard scan runs as a grouped-map ``applyInPandas`` (Arrow
batches, numpy loop over ints — per-task state is three scalars);
the DuckDB oracle replays the identical scan as a recursive CTE
over the shard-ordered row number, so the whole layout
hash-compares.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OUT_SCHEMA = (
    "doc_id bigint, shard int, bin int, pos bigint, n_tokens bigint"
)


def _pack_shard(budget: int):
    """Grouped-map kernel: first-fit-NEXT packing of one shard's
    id-ordered documents. New bin when the document would overflow a
    non-empty bin; oversized documents (len > budget) get a bin of
    their own rather than being dropped — the caller decides whether
    to truncate or split those downstream."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, poss = [], []
        bin_no, fill = 0, 0
        for ln in pdf["n_tokens"].to_numpy():
            if fill > 0 and fill + ln > budget:
                bin_no += 1
                fill = 0
            bins.append(bin_no)
            poss.append(fill)
            fill += int(ln)
        out = pdf[["doc_id", "shard", "n_tokens"]].copy()
        out["bin"] = bins
        out["pos"] = poss
        return out[["doc_id", "shard", "bin", "pos", "n_tokens"]]

    return pack


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col,
    budget: int,
    n_shards: int = 32,
) -> DataFrame:
    """Assign every document a (shard, bin, pos) slot in a packed
    training layout. ``len_col`` is a column name or Column giving
    the document's token length; ``budget`` is the sequence width.

    One shuffle (on shard), per-task memory O(1) beyond the Arrow
    batch. Output: (doc_id, shard, bin, pos, n_tokens)."""
    ln = F.col(len_col) if isinstance(len_col, str) else len_col
    salted = df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        ln.cast("bigint").alias("n_tokens"),
    )
    return salted.groupBy("shard").applyInPandas(
        _pack_shard(budget), _OUT_SCHEMA
    )


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Layout audit: per-shard bin count, mean fill fraction, and
    padding waste — the number a dataloader owner actually reads.
    Bins whose single document overflows the budget count as fill
    1.0 (they are emitted full-width and truncated downstream)."""
    per_bin = packed.groupBy("shard", "bin").agg(
        F.sum("n_tokens").alias("toks")
    )
    return per_bin.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("toks").alias("total_tokens"),
        F.round(
            F.avg(F.least(F.col("toks"), F.lit(budget)) / F.lit(budget)), 6
        ).alias("mean_fill"),
    )
