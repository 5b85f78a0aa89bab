"""Document chunking — fixed-size sliding token windows.

The RAG/embedding-prep staple: split each document into token
windows of ``size`` every ``stride`` tokens (overlap = size -
stride), keeping per-chunk provenance (doc id, chunk index, token
offset, token count). Pure higher-order column expressions —
``sequence`` for the window starts, ``slice``/``concat_ws`` for the
chunk text — so the whole operator is a narrow codegen'd explode:
no shuffle, no UDF, output rows ≈ |corpus tokens| / stride. At
100 TB this pipelines with the scan; the only scale knob is
downstream (how many chunk rows you embed per batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from top_produce_etl_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode documents into overlapping token-window chunks.

    Output: id col, ``chunk_id`` (0-based per doc), ``token_start``
    (0-based offset), ``n_tokens`` (≤ size; trailing chunks are
    shorter), ``chunk_text``. Every token position is covered
    (starts at 0, stride, 2·stride, … < n_tokens); empty documents
    yield no rows.
    """
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride <= size, got {stride} > {size}")
    t: Column = tokens(text_col)
    n = F.size(t)
    # guard: sequence(a, b) steps DOWNWARD when a > b (same footgun
    # functions.text.word_shingles documents) — an empty document
    # must yield an empty start list, not a fabricated one
    starts = F.when(
        n >= 1, F.sequence(F.lit(0), n - F.lit(1), F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        F.col(id_col),
        t.alias("__t"),
        n.alias("__n"),
        F.posexplode(starts).alias("chunk_id", "token_start"),
    )
    return exploded.select(
        id_col,
        "chunk_id",
        "token_start",
        F.least(F.lit(size), F.col("__n") - F.col("token_start")).alias(
            "n_tokens"
        ),
        F.concat_ws(
            " ", F.slice(F.col("__t"), F.col("token_start") + 1, size)
        ).alias("chunk_text"),
    )


def cdc_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    target_tokens: int = 32,
    hasher: str = "portable",
) -> DataFrame:
    """CONTENT-DEFINED chunking: a boundary falls after every token
    whose hash ≡ 0 (mod ``target_tokens``), so chunk edges are a
    function of the CONTENT, not of absolute positions — the FastCDC
    /rsync family's property that makes chunk-level dedup survive
    insertions: prepend one token to a document and fixed-stride
    windows ALL shift (every chunk hash changes), while CDC
    boundaries realign after the edit and every downstream chunk is
    byte-identical again. Expected chunk length = target_tokens
    (geometric); in a dedup pipeline the chunk texts feed the exact
    hash-groupBy (operators/dedup.py::exact_dedup) or the duplicate-
    span machinery.

    Plan shape: tokens posexplode once; the boundary flag is a
    narrow hash map; chunk ids are ONE per-doc cumulative window
    (partitioned by document — parallel, never global); reassembly
    is one (doc, chunk) hash-agg with an in-row ``array_sort`` (no
    second window). ``hasher="portable"`` is the cross-engine
    oracle contract (functions/portable_hash.py); ``"xxhash64"`` is
    the production default at scale (one fused intrinsic per
    token).

    Output: (id, chunk_id, n_tokens, chunk_text) — chunk_id 0-based
    per document in token order.
    """
    if target_tokens < 2:
        raise ValueError(
            f"target_tokens must be >= 2, got {target_tokens}"
        )
    from pyspark.sql import Window

    if hasher == "portable":
        from top_produce_etl_spark.functions.portable_hash import (
            composite_hash_col,
        )

        h = composite_hash_col("__tok")
    elif hasher == "xxhash64":
        h = F.abs(F.xxhash64(F.col("__tok")))
    else:
        raise ValueError(f"unknown hasher: {hasher}")
    toked = docs.select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("__pos", "__tok"),
    )
    flagged = toked.withColumn(
        "__b", (h % target_tokens == 0).cast("bigint")
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy(F.col("__pos").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_chunk = flagged.withColumn(
        "chunk_id", F.coalesce(F.sum("__b").over(w), F.lit(0))
    )
    return (
        with_chunk.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct("__pos", "__tok"))
            ).alias("__ordered"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.col("n_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.col("__ordered"), lambda s: s.getField("__tok")
                ),
            ).alias("chunk_text"),
        )
    )
