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
