"""Compressed-payload text decode (round 11): crawl archives store
page payloads compressed (WARC members are gzip; APIs hand back
zlib/deflate bodies), so "documents as binary columns" starts one
step earlier than the HTML tier — with stdlib zlib, the same
zero-media-library policy as the PNG/WAV/AVI codecs.

- :func:`synthesize_gzip_docs` — the fixture ENCODER: each
  document's text compressed in a per-id container mix (gzip
  members with zeroed mtime on even ids, raw zlib streams on odd) —
  byte-deterministic, so the battery is reproducible.
- :func:`decompress_text_stats` — sniff the container (gzip magic
  ``1f 8b`` vs a zlib header), inflate, decode UTF-8, emit the FULL
  text + codec + length. The oracle cannot re-derive DEFLATE bytes
  in SQL, but it does not need to: it asserts the decompressed text
  equals the planted source text byte for byte — the round-trip
  proof that matters.

Scale shape: one Arrow-batched map over the binary column — scan
speed, the codec-tier contract. Truncated/corrupt streams raise
ValueError with the member offset (fail loudly, not half-decoded).
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECOMPRESS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("codec", StringType()),
        StructField("text", StringType()),
        StructField("n_chars", LongType()),
        StructField("compressed_len", IntegerType()),
    ]
)


def synthesize_gzip_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(media_id, content): text compressed as a gzip member
    (zeroed mtime — zlib's own gzip wrapper, deterministic) on even
    ids, a raw zlib stream on odd."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, text in zip(pdf[id_col], pdf[text_col]):
                mid = int(mid)
                data = str(text).encode("utf-8")
                wbits = 31 if mid % 2 == 0 else 15
                co = zlib.compressobj(6, zlib.DEFLATED, wbits)
                out.append((mid, co.compress(data) + co.flush()))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return docs.select(id_col, text_col).mapInPandas(
        fn,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("content", BinaryType()),
            ]
        ),
    )


def decompress_text_stats(media: DataFrame) -> DataFrame:
    """Sniff + inflate + UTF-8 decode a compressed binary column;
    see the module docstring."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                if len(b) >= 2 and b[0] == 0x1F and b[1] == 0x8B:
                    codec, wbits = "gzip", 31
                elif len(b) >= 1 and (b[0] & 0x0F) == 8:
                    codec, wbits = "zlib", 15
                else:
                    raise ValueError(
                        f"media {int(mid)}: unrecognized compressed "
                        f"container (first bytes {b[:2]!r})"
                    )
                try:
                    text = zlib.decompress(b, wbits).decode("utf-8")
                except zlib.error as e:
                    raise ValueError(
                        f"media {int(mid)}: corrupt {codec} stream: {e}"
                    ) from None
                out.append(
                    (int(mid), codec, text, len(text), len(b))
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in DECOMPRESS_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, DECOMPRESS_SCHEMA
    )
