"""Charset repair (round 11): mojibake — UTF-8 bytes mis-decoded as
Latin-1 somewhere upstream ("café" → "cafÃ©") — is endemic in web
crawl text, and repairing it beats dropping the documents. The
classic fix (ftfy's core move, public) is to re-encode the broken
string as Latin-1 and decode the bytes as UTF-8, which inverts the
corruption exactly.

Engine shape: the repair itself uses Spark's REAL charset machinery
(``decode(encode(text, 'ISO-8859-1'), 'UTF-8')``), but Spark 4's
charset functions RAISE on unmappable/malformed input — so the
repair is gated by pure-regex proofs that the conversion cannot
fail AND is genuinely a mojibake inversion:

1. ``latin1_safe``: every char ≤ U+00FF (encodable to Latin-1);
2. ``utf8_valid``: the chars, read as bytes, form VALID UTF-8 (the
   classic validation regex over ``\\x80-\\xff`` classes — valid in
   both java.util.regex and RE2);
3. ``has_hi``: at least one char ≥ U+0080 (pure ASCII needs no
   repair; keeps the expensive branch off the hot path).

A clean string containing real accented text fails (2) — "é "
read as bytes is an invalid UTF-8 sequence — so the gate cannot
corrupt healthy text; CJK and anything already > U+00FF fails (1).
All three gates and the conversion are column expressions: zero
shuffle, scan speed.

Oracle story: DuckDB has no Latin-1 transcoding, so the fixture
PLANTS the corruption around known non-ASCII words and the twin
replays corruption and repair as literal replace() pairs computed
by Python's own codecs — if the engine's charset-based repair is
correct it reproduces the oracle's strings byte for byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LATIN1_SAFE = "^[\\x00-\\xff]*$"
_UTF8_VALID = (
    "^([\\x00-\\x7f]"
    "|[\\xc2-\\xdf][\\x80-\\xbf]"
    "|\\xe0[\\xa0-\\xbf][\\x80-\\xbf]"
    "|[\\xe1-\\xec][\\x80-\\xbf]{2}"
    "|\\xed[\\x80-\\x9f][\\x80-\\xbf]"
    "|[\\xee-\\xef][\\x80-\\xbf]{2}"
    "|\\xf0[\\x90-\\xbf][\\x80-\\xbf]{2}"
    "|[\\xf1-\\xf3][\\x80-\\xbf]{3}"
    "|\\xf4[\\x80-\\x8f][\\x80-\\xbf]{2})*$"
)
_HAS_HI = "[\\x80-\\xff]"

# Planted non-ASCII vocabulary for the fixture (word, index by
# doc_id % 5). Públic words only; their mojibake forms derive from
# Python's own codecs at import time — the same bytes the engine's
# charset machinery manipulates.
MOJIBAKE_WORDS: tuple[str, ...] = (
    "café", "naïve", "müller", "señor", "中文词"
)
MOJIBAKE_FORMS: tuple[str, ...] = tuple(
    w.encode("utf-8").decode("latin-1") for w in MOJIBAKE_WORDS
)


def mojibake_gate(col: Column) -> Column:
    return (
        col.rlike(_LATIN1_SAFE)
        & col.rlike(_UTF8_VALID)
        & col.rlike(_HAS_HI)
    )


def repair_mojibake(
    df: DataFrame, text_col: str = "text", out: str | None = None
) -> DataFrame:
    """Attach ``out`` (default: overwrite ``text_col``) with the
    mojibake-repaired text plus ``was_mojibake``; see the module
    docstring for the gate that makes the strict charset conversion
    safe and conservative."""
    out = out or text_col
    c = F.col(text_col)
    gate = mojibake_gate(c)
    repaired = F.when(
        gate, F.decode(F.encode(c, "ISO-8859-1"), "UTF-8")
    ).otherwise(c)
    return df.withColumn("was_mojibake", gate).withColumn(
        out, repaired
    )


def synthesize_mojibake_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, raw): the corpus text plus a planted non-ASCII word —
    CORRUPTED (UTF-8-as-Latin-1) on every third document. The
    corruption is applied by the engine's real charset functions;
    the oracle twin replays it with literal replaces."""
    i = F.col(id_col)
    word = F.element_at(
        F.array(*[F.lit(w) for w in MOJIBAKE_WORDS]),
        (i % 5).cast("int") + 1,
    )
    clean = F.concat(F.col(text_col), F.lit(" "), word)
    corrupted = F.decode(F.encode(clean, "UTF-8"), "ISO-8859-1")
    return docs.select(
        i,
        F.when(i % 3 == 0, corrupted).otherwise(clean).alias("raw"),
    )


def mojibake_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin: plant, corrupt (literal replaces derived from
    Python codecs) and repair (inverse replaces) — emitting the
    same (id, was_mojibake, text_repaired, n_chars) the engine's
    charset-based path produces."""
    words = ", ".join(f"'{w}'" for w in MOJIBAKE_WORDS)
    return f"""
    WITH mj_clean AS (
        SELECT {id_col},
               {text_col} || ' '
               || ([{words}])[CAST({id_col} % 5 AS INT) + 1] AS clean
        FROM {table}
    )
    SELECT {id_col},
           ({id_col} % 3 = 0) AS was_mojibake,
           clean AS text_repaired,
           CAST(length(clean) AS BIGINT) AS n_chars
    FROM mj_clean
    """
