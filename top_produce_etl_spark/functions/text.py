"""Text-analysis column expressions (SURVEY.md §2.11, BASELINE.json
north star): tokenization, shingling, quality features, language-ID.

Everything here is built-in-function compositions — JVM-side,
codegen'd, zero Python in the row path. Shingling uses higher-order
array functions (transform/sequence/slice) instead of a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (fixture docs are space-separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles_of(t: Column, k: int) -> Column:
    """k-word shingles from an ALREADY-MATERIALIZED token-array
    column (an attribute reference, not a ``split`` expression).
    Documents shorter than k tokens yield an empty array (the
    guard matters: Spark's ``sequence(a, b)`` steps DOWNWARD when
    a > b, which would silently fabricate bogus shingles).

    Hot paths must tokenize in their OWN projection and pass the
    column here: the per-position lambda references the array once
    per shingle, and codegen inlines a raw ``split`` expression into
    every reference — re-tokenizing the document per position,
    O(n²) total (measured 2.8× on the sf0.1 shingle build). An
    attribute reference is O(1) per access."""
    n = F.size(t)
    gen = F.transform(
        F.sequence(F.lit(0), n - F.lit(k)),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, k)),
    )
    return F.when(n >= k, gen).otherwise(F.array().cast("array<string>"))


def word_shingles(col: Column | str, k: int) -> Column:
    """k-word shingles of a raw text column. Convenience form for
    one-off use; hot paths should stage tokenization and call
    :func:`shingles_of` (see its inlining note)."""
    return shingles_of(tokens(col), k)


# Deterministic marker-word lists for the language-ID heuristic.
# Real language ID uses character n-gram profiles; the fixture text
# is synthetic word soup, so this demonstrates the mechanism
# (scored marker lists -> argmax with fixed tie order) with markers
# drawn from the fixture vocabulary.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("data", "value", "row", "column"),
    "de": ("hash", "merge", "sort", "scan"),
}


def marker_score(col: Column | str, markers: tuple[str, ...]) -> Column:
    """Count of tokens that appear in the marker list."""
    in_list = ", ".join(f"'{m}'" for m in markers)
    t = tokens(col)
    return F.size(F.filter(t, lambda x: x.isin(*markers)))


def predict_lang(col: Column | str) -> Column:
    """Argmax over marker scores, ties broken in fixed order
    en > es > de, 'other' when all scores are zero."""
    s_en = marker_score(col, LANG_MARKERS["en"])
    s_es = marker_score(col, LANG_MARKERS["es"])
    s_de = marker_score(col, LANG_MARKERS["de"])
    return (
        F.when((s_en >= s_es) & (s_en >= s_de) & (s_en > 0), "en")
        .when((s_es >= s_de) & (s_es > 0), "es")
        .when(s_de > 0, "de")
        .otherwise("other")
    )


def quality_features(col: Column | str) -> dict[str, Column]:
    """Deterministic quality-scoring features for a text column:
    token count, mean token length, stopword ratio, distinct-token
    ratio — the standard cheap filters of an LLM-data pipeline."""
    t = tokens(col)
    c = F.col(col) if isinstance(col, str) else col
    n_tok = F.size(t)
    stop = marker_score(col, LANG_MARKERS["en"])
    return {
        "n_tokens": n_tok,
        "n_chars_obs": F.length(c),
        "avg_token_len": (F.length(F.regexp_replace(c, " ", "")).cast("double") / n_tok),
        "stopword_ratio": stop.cast("double") / n_tok,
        "distinct_token_ratio": F.size(F.array_distinct(t)).cast("double") / n_tok,
    }


def quality_score(col: Column | str) -> Column:
    """Composite quality score in [0, 1]: rewards longer docs (up
    to 64 tokens), token diversity, and penalizes stopword excess.
    Pure double arithmetic — identical across engines."""
    f = quality_features(col)
    len_component = F.least(f["n_tokens"].cast("double") / 64.0, F.lit(1.0))
    diversity = f["distinct_token_ratio"]
    stop_penalty = F.greatest(F.lit(0.0), F.lit(1.0) - f["stopword_ratio"] * 2.0)
    return (len_component * 0.4 + diversity * 0.4 + stop_penalty * 0.2)
