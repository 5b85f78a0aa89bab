"""URL curation family (round 9 — operators/urls.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.urls import (
    normalize_urls,
    parse_urls,
    synthesize_urls,
    with_registered_domain,
)


def _one(spark, url):
    df = spark.createDataFrame([(1, url)], ["doc_id", "url"])
    return normalize_urls(df, "url").collect()[0]


def test_normalize_collapses_cosmetic_variants(spark):
    """Every documented normalization collapses its variant class to
    the same canonical string."""
    variants = [
        "HTTPS://WWW.Example.COM:443/a/b/?lang=en&id=7#frag",
        "https://example.com/a/b?id=7&lang=en",
        "https://www.example.com/a/b/?utm_source=tw&id=7&lang=en",
        "https://Example.com:443/a/b?lang=en&utm_campaign=x&id=7&gclid=z",
        "https://example.com/a/b?ref=feed&id=7&lang=en#other",
    ]
    canon = {_one(spark, u)["canonical_url"] for u in variants}
    assert canon == {"https://example.com/a/b?id=7&lang=en"}


def test_normalize_keeps_semantic_differences(spark):
    """Non-default port, different path, different non-tracking param
    values survive normalization."""
    urls = [
        "https://example.com:8443/a?id=7",
        "https://example.com/a?id=7",
        "https://example.com/b?id=7",
        "https://example.com/a?id=8",
        "http://example.com/a?id=7",
    ]
    canon = [_one(spark, u)["canonical_url"] for u in urls]
    assert len(set(canon)) == len(urls)


def test_registered_domain_multilabel(spark):
    rows = spark.createDataFrame(
        [
            (1, "a.b.example.co.uk"),
            (2, "news.example.com"),
            (3, "example.org"),
            (4, "localhost"),
            (5, "deep.sub.shop.com.au"),
        ],
        ["doc_id", "host"],
    )
    got = {
        r["doc_id"]: r["domain"]
        for r in with_registered_domain(rows).collect()
    }
    assert got == {
        1: "example.co.uk",
        2: "example.com",
        3: "example.org",
        4: "localhost",
        5: "shop.com.au",
    }


def test_parse_handles_unparseable(spark):
    df = spark.createDataFrame(
        [(1, "not a url"), (2, "ftp://files.example.net/pub/x")],
        ["doc_id", "url"],
    )
    got = {r["doc_id"]: r for r in parse_urls(df, "url").collect()}
    assert got[1]["scheme"] == "" and got[1]["host"] == ""
    assert got[2]["scheme"] == "ftp"
    assert got[2]["host"] == "files.example.net"
    assert got[2]["path"] == "/pub/x"


def test_url_dedup_planted_truth(spark, sf_dir):
    """With effective_mod the fixture plants duplicate classes whose
    raw strings all DIFFER (cosmetics keyed on the raw id) but whose
    canonical form is one per class — and no class crosses another."""
    docs = load_table(spark, sf_dir, "documents")
    urls = synthesize_urls(docs, effective_mod=50)
    canon = normalize_urls(urls, "url")
    agg = canon.groupBy("canonical_url").agg(
        F.count("*").alias("n"),
        F.countDistinct("url").alias("variants"),
        F.countDistinct(F.col("doc_id") % 50).alias("classes"),
    )
    rows = agg.collect()
    assert len(rows) == 50  # one canonical per planted class
    assert all(r["classes"] == 1 for r in rows)  # no cross-class merge
    # cosmetic variance is real: most classes carry >1 raw string
    assert sum(r["variants"] > 1 for r in rows) >= 45


def test_normalize_for_dedup_planted_classes(spark):
    """The CCNet-style key collapses case/digit/punct/whitespace
    variants and nothing else (r9 — operators/dedup.py)."""
    from top_produce_etl_spark.operators.dedup import (
        normalized_exact_dedup,
    )

    rows = spark.createDataFrame(
        [
            (0, "the quick brown fox"),
            (1, "  The QUICK,   brown fox!! (2024)"),
            (2, "the quick brown fox 99"),
            (3, "the quick brown wolf"),  # real difference survives
        ],
        ["doc_id", "text"],
    )
    out = {
        r["norm_key"]: r
        for r in normalized_exact_dedup(rows, "text", "doc_id").collect()
    }
    assert set(out) == {"the quick brown fox", "the quick brown wolf"}
    fox = out["the quick brown fox"]
    assert fox["doc_id"] == 0 and fox["n_dups"] == 3
    assert fox["n_variants"] == 3
    assert out["the quick brown wolf"]["n_dups"] == 1


def test_normalize_oracle_underscore_prefix_not_like_wildcard(spark):
    """Round-10 ADVICE regression: 'utm_' is a PREFIX, and '_' must
    not act as a LIKE single-char wildcard in the DuckDB oracle — a
    param named 'utmz' is NOT tracking noise and must survive
    normalization identically on both engines."""
    import duckdb

    from top_produce_etl_spark.operators.urls import normalize_urls_oracle

    url = "https://example.com/a?utmz=1&utm_source=tw&id=7"
    got = _one(spark, url)["canonical_url"]
    assert got == "https://example.com/a?id=7&utmz=1"
    duck = duckdb.connect().execute(
        f"SELECT {normalize_urls_oracle(repr(url))} AS c"
    ).fetchone()[0]
    assert duck == got
