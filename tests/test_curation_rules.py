"""Round-8 curation-rule operators: Gopher document-shape rules,
C4 line cleaning, structured PII scan/redact, linear-interpolation
gap fill, and the perceptual image dHash."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gopher_rules_attribution(spark):
    docs = spark.createDataFrame(
        [
            # passes everything (30 words incl. 2 stopwords)
            (1, " ".join(["the", "a"] + ["data"] * 28)),
            # too short
            (2, "the a small doc"),
            # no stopwords
            (3, " ".join(["data"] * 40)),
            # bullet lines + ellipsis lines
            (4, "\n".join(["- item one..."] * 10)),
        ],
        "doc_id long, text string",
    )
    from top_produce_etl_spark.operators.textquality import gopher_rules

    out = {
        r["doc_id"]: r
        for r in gopher_rules(
            docs, "doc_id", "text", min_words=30
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["ok_words"] is False
    assert out[3]["keep"] is False and out[3]["ok_stopwords"] is False
    assert out[4]["ok_bullets"] is False  # 100% bullet lines > 0.9
    assert out[4]["ok_ellipsis"] is False  # 100% ellipsis lines > 0.3
    assert out[4]["bullet_frac"] == 1.0


def test_clean_lines_rules(spark):
    text = "\n".join(
        [
            "this line is long and clean.",  # kept
            "short.",  # < 3 words
            "no terminal punctuation here",  # no terminal
            "try our Lorem Ipsum special today.",  # bad marker (ci)
            "var x = { a: 1 };",  # curly brace
            'he said "stop".',  # kept (quote terminal? ends '.')
        ]
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    from top_produce_etl_spark.operators.textquality import clean_lines

    r = clean_lines(docs, "doc_id", "text").collect()[0]
    assert r["n_lines"] == 6
    assert r["n_kept"] == 2
    assert r["text_clean"] == (
        'this line is long and clean.\nhe said "stop".'
    )


def test_gapfill_linear_interpolates_interior_only(spark):
    from top_produce_etl_spark.operators.eventtime import gapfill

    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", 10.0),
            ("k", "2024-01-04 00:00:00", 40.0),
            ("k", "2024-01-06 00:00:00", 20.0),
        ],
        "k string, d string, v double",
    ).select("k", F.col("d").cast("timestamp").alias("d"), "v")
    rows = {
        r["d"].day: (r["v"], r["is_gap"])
        for r in gapfill(df, "k", "d", "v", "1 day", fill="linear").collect()
    }
    assert rows[1] == (10.0, False)
    assert rows[2] == (20.0, True)   # 10 + 30*(1/3)
    assert rows[3] == (30.0, True)   # 10 + 30*(2/3)
    assert rows[4] == (40.0, False)
    assert rows[5] == (30.0, True)   # midpoint of 40 -> 20
    assert rows[6] == (20.0, False)


def test_gapfill_linear_edges_stay_null(spark):
    from top_produce_etl_spark.operators.eventtime import gapfill

    # one observation only: nothing to bracket — the single grid row
    # is the observation itself; build a two-key frame where one key
    # has a leading hole via a null-value row
    df = spark.createDataFrame(
        [
            ("k", "2024-01-01 00:00:00", None),
            ("k", "2024-01-03 00:00:00", 5.0),
        ],
        "k string, d string, v double",
    ).select("k", F.col("d").cast("timestamp").alias("d"), "v")
    rows = {
        r["d"].day: r["v"]
        for r in gapfill(df, "k", "d", "v", "1 day", fill="linear").collect()
    }
    # days 1-2 precede the first observation: no bracket, NULL
    assert rows[1] is None and rows[2] is None and rows[3] == 5.0


def test_pii_scan_and_redact(spark):
    from top_produce_etl_spark.operators.pii import pii_scan, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c@x.io and 25-989-741-2988 from 10.0.0.1"),
            (2, "ssn 123-45-6789 clean otherwise"),
            (3, "no pii at all"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r for r in pii_scan(df, "id", "text").collect()}
    assert (got[1]["n_email"], got[1]["n_phone"], got[1]["n_ipv4"]) == (
        1, 1, 1,
    )
    assert got[1]["n_ssn"] == 0 and got[1]["n_pii_total"] == 3
    assert got[2]["n_ssn"] == 1 and got[2]["n_pii_total"] == 1
    assert got[3]["n_pii_total"] == 0

    red = {r["id"]: r["text_redacted"] for r in
           redact_pii(df, "id", "text").collect()}
    assert red[1] == "mail <EMAIL> and <PHONE> from <IPV4>"
    assert red[2] == "ssn <SSN> clean otherwise"
    assert red[3] == "no pii at all"


def test_pii_rejects_unknown_kind(spark):
    import pytest

    from top_produce_etl_spark.operators.pii import pii_scan

    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="unknown PII kinds"):
        pii_scan(df, "id", "text", kinds=("EMAIL", "IBAN"))


def test_image_dhash_cross_format_duplicates(spark):
    """The planted-duplicate property the battery query relies on:
    with an odd effective_mod, a duplicate class holds BOTH a PPM and
    a BMP encoding of the same pixels, and image_dhash maps them to
    identical bands — only true if the decoder normalizes the BMP
    bottom-up/BGR/padded layout back to the PPM pixel plane."""
    from top_produce_etl_spark.operators.multimodal import (
        image_dhash,
        synthesize_images,
    )

    ids = spark.range(0, 78).withColumnRenamed("id", "doc_id")
    media = synthesize_images(ids, effective_mod=39)
    fmts = {
        (r["media_id"] % 39, r["fmt"])
        for r in media.select("media_id", "fmt").collect()
    }
    # every class has both encodings (39 odd -> parity alternates)
    assert all((e, "ppm") in fmts and (e, "bmp") in fmts
               for e in range(39))
    d = image_dhash(media)
    n_groups = (
        d.groupBy("b0", "b1", "b2", "b3")
        .agg(F.countDistinct((F.col("media_id") % 39)).alias("cls"))
        .agg(F.max("cls"), F.count(F.lit(1)))
        .collect()[0]
    )
    # each band-group holds exactly one pixel class (no cross-class
    # merge at 78 images), and both format variants landed together
    assert n_groups[0] == 1
    pair_sizes = {
        r["n"]
        for r in d.groupBy("b0", "b1", "b2", "b3")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert pair_sizes == {2}


def test_rrf_fuse_hand_checked(spark):
    from top_produce_etl_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)],
        "query_id long, neighbor_id long, rank int",
    )
    rows = {
        r["neighbor_id"]: (r["rrf_score"], r["rank"])
        for r in rrf_fuse([a, b]).collect()
    }
    # doc 11: 1/62 + 1/61; doc 10: 1/61 + 1/63; doc 12/13 single-list
    assert rows[11][0] == 1 / 62 + 1 / 61
    assert rows[10][0] == 1 / 61 + 1 / 63
    assert rows[12][0] == 1 / 63 and rows[13][0] == 1 / 62
    # fused order: 11 (both high) > 10 > 13 > 12
    assert [rows[d][1] for d in (11, 10, 13, 12)] == [1, 2, 3, 4]


def test_rrf_fuse_requires_input(spark):
    import pytest

    from top_produce_etl_spark.operators.retrieval import rrf_fuse

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])


def test_weighted_quantiles_hand_checked(spark):
    from top_produce_etl_spark.operators.stats import weighted_quantiles

    df = spark.createDataFrame(
        [("g", 1, 1), ("g", 2, 1), ("g", 3, 8),
         ("h", 5, 3), ("h", 7, 1)],
        "g string, v int, w int",
    )
    out = {
        r["g"]: r
        for r in weighted_quantiles(
            df, ["g"], "v", "w", qs=[(1, 2), (1, 1)]
        ).collect()
    }
    # g: W=10, cum(1)=1, cum(2)=2, cum(3)=10 -> p50 = 3; max = 3
    assert out["g"]["wq_1_2"] == 3 and out["g"]["wq_1_1"] == 3
    # h: W=4, cum(5)=3 >= 2 -> p50 = 5; max = 7
    assert out["h"]["wq_1_2"] == 5 and out["h"]["wq_1_1"] == 7


def test_weighted_quantiles_rejects_bad_q(spark):
    import pytest

    from top_produce_etl_spark.operators.stats import weighted_quantiles

    df = spark.createDataFrame([("g", 1, 1)], "g string, v int, w int")
    with pytest.raises(ValueError, match="outside"):
        weighted_quantiles(df, ["g"], "v", "w", qs=[(3, 2)])


def test_rerank_exact_subset_and_full_equivalence(spark, sf_dir):
    """Stage-2 rerank invariants: the reranked top-k is always a
    subset of its shortlist, and reranking over the FULL pair space
    reproduces cosine_topk_bruteforce exactly (same kernel)."""
    from top_produce_etl_spark.operators.similarity import (
        cosine_topk_bruteforce,
        rerank_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(
        emb, queries, "vec_id", "embedding", k=3
    )
    # full pair space as the shortlist -> identical result
    all_pairs = (
        queries.select(F.col("vec_id").alias("query_id"))
        .crossJoin(emb.select(F.col("vec_id").alias("neighbor_id")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    rr = rerank_exact(emb, all_pairs, "vec_id", "embedding", k=3)
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(rr.collect(), key=key) == sorted(
        exact.collect(), key=key
    )
    # subset property on a narrow shortlist
    short = exact.select("query_id", "neighbor_id")
    rr2 = {
        (r["query_id"], r["neighbor_id"])
        for r in rerank_exact(
            emb, short, "vec_id", "embedding", k=2
        ).collect()
    }
    shortset = {
        (r["query_id"], r["neighbor_id"]) for r in short.collect()
    }
    assert rr2 <= shortset and len(rr2) == 10


def test_weighted_quantiles_rejects_fractional_weights(spark):
    """r9 advisor fix: fractional weight columns are rejected up
    front instead of silently truncated (Spark cast truncates,
    DuckDB rounds — a silent cast would break the bit-exact oracle
    contract data-dependently)."""
    import pytest

    from top_produce_etl_spark.operators.stats import weighted_quantiles

    df = spark.createDataFrame([("g", 1, 1.5)], "g string, v int, w double")
    with pytest.raises(TypeError, match="integral weight column"):
        weighted_quantiles(df, ["g"], "v", "w")


def test_rerank_exact_dedups_shortlist_pairs(spark):
    """r9 advisor fix: a duplicated (query, neighbor) shortlist pair
    must not occupy two of the k ranks — rerank_exact collapses
    duplicates before scoring (rrf_fuse already defended against
    this input shape; rerank accepts any tier's output too)."""
    from top_produce_etl_spark.operators.similarity import rerank_exact

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.1]), (2, [0.0, 1.0]),
         (3, [0.9, 0.2])],
        "vec_id int, embedding array<float>",
    )
    shortlist = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 1), (0, 2), (0, 3)], ["query_id", "neighbor_id"]
    )
    out = rerank_exact(corpus, shortlist, "vec_id", "embedding", k=3)
    rows = {(r["neighbor_id"], r["rank"]) for r in out.collect()}
    # neighbor 1 appears exactly once despite three shortlist copies;
    # all three distinct candidates make the top-3
    assert len(rows) == 3
    assert {n for n, _ in rows} == {1, 2, 3}
