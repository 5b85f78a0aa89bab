"""Data-quality checker (operators/quality.py)."""

from __future__ import annotations

import pytest

from top_produce_etl_spark.operators.quality import assert_quality, quality_report


def test_quality_report_counts_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (2, "c", -1.0), (4, "d", 7.0)],
        "id bigint, name string, score double",
    )
    dim = spark.createDataFrame([(1,), (2,)], "id bigint")
    report = {
        r["check"]: (r["violations"], r["total"])
        for r in quality_report(
            df,
            [
                {"check": "not_null", "col": "name"},
                {"check": "in_range", "col": "score", "lo": 0, "hi": 10},
                {"check": "matches", "col": "name", "pattern": "^[a-z]$"},
                {"check": "unique", "cols": ["id"]},
                {"check": "ref", "col": "id", "ref": dim, "ref_col": "id"},
            ],
        ).collect()
    }
    assert report == {
        "not_null_name": (1, 4),
        "in_range_score": (2, 4),   # 50.0 out of range + null-name row ok; -1.0
        "matches_name": (1, 4),     # the NULL name counts as violation
        "unique_id": (1, 4),        # one extra copy of id=2
        "ref_id": (1, 4),           # id=4 not in dim
    }


def test_assert_quality_raises_with_details(spark):
    df = spark.createDataFrame([(None,)], "x string")
    with pytest.raises(ValueError, match="not_null_x: 1/1"):
        assert_quality(df, [{"check": "not_null", "col": "x"}])


def test_assert_quality_passes_clean(spark):
    df = spark.createDataFrame([("a",)], "x string")
    assert_quality(df, [{"check": "not_null", "col": "x"}])


def test_l_diversity_flags_homogeneous_groups(spark):
    """A group that is k-anonymous but sensitive-homogeneous must be
    flagged by l-diversity and MISSED by k-anonymity — the exact
    failure mode the operator exists for."""
    import pytest

    from top_produce_etl_spark.operators.quality import (
        k_anonymity_violations,
        l_diversity_violations,
    )

    rows = (
        # group A: 10 rows, all the SAME disease -> k-anon OK (>=8),
        # l-diversity VIOLATION at l=2
        [(i, "10001", "M", "flu") for i in range(10)]
        # group B: 10 rows, 3 distinct -> passes both
        + [(100 + i, "10002", "F", ["flu", "cold", "ok"][i % 3])
           for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "id long, zip string, sex string, diagnosis string"
    )
    k_ok = k_anonymity_violations(df, ["zip", "sex"], 8).collect()
    assert k_ok == []  # k-anonymity is blind to homogeneity
    viol = l_diversity_violations(
        df, ["zip", "sex"], "diagnosis", 2
    ).collect()
    assert [(r["zip"], r["distinct_sensitive"]) for r in viol] == [
        ("10001", 1)
    ]
    with pytest.raises(ValueError, match=">= 2"):
        l_diversity_violations(df, ["zip"], "diagnosis", 1)


def test_t_closeness_homogeneous_vs_matching_groups(spark):
    """Hand-checked ordered EMD. Global = {0:5, 1:2, 2:2} over 9
    rows (B's homogeneity skews it). Group B (all '0', n_g=3), over
    the common denominator n_g*n = 27: cum diffs 3*9-5*3 = 12, then
    12 + (0*9-2*3) = 6, then 0 -> EMD = (12+6)/(27*2) = 1/3.
    Groups A/C ({0,1,2}): cum diffs -6, -3, 0 -> EMD = 9/54 = 1/6.
    The homogeneous group reads 2x the balanced ones and only it
    violates at t = 0.2."""
    from top_produce_etl_spark.operators.quality import (
        t_closeness_violations,
    )

    rows = [("A", v) for v in (0, 1, 2)]
    rows += [("B", 0), ("B", 0), ("B", 0)]  # homogeneous on 0
    rows += [("C", v) for v in (0, 1, 2)]
    df = spark.createDataFrame(rows, "grp string, s int")
    all_emd = {
        r["grp"]: r["emd_micro"]
        for r in t_closeness_violations(
            df, ["grp"], "s", t_micro=0
        ).collect()
    }
    assert all_emd == {"A": 166_666, "B": 333_333, "C": 166_666}
    viol = {
        r["grp"]: r["emd_micro"]
        for r in t_closeness_violations(
            df, ["grp"], "s", t_micro=200_000
        ).collect()
    }
    assert viol == {"B": 333_333}


def test_t_closeness_oracle_parity_duckdb(spark):
    """Cross-engine bit-identity of the integer EMD on a small
    synthetic with ragged group sizes."""
    import duckdb

    from top_produce_etl_spark.operators.quality import (
        t_closeness_oracle_sql,
        t_closeness_violations,
    )

    rows = [(f"g{i % 4}", (i * 7) % 5) for i in range(60)]
    rows += [("g9", 4)] * 7  # skewed small group
    df = spark.createDataFrame(rows, "grp string, s int")
    got = {
        (r["grp"]): (r["group_size"], r["emd_micro"])
        for r in t_closeness_violations(
            df, ["grp"], "s", t_micro=0
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = {
        g: (gs, emd)
        for g, gs, emd in con.execute(
            t_closeness_oracle_sql("t", ["grp"], "s", t_micro=0)
        ).fetchall()
    }
    assert got == want and "g9" in got


def test_t_closeness_rejects_bad_params(spark):
    import pytest

    from top_produce_etl_spark.operators.quality import (
        t_closeness_violations,
    )

    df = spark.createDataFrame([("a", 1)], "grp string, s int")
    with pytest.raises(ValueError, match="quasi_cols"):
        t_closeness_violations(df, [], "s", 1000)
    with pytest.raises(ValueError, match="t_micro"):
        t_closeness_violations(df, ["grp"], "s", 2_000_000)


def test_t_closeness_single_value_domain_trivially_close(spark):
    """Round-8 advisor fix: m = 1 (one global sensitive value) is
    trivially t-close — both engines must return ZERO violations
    rather than Spark silently NULL-passing while DuckDB raises a
    division-by-zero on the degenerate EMD denominator."""
    import duckdb

    from top_produce_etl_spark.operators.quality import (
        t_closeness_oracle_sql,
        t_closeness_violations,
    )

    df = spark.createDataFrame(
        [("g1", "only"), ("g1", "only"), ("g2", "only")],
        "grp string, s string",
    )
    assert t_closeness_violations(df, ["grp"], "s", 0).count() == 0
    con = duckdb.connect()
    con.register("t", df.toPandas())
    got = con.execute(
        t_closeness_oracle_sql("t", ["grp"], "s", t_micro=0)
    ).fetchall()
    assert got == []


# --- Frozen-cutoff surprisal bucketing (round 11) ---


def _frozen_fixture(spark):
    rows = []
    # 9 'a' docs with increasing rarity mix; 3 'b' docs; 1 'c' doc
    words = ["w0", "w1", "w2", "w3", "w4", "w5"]
    for i in range(9):
        rows.append((i, "a", " ".join(words[: (i % 5) + 1])))
    for i in range(9, 12):
        rows.append((i, "b", " ".join(words[(i % 3):])))
    rows.append((12, "c", "w0 w0"))
    return spark.createDataFrame(
        rows, "doc_id bigint, lang string, text string"
    )


def test_frozen_reference_reproduces_ntile(spark, tmp_path):
    """Bucketing the reference corpus against its OWN frozen
    artifact reproduces the ntile(3) assignment exactly — the
    (score, id) boundary pairs make ties unsplittable."""
    from pyspark.sql import functions as F

    from top_produce_etl_spark.operators._cache import unpersist_all
    from top_produce_etl_spark.operators.textquality import (
        bucket_frozen,
        load_surprisal_reference,
        perplexity_buckets,
        save_surprisal_reference,
        score_with_frozen_lm,
        surprisal_cutoffs,
        unigram_lm,
    )

    docs = _frozen_fixture(spark)
    path = str(tmp_path / "surp_ref")
    save_surprisal_reference(
        unigram_lm(docs), surprisal_cutoffs(docs, by=("lang",)), path
    )
    lm, cuts = load_surprisal_reference(spark, path)
    scored = score_with_frozen_lm(docs, lm).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    frozen = {
        r["doc_id"]: r["ppl_bucket"]
        for r in bucket_frozen(scored, cuts, by=("lang",)).collect()
    }
    ntile = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(docs, by=("lang",)).collect()
    }
    unpersist_all()
    assert frozen == ntile
    # the 1-doc group 'c' has NULL c2 (and its single row is head)
    c2 = {r["lang"]: r["c2_score"] for r in cuts.collect()}
    assert c2["c"] is None and frozen[12] == "head"


def test_frozen_oov_and_unknown_group(spark, tmp_path):
    """OOV terms score ln(ttotal) (count 1); rows in a group absent
    from the reference land deterministically in 'tail'."""
    from top_produce_etl_spark.operators.textquality import (
        bucket_frozen,
        score_with_frozen_lm,
        surprisal_cutoffs,
        unigram_lm,
        _round_half_up_micro,
    )

    ref = _frozen_fixture(spark)
    lm = unigram_lm(ref)
    cuts = surprisal_cutoffs(ref, by=("lang",))
    new = spark.createDataFrame(
        [(100, "zz", "totally unseen terms")],
        "doc_id bigint, lang string, text string",
    )
    scored = score_with_frozen_lm(new, lm).join(
        new.select("doc_id", "lang"), "doc_id"
    )
    row = bucket_frozen(scored, cuts, by=("lang",)).collect()[0]
    ttotal = sum(r["ctotal"] for r in lm.collect())
    assert row["mean_info_micro"] == _round_half_up_micro(ttotal)
    assert row["ppl_bucket"] == "tail"


def test_score_surprisal_expr_matches_join_scorer(spark):
    """The zero-shuffle expression scorer (streaming twin) is
    bit-identical to the tf-join scorer, OOV included."""
    from top_produce_etl_spark.operators.textquality import (
        score_surprisal_expr,
        score_with_frozen_lm,
        unigram_lm,
    )

    ref = _frozen_fixture(spark)
    docs = ref.union(
        spark.createDataFrame(
            [(50, "a", "w0 oov1 w5 oov1")],
            "doc_id bigint, lang string, text string",
        )
    )
    lm = unigram_lm(ref)
    lm_rows = lm.collect()
    ttotal = sum(r["ctotal"] for r in lm_rows)
    a = {
        r["doc_id"]: (r["n_tokens"], r["info_micro"], r["mean_info_micro"])
        for r in score_with_frozen_lm(docs, lm).collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens"], r["info_micro"], r["mean_info_micro"])
        for r in score_surprisal_expr(docs, lm_rows, ttotal).collect()
    }
    assert a == b
    # the expression plan is exchange-free (streaming-legal)
    plan = score_surprisal_expr(
        docs, lm_rows, ttotal
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- HTML main-text extraction (round 11) ---


def test_html_extract_handwritten_cases(spark):
    from top_produce_etl_spark.operators.html import extract_html_text

    cases = [
        # containers vanish entirely, incl. their text
        ("<html><head><title>T</title></head><body>hi</body></html>",
         "hi"),
        ("<p>a</p><script>alert('x')</script><p>b</p>", "a\nb"),
        ("<style media=\"x\">p{}</style>text", "text"),
        ("before<!-- secret -->after", "before after"),
        # block boundaries become line structure
        ("<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
        ("line1<br>line2<br/>line3", "line1\nline2\nline3"),
        # entities decode, &amp; last
        ("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f",
         "a & b <c> \"d\" 'e' f"),
        ("&amp;lt; stays entity-ish", "&lt; stays entity-ish"),
        # whitespace normalization
        ("<p>  a   b  </p>\n\n\n<p>c</p>", "a b\nc"),
        ("", ""),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)],
        "id int, html string",
    )
    got = {
        r["id"]: r["text"]
        for r in extract_html_text(df).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_html_extract_oracle_parity_handwritten(spark):
    """The DuckDB twin replays the chain byte for byte on the
    hand-built edge cases too (not just the battery fixture)."""
    import duckdb

    from top_produce_etl_spark.operators.html import (
        extract_html_text,
        extract_html_text_oracle,
    )

    rows = [
        (0, "<head>x</head><p>a &amp; b</p><!--c--><br>d"),
        (1, "<div class='nav'>n</div><h2>t</h2>body &nbsp; text"),
        (2, "plain"),
    ]
    df = spark.createDataFrame(rows, "id int, html string")
    got = {r["id"]: r["text"] for r in extract_html_text(df).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE h(id INT, html VARCHAR)"
    )
    con.executemany("INSERT INTO h VALUES (?, ?)", rows)
    duck = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT id, {extract_html_text_oracle('html')} FROM h"
        ).fetchall()
    }
    assert got == duck


# --- Mojibake repair (round 11) ---


def test_mojibake_repair_semantics(spark):
    from top_produce_etl_spark.operators.encoding import (
        repair_mojibake,
    )

    cases = [
        ("cafÃ© bar", "café bar", True),      # classic double-encode
        ("café bar", "café bar", False),      # healthy accents pass
        ("中文 text", "中文 text", False),     # CJK passes (> U+00FF)
        ("plain ascii", "plain ascii", False),
        ("ä¸­æ\x96\x87 x", "中文 x", True),    # CJK mojibake repairs
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(cases)],
        "id int, text string",
    )
    got = {
        r["id"]: (r["text"], r["was_mojibake"])
        for r in repair_mojibake(df).collect()
    }
    for i, (_, want, gate) in enumerate(cases):
        assert got[i] == (want, gate), (i, got[i])


def test_mojibake_double_repair_is_stable(spark):
    """Repairing already-repaired text is the identity (the gate
    fails on healthy output, so repeated application cannot walk
    the string further)."""
    from top_produce_etl_spark.operators.encoding import (
        repair_mojibake,
    )

    df = spark.createDataFrame(
        [(0, "cafÃ© naÃ¯ve")], "id int, text string"
    )
    once = repair_mojibake(df).select("id", "text")
    twice = repair_mojibake(once).collect()[0]
    assert twice["text"] == "café naïve"
    assert twice["was_mojibake"] is False
