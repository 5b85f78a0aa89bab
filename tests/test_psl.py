"""Public-suffix-list registered domains (round 10 —
operators/psl.py): rule expansion, PSL algorithm semantics
(wildcards, exceptions, fall-through), Spark/DuckDB parity, the
broadcast-only plan shape, and the full-list loader seam."""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from top_produce_etl_spark.operators.psl import (
    MAX_KEY_LABELS,
    PSL_SNAPSHOT_RULES,
    expand_rules,
    psl_rules_df,
    registered_domain_psl_oracle_ctes,
    with_registered_domain_psl,
)

# The structurally distinct host shapes, with expected
# (registered domain, public suffix) under the snapshot rules:
CASES = [
    ("example.com", "example.com", "com"),  # implicit * rule
    ("www.example.co.uk", "example.co.uk", "co.uk"),  # ccTLD 2nd lvl
    ("foo.github.io", "foo.github.io", "github.io"),  # private sect.
    ("deep.foo.github.io", "foo.github.io", "github.io"),
    ("example.com.mx", "example.com.mx", "com.mx"),
    ("shop.example.co.nz", "example.co.nz", "co.nz"),
    ("foo.ck", None, "foo.ck"),  # wildcard *.ck: foo.ck IS a suffix
    ("bar.foo.ck", "bar.foo.ck", "foo.ck"),
    ("www.ck", "www.ck", "ck"),  # exception !www.ck
    ("sub.www.ck", "www.ck", "ck"),
    # *.kawasaki.jp does NOT match the bare host kawasaki.jp —
    # falls through to the implicit last-label rule
    ("kawasaki.jp", "kawasaki.jp", "jp"),
    ("foo.kawasaki.jp", None, "foo.kawasaki.jp"),
    ("sub.foo.kawasaki.jp", "sub.foo.kawasaki.jp", "foo.kawasaki.jp"),
    ("city.kawasaki.jp", "city.kawasaki.jp", "kawasaki.jp"),  # !rule
    ("ward.city.kawasaki.jp", "city.kawasaki.jp", "kawasaki.jp"),
    ("bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com",
     "s3.amazonaws.com"),
    ("x.bucket.s3.amazonaws.com", "bucket.s3.amazonaws.com",
     "s3.amazonaws.com"),
    ("github.io", None, "github.io"),  # a suffix is not registrable
    ("com", None, "com"),
    ("localhost", None, "localhost"),
]


def test_expand_rules_families():
    """Default expansion is the FULL vendored list (r11); the
    structurally distinct families all resolve from it."""
    d = {k: (kl, ps) for k, kl, ps in expand_rules()}
    assert d["co.uk"] == (2, 2)  # normal
    assert d["ck"] == (1, 2)  # wildcard: parent key, +1 label suffix
    assert d["www.ck"] == (2, 1)  # exception: key-1 labels suffix
    assert d["kawasaki.jp"] == (2, 3)
    assert d["city.kawasaki.jp"] == (3, 2)
    assert d["github.io"] == (2, 2)
    assert d["s3.amazonaws.com"] == (3, 3)
    # full-list-only families (not in the r10 snapshot)
    assert d["co.ao"] == (2, 2)
    assert d["pvt.k12.ma.us"] == (4, 4)
    # IDN rules carry a punycode twin row (r11)
    assert d["\u516c\u53f8.cn"] == (2, 2)
    assert d["xn--55qx5d.cn"] == (2, 2)
    # keys are unique (join fan-out safety) and within probe depth
    keys = [k for k, _, _ in expand_rules()]
    assert len(keys) == len(set(keys))
    assert max(kl for _, kl, _ in expand_rules()) <= MAX_KEY_LABELS
    # single-label NORMAL rules are elided as the implicit default;
    # depth-1 keys that remain are all wildcard tails (ps > 1)
    assert all(ps > 1 for _, kl, ps in expand_rules() if kl == 1)


def _resolve_spark(spark, hosts):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "id int, host string"
    )
    out = with_registered_domain_psl(
        df, "host", "domain", suffix_out="public_suffix"
    )
    return {r["host"]: (r["domain"], r["public_suffix"])
            for r in out.collect()}


def test_psl_semantics(spark):
    got = _resolve_spark(spark, [h for h, _, _ in CASES])
    for host, dom, suf in CASES:
        assert got[host] == (dom, suf), (host, got[host], (dom, suf))


def test_psl_oracle_parity(spark):
    """The DuckDB CTE chain replays the Spark join byte for byte on
    every structurally distinct host shape."""
    hosts = [h for h, _, _ in CASES]
    got = _resolve_spark(spark, hosts)
    vals = ", ".join(f"({i}, '{h}')" for i, h in enumerate(hosts))
    sql = f"""WITH hosts(id, host) AS (VALUES {vals}),
    {registered_domain_psl_oracle_ctes('hosts')}
    SELECT host, domain, public_suffix FROM psl_resolved"""
    duck = {r[0]: (r[1], r[2])
            for r in duckdb.connect().execute(sql).fetchall()}
    assert got == duck


def test_psl_plan_broadcast_only(spark):
    """The rule dimension reaches the host scan as broadcast hash
    joins ONLY — no shuffle exchange, no explode, no sort: the plan
    that keeps registered-domain extraction scan-speed at 100 TB."""
    df = spark.range(1000).withColumn(
        "host", F.concat(F.lit("site"), F.col("id"), F.lit(".github.io"))
    )
    out = with_registered_domain_psl(df, "host")
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # formatted explain prints each node in the tree AND the detail
    # section — count the numbered detail lines. The rule dimension
    # is a JVM VALUES LocalRelation (r10 close: the python-RDD
    # variant spun up pyspark workers on every broadcast, 25 CPU-s
    # per query), so Catalyst PROVES depths with no rules empty and
    # folds those joins away entirely — one broadcast join per
    # populated key depth, nothing for the rest.
    depths = {kl for _, kl, _ in expand_rules()}
    got = len(re.findall(r"\(\d+\) BroadcastHashJoin", p))
    assert got == len(depths) <= MAX_KEY_LABELS, p
    assert "Generate" not in p, p  # no explode
    assert "pyspark.daemon" not in p and "ExistingRDD" not in p, p
    assert not re.search(r"\(\d+\) Exchange\b", p), p  # broadcasts only


def test_psl_loader_seam(spark, tmp_path):
    """psl_rules_df(path=...) parses a real public_suffix_list.dat
    shape (comments, blanks, wildcards, exceptions) — the production
    seam for the full downloaded list."""
    dat = tmp_path / "public_suffix_list.dat"
    dat.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "\n"
        "uk\n"
        "co.uk\n"
        "*.ck\n"
        "!www.ck\n"
        "// ===END ICANN DOMAINS===\n"
        "dev.example\n"
    )
    rules = psl_rules_df(spark, path=str(dat))
    rows = {r["match_key"]: (r["key_labels"], r["ps_labels"])
            for r in rules.collect()}
    assert rows["co.uk"] == (2, 2)
    assert rows["ck"] == (1, 2)
    assert rows["www.ck"] == (2, 1)
    assert rows["dev.example"] == (2, 2)
    got = _resolve_spark(spark, ["a.b.co.uk"])
    assert got["a.b.co.uk"] == ("b.co.uk", "co.uk")


def test_snapshot_covers_old_literal(spark):
    """Every multi-label suffix the retired 10-entry literal knew
    stays recognized — no regression for existing url queries."""
    from top_produce_etl_spark.operators.urls import MULTI_LABEL_SUFFIXES

    d = {k for k, _, _ in expand_rules(PSL_SNAPSHOT_RULES)}
    assert set(MULTI_LABEL_SUFFIXES) <= d
    assert len(PSL_SNAPSHOT_RULES) > 100


FULL_LIST_CASES = [
    # suffix families NOT in the r10 snapshot — the hosts the
    # 130-rule tier resolved by the implicit last-label fallback
    ("foo.co.ao", "foo.co.ao", "co.ao"),
    ("bar.pvt.k12.ma.us", "bar.pvt.k12.ma.us", "pvt.k12.ma.us"),
    ("pvt.k12.ma.us", None, "pvt.k12.ma.us"),
    # IDN suffix in BOTH spellings (punycode twin rows, r11)
    ("shop.example.公司.cn", "example.公司.cn", "公司.cn"),
    ("shop.example.xn--55qx5d.cn", "example.xn--55qx5d.cn",
     "xn--55qx5d.cn"),
    # wildcard below a 3-label tail (*.compute.amazonaws.com)
    ("a.b.compute.amazonaws.com", "a.b.compute.amazonaws.com",
     "b.compute.amazonaws.com"),
    ("b.compute.amazonaws.com", None, "b.compute.amazonaws.com"),
    # host normalization (r11): case-insensitive match, trailing dot
    ("Example.CO.UK", "example.co.uk", "co.uk"),
    ("example.co.uk.", "example.co.uk", "co.uk"),
]


def test_full_list_default_semantics(spark):
    got = _resolve_spark(spark, [h for h, _, _ in FULL_LIST_CASES])
    for host, dom, suf in FULL_LIST_CASES:
        assert got[host] == (dom, suf), (host, got[host], (dom, suf))


def test_full_list_oracle_parity(spark):
    """Full-list default + normalization: DuckDB CTE chain replays
    the Spark resolution on the families the snapshot lacked."""
    hosts = [h for h, _, _ in FULL_LIST_CASES]
    got = _resolve_spark(spark, hosts)
    vals = ", ".join(f"({i}, '{h}')" for i, h in enumerate(hosts))
    sql = f"""WITH hosts(id, host) AS (VALUES {vals}),
    {registered_domain_psl_oracle_ctes('hosts')}
    SELECT host, domain, public_suffix FROM psl_resolved"""
    duck = {r[0]: (r[1], r[2])
            for r in duckdb.connect().execute(sql).fetchall()}
    assert got == duck


def test_expand_rules_empty_raises():
    with pytest.raises(ValueError, match="no usable PSL rules"):
        expand_rules(["// comment only", ""])


def test_expand_rules_warns_on_dropped():
    """Over-deep or unsafe keys are dropped loudly (r11, ADVICE):
    silent drops made full-list deployments silently wrong."""
    with pytest.warns(UserWarning, match="dropped 2 rule"):
        rows = expand_rules(
            ["co.uk", "a.b.c.d.e.f", "bad'key.com"]
        )
    assert [k for k, _, _ in rows] == ["co.uk"]
