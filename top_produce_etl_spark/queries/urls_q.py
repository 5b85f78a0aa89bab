"""URL curation queries (round 9 — operators/urls.py): parsing,
registered-domain extraction, canonical-URL normalization and dedup.
Every query is pure column expressions on both engines, so all three
are FULLY hash-checked — components, canonical strings, and counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from top_produce_etl_spark.io.sources import load_table
from top_produce_etl_spark.operators.psl import (
    registered_domain_psl_oracle_ctes,
    with_registered_domain_psl,
)
from top_produce_etl_spark.operators.urls import (
    normalize_urls,
    normalize_urls_oracle,
    parse_urls,
    parse_urls_oracle_cols,
    registered_domain_oracle,
    synthesize_urls,
    synthesize_urls_oracle,
    with_registered_domain,
)
from top_produce_etl_spark.queries import query


def _PARSE_ORACLE() -> str:
    cols = parse_urls_oracle_cols("url")
    dom = registered_domain_oracle(cols["host"])
    sel = ",\n           ".join(
        f"{expr} AS {name}" for name, expr in cols.items()
    )
    return f"""
    WITH urls AS ({synthesize_urls_oracle()})
    SELECT doc_id, url,
           {sel},
           {dom} AS domain
    FROM urls
    """


@query("url_parse_components", extended=True, oracle=_PARSE_ORACLE())
def url_parse_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL → scheme/host/port/path/query/fragment + registered
    domain (eTLD+1, multi-label suffixes honored) over a
    deterministic raw-URL fixture that exercises mixed scheme case,
    www prefixes, explicit default ports, shuffled parameter order,
    tracking noise, and fragments. One RE2-safe regex + array ops,
    scan-speed, zero shuffle; every derived string hash-checked."""
    docs = load_table(spark, sf_dir, "documents")
    urls = synthesize_urls(docs)
    return with_registered_domain(parse_urls(urls, "url"))


def _NORM_DEDUP_ORACLE() -> str:
    canon = normalize_urls_oracle("url")
    return f"""
    WITH urls AS ({synthesize_urls_oracle(effective_mod=100)}),
    canon AS (
        SELECT doc_id, url, {canon} AS canonical_url FROM urls
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
    FROM canon
    GROUP BY 1
    """


@query("url_normalize_dedup", extended=True, oracle=_NORM_DEDUP_ORACLE())
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup (round 9): raw URLs with planted duplicate
    classes (content parts keyed on doc_id % 100, cosmetic parts —
    scheme case, www, default ports, tracking params, parameter
    order, fragments, trailing slash — on the raw id) normalize to
    one canonical form per class; the dedup is a single hash-agg on
    the canonical string with min-id keeper election (the exact-dedup
    convention). n_raw_variants > 1 everywhere proves the
    normalizations each collapsed real string differences."""
    docs = load_table(spark, sf_dir, "documents")
    urls = synthesize_urls(docs, effective_mod=100)
    canon = normalize_urls(urls, "url")
    return canon.groupBy("canonical_url").agg(
        F.count("*").cast("bigint").alias("n_raw"),
        F.countDistinct("url").cast("bigint").alias("n_raw_variants"),
        F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
    )


def _DOMAIN_STATS_ORACLE() -> str:
    cols = parse_urls_oracle_cols("url")
    dom = registered_domain_oracle(cols["host"])
    return f"""
    WITH urls AS ({synthesize_urls_oracle()}),
    parsed AS (
        SELECT doc_id, {dom} AS domain, {cols["path"]} AS path
        FROM urls
    )
    SELECT domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM parsed
    GROUP BY 1
    """


@query("url_domain_stats", extended=True, oracle=_DOMAIN_STATS_ORACLE())
def url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain census — the grain per-domain caps and
    domain mixing operate on (operators/mixture.py composes with the
    ``domain`` column directly). Hash-agg on the derived domain;
    nothing wider than |domains| crosses the exchange."""
    docs = load_table(spark, sf_dir, "documents")
    parsed = with_registered_domain(
        parse_urls(synthesize_urls(docs), "url")
    )
    return parsed.groupBy("domain").agg(
        F.count("*").cast("bigint").alias("n_urls"),
        F.countDistinct("path").cast("bigint").alias("n_paths"),
        F.min("doc_id").cast("bigint").alias("first_doc_id"),
    )


# --- PSL registered domains (round 10 — operators/psl.py) ---

# Host fixture with suffix families the retired 10-entry literal
# could NOT resolve: private-section hosting domains (github.io,
# blogspot.com, s3.amazonaws.com), post-literal ccTLD second levels
# (com.mx, co.nz), a wildcard TLD (*.ck) and its exception (!www.ck),
# and the *.kawasaki.jp family. One third of hosts get an extra
# label so every family exercises both the at-suffix-depth and
# below-suffix-depth paths.
_PSL_FIXTURE_SUFFIXES = [
    "com", "github.io", "com.mx", "co.nz", "blogspot.com",
    "ck", "www.ck", "kawasaki.jp", "s3.amazonaws.com", "co.uk",
]


def _psl_fixture_hosts(docs: DataFrame) -> DataFrame:
    i = F.col("doc_id")
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in _PSL_FIXTURE_SUFFIXES]),
        (i % 10).cast("int") + 1,
    )
    host = F.concat(
        F.when(i % 3 == 0, F.lit("sub.")).otherwise(F.lit("")),
        F.lit("site"), (i % 23).cast("string"), F.lit("."), suffix,
    )
    return docs.select("doc_id", host.alias("host"))


def _PSL_DOMAIN_ORACLE() -> str:
    sufs = ", ".join(f"'{s}'" for s in _PSL_FIXTURE_SUFFIXES)
    return f"""
    WITH hosts AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 3 = 0 THEN 'sub.' ELSE '' END
                || 'site' || CAST(doc_id % 23 AS VARCHAR) || '.'
                || ([{sufs}])[CAST(doc_id % 10 AS INT) + 1]) AS host
        FROM documents
    ),
    {registered_domain_psl_oracle_ctes('hosts')}
    SELECT public_suffix, domain,
           CAST(COUNT(*) AS BIGINT) AS n_hosts,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_distinct_hosts,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM psl_resolved
    GROUP BY 1, 2
    """


@query("url_domain_psl_stats", extended=True, oracle=_PSL_DOMAIN_ORACLE())
def url_domain_psl_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain census under REAL public-suffix-list
    semantics (round 10, closing the r9 verdict gap: the 10-entry
    literal resolved foo.github.io to 'github.io' as if one site).
    The rule snapshot broadcast-joins against the host's last-k label
    strings — four BroadcastHashJoins, zero shuffles before the final
    census agg (plan-pinned in tests/test_psl.py); wildcard hosts at
    suffix depth surface as domain NULL (not registrable), exactly
    what a per-domain cap must NOT merge with real sites."""
    docs = load_table(spark, sf_dir, "documents")
    hosts = _psl_fixture_hosts(docs)
    resolved = with_registered_domain_psl(
        hosts, "host", "domain", suffix_out="public_suffix"
    )
    return resolved.groupBy("public_suffix", "domain").agg(
        F.count("*").cast("bigint").alias("n_hosts"),
        F.countDistinct("host").cast("bigint").alias("n_distinct_hosts"),
        F.min("doc_id").cast("bigint").alias("first_doc_id"),
    )


# --- Full-list PSL resolution (round 11 — vendored full
#     public_suffix_list.dat is now the DEFAULT rules source) ---

# Suffix families the r10 ~130-rule snapshot did NOT know (plus IDN
# in both spellings and a wildcard under a 3-label tail), exercised
# with case/trailing-dot host variants so the r11 normalization is
# oracle-locked too.
_FULL_PSL_SUFFIXES = [
    "co.ao", "pvt.k12.ma.us", "公司.cn", "xn--55qx5d.cn",
    "compute.amazonaws.com", "s3.dualstack.ap-south-1.amazonaws.com",
    "ac.gov.br", "in.net", "co.pl", "k12.or.us",
]


def _full_psl_fixture_hosts(docs: DataFrame) -> DataFrame:
    i = F.col("doc_id")
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in _FULL_PSL_SUFFIXES]),
        (i % 10).cast("int") + 1,
    )
    base = F.concat(
        F.when(i % 3 == 0, F.lit("sub.")).otherwise(F.lit("")),
        F.lit("site"), (i % 17).cast("string"), F.lit("."), suffix,
    )
    host = F.when(i % 4 == 0, F.upper(base)) \
        .when(i % 4 == 1, F.concat(base, F.lit("."))) \
        .otherwise(base)
    return docs.select("doc_id", host.alias("host"))


def _FULL_PSL_ORACLE() -> str:
    sufs = ", ".join(f"'{s}'" for s in _FULL_PSL_SUFFIXES)
    return f"""
    WITH raw_hosts AS (
        SELECT doc_id,
               (CASE WHEN doc_id % 3 = 0 THEN 'sub.' ELSE '' END
                || 'site' || CAST(doc_id % 17 AS VARCHAR) || '.'
                || ([{sufs}])[CAST(doc_id % 10 AS INT) + 1]) AS base
        FROM documents
    ),
    hosts AS (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 0 THEN upper(base)
                    WHEN doc_id % 4 = 1 THEN base || '.'
                    ELSE base END AS host
        FROM raw_hosts
    ),
    {registered_domain_psl_oracle_ctes('hosts')}
    SELECT public_suffix, domain,
           CAST(COUNT(*) AS BIGINT) AS n_hosts,
           CAST(COUNT(DISTINCT host) AS BIGINT) AS n_raw_spellings,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc_id
    FROM psl_resolved
    GROUP BY 1, 2
    """


@query("url_domain_full_psl", extended=True, oracle=_FULL_PSL_ORACLE())
def url_domain_full_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain census over suffix families ONLY the full
    vendored public suffix list resolves (round 11, closing the r10
    verdict gap #3): co.ao / pvt.k12.ma.us style deep ccTLD
    registries, an IDN suffix in unicode AND punycode spelling
    (punycode twin rows in the rule dimension), wildcard rules under
    multi-label tails, and private-section hosts — with
    mixed-case/trailing-dot host spellings proving the r11
    normalization (lowercase + trailing-dot strip) on both engines.
    Same plan shape as url_domain_psl_stats: one broadcast hash join
    per populated key depth, zero shuffles before the census agg."""
    docs = load_table(spark, sf_dir, "documents")
    hosts = _full_psl_fixture_hosts(docs)
    resolved = with_registered_domain_psl(
        hosts, "host", "domain", suffix_out="public_suffix"
    )
    return resolved.groupBy("public_suffix", "domain").agg(
        F.count("*").cast("bigint").alias("n_hosts"),
        F.countDistinct("host").cast("bigint").alias("n_raw_spellings"),
        F.min("doc_id").cast("bigint").alias("first_doc_id"),
    )


# --- robots.txt compliance gate (round 11 — operators/robots.py) ---

def _ROBOTS_ORACLE() -> str:
    from top_produce_etl_spark.operators.robots import (
        robots_oracle_ctes,
    )

    return f"""
    WITH {robots_oracle_ctes('documents')}
    SELECT doc_id, domain, path, allowed,
           CAST(matched_len AS INT) AS matched_len
    FROM robots_verdicts
    """


@query(
    "robots_compliance_gate", extended=True, oracle=_ROBOTS_ORACLE()
)
def robots_compliance_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt compliance (round 11 — the crawl-side legal gate):
    each domain's robots.txt is PARSED IN-ENGINE (windows over
    exploded lines: group reconstruction with stacked user-agent
    lines, RFC 9309 group shadowing AND merging, comment/junk/empty-
    value handling), REP patterns translate to regexes by a literal-
    replace chain both engines compute byte-identically (wildcards,
    trailing-$ anchors, metachar escaping), and every planted URL
    gets the longest-match-wins verdict with allow beating disallow
    on ties. Per-URL rows fully hash-checked against a DuckDB oracle
    that replays parse, translation and matching end to end.
    Semantics follow RFC 9309 (Google-parser behavior) where
    urllib.robotparser's legacy first-match/no-wildcard behavior
    diverges — see tests/test_robots.py."""
    from top_produce_etl_spark.operators.robots import (
        parse_robots,
        robots_allowed,
        synthesize_robots_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    robots, urls = synthesize_robots_corpus(docs)
    rules = parse_robots(robots, agent="trainingbot")
    out = robots_allowed(urls, rules)
    return out.select(
        "doc_id", "domain", "path", "allowed",
        F.col("matched_len").cast("int").alias("matched_len"),
    )
