"""URL parsing, normalization, and domain curation (round 9).

Web-corpus curation starts at the URL, before a byte of content is
read: canonicalize the raw URL (case, default ports, fragments,
tracking parameters, parameter order), dedup on the canonical form,
extract the registered domain (eTLD+1) for per-domain caps and
mixing, and screen against path/host rules. The reference has no
URL layer (its transform core is empty — ``src/transform/
top3_logic.py``); this family is part of the §2.12
beyond-reference training-pipeline surface.

Design for 100 TB:
- Everything here is PURE column expressions — regexp extraction,
  higher-order array functions, string ops. No UDF, no shuffle:
  parse + normalize run at scan speed and the canonical-url dedup
  is one ordinary hash-agg on the canonical string.
- Patterns are RE2-safe (no backreferences/lookaround — the
  operators/pii.py convention) so the DuckDB oracle runs the SAME
  regexes and every derived column is hash-checkable cross-engine.
- The public-suffix handling is a deliberately SMALL literal list of
  multi-label suffixes (the curation-relevant ones); a production
  deployment would broadcast-join the full PSL table — same plan
  shape, bigger literal. Documented, not hidden.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Multi-label public suffixes recognized by registered_domain().
# Kept tiny on purpose (see module docstring); a full deployment
# swaps in the PSL as a broadcast dimension with the same semantics.
MULTI_LABEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "com.br", "com.cn", "co.in",
)

# Tracking parameters stripped by normalize_urls — the standard
# analytics noise that fragments otherwise-identical URLs.
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid", "gclid", "mc_eid", "ref")

_URL_RE = (
    r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"  # 1 scheme
    r"([^/?#:]*)"                      # 2 host
    r"(?::([0-9]+))?"                  # 3 port
    r"([^?#]*)"                        # 4 path
    r"(?:\?([^#]*))?"                  # 5 query
    r"(?:#(.*))?$"                     # 6 fragment
)


def parse_urls(df: DataFrame, url_col: str) -> DataFrame:
    """Split a URL column into scheme/host/port/path/query/fragment
    columns — one RE2-safe regex, evaluated JVM-side (and verbatim in
    the DuckDB oracle). Unparseable rows yield empty strings (the
    pattern's groups are all optional beyond ``scheme://host``), so a
    quarantine filter downstream is ``scheme = ''``."""
    u = F.col(url_col)
    return (
        df.withColumn("scheme", F.lower(F.regexp_extract(u, _URL_RE, 1)))
        .withColumn("host", F.lower(F.regexp_extract(u, _URL_RE, 2)))
        .withColumn("port", F.regexp_extract(u, _URL_RE, 3))
        .withColumn("path", F.regexp_extract(u, _URL_RE, 4))
        .withColumn("query", F.regexp_extract(u, _URL_RE, 5))
        .withColumn("fragment", F.regexp_extract(u, _URL_RE, 6))
    )


def parse_urls_oracle_cols(url_sql: str) -> dict[str, str]:
    """DuckDB column expressions mirroring :func:`parse_urls` —
    the same regex, ``regexp_extract(url, re, group)``."""
    re = _URL_RE.replace("'", "''")
    return {
        "scheme": f"lower(regexp_extract({url_sql}, '{re}', 1))",
        "host": f"lower(regexp_extract({url_sql}, '{re}', 2))",
        "port": f"regexp_extract({url_sql}, '{re}', 3)",
        "path": f"regexp_extract({url_sql}, '{re}', 4)",
        "query": f"regexp_extract({url_sql}, '{re}', 5)",
        "fragment": f"regexp_extract({url_sql}, '{re}', 6)",
    }


def _registered_domain_expr(host: Column) -> Column:
    """eTLD+1: last two host labels, or last three when the last two
    form a known multi-label suffix (MULTI_LABEL_SUFFIXES)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(
        ".", F.element_at(parts, -2), F.element_at(parts, -1)
    )
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_multi = last2.isin(*MULTI_LABEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def with_registered_domain(
    df: DataFrame, host_col: str = "host", out: str = "domain"
) -> DataFrame:
    """Attach the registered domain (eTLD+1) of ``host_col`` — the
    curation grain for per-domain caps (operators/mixture.py::
    cap_per_category), domain mixing, and blocklists."""
    return df.withColumn(out, _registered_domain_expr(F.col(host_col)))


def registered_domain_oracle(host_sql: str) -> str:
    """DuckDB twin of the eTLD+1 expression."""
    suffixes = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    parts = f"string_split({host_sql}, '.')"
    last2 = f"(list_element({parts}, -2) || '.' || list_element({parts}, -1))"
    last3 = (
        f"(list_element({parts}, -3) || '.' || "
        f"list_element({parts}, -2) || '.' || list_element({parts}, -1))"
    )
    return f"""CASE
        WHEN len({parts}) <= 2 THEN {host_sql}
        WHEN {last2} IN ({suffixes}) AND len({parts}) >= 3 THEN {last3}
        ELSE {last2} END"""


def normalize_urls(
    df: DataFrame, url_col: str, out: str = "canonical_url"
) -> DataFrame:
    """Canonicalize a URL column — the dedup key of web curation.

    Normalizations applied (each one collapses a class of
    cosmetically-distinct duplicates a crawler actually produces):
    - scheme and host lowercased; a leading ``www.`` label dropped
    - default ports stripped (``:80`` for http, ``:443`` for https)
    - fragment dropped (never sent to the server)
    - tracking parameters dropped (TRACKING_PARAM_PREFIXES)
    - remaining query parameters SORTED lexicographically (parameter
      order is not semantic)
    - trailing ``/`` on a non-root path dropped

    Pure expressions end to end: split/filter/array_sort/concat are
    higher-order array functions on the already-extracted query
    string — scan-speed, zero shuffle, and the DuckDB oracle
    (:func:`normalize_urls_oracle`) replays them verbatim."""
    parsed = parse_urls(df, url_col)
    host = F.regexp_replace(F.col("host"), r"^www\.", "")
    is_default_port = (
        ((F.col("scheme") == "http") & (F.col("port") == "80"))
        | ((F.col("scheme") == "https") & (F.col("port") == "443"))
        | (F.col("port") == "")
    )
    port = F.when(is_default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), F.col("port"))
    )
    kept = F.array_sort(
        F.filter(
            F.split(F.col("query"), "&"),
            lambda p: (p != "") & ~_is_tracking_param(p),
        )
    )
    query = F.array_join(kept, "&")
    path = F.when(
        (F.length("path") > 1) & F.col("path").endswith("/"),
        F.expr("substring(path, 1, length(path) - 1)"),
    ).otherwise(F.col("path"))
    path = F.when(path == "", F.lit("/")).otherwise(path)
    canon = F.concat(
        F.col("scheme"),
        F.lit("://"),
        host,
        port,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )
    return parsed.withColumn(out, canon)


def _is_tracking_param(p: Column) -> Column:
    cond = F.lit(False)
    for pref in TRACKING_PARAM_PREFIXES:
        if pref.endswith("_"):
            cond = cond | p.startswith(pref)
        else:
            cond = cond | (p == pref) | p.startswith(pref + "=")
    return cond


def normalize_urls_oracle(url_sql: str) -> str:
    """DuckDB expression computing the SAME canonical URL."""
    cols = parse_urls_oracle_cols(url_sql)
    scheme, host0, port0 = cols["scheme"], cols["host"], cols["port"]
    path0, query0 = cols["path"], cols["query"]
    host = f"regexp_replace({host0}, '^www\\.', '')"
    port = f"""CASE
        WHEN ({scheme} = 'http' AND {port0} = '80')
          OR ({scheme} = 'https' AND {port0} = '443')
          OR {port0} = '' THEN ''
        ELSE ':' || {port0} END"""
    # starts_with, not LIKE: '_' is a single-char LIKE wildcard, so
    # "p LIKE 'utm_%'" would also strip 'utmz=1' etc. while the Spark
    # side (startswith) keeps it (round-10 ADVICE fix).
    track = " OR ".join(
        f"starts_with(p, '{pref}')" if pref.endswith("_")
        else f"(p = '{pref}' OR starts_with(p, '{pref}='))"
        for pref in TRACKING_PARAM_PREFIXES
    )
    kept = (
        f"list_sort(list_filter(string_split({query0}, '&'), "
        f"p -> p <> '' AND NOT ({track})))"
    )
    query = f"list_aggregate({kept}, 'string_agg', '&')"
    path = f"""CASE
        WHEN length({path0}) > 1 AND {path0} LIKE '%/'
            THEN substring({path0}, 1, length({path0}) - 1)
        WHEN {path0} = '' THEN '/'
        ELSE {path0} END"""
    return f"""({scheme} || '://' || {host} || {port} || {path} ||
        CASE WHEN coalesce({query}, '') <> ''
             THEN '?' || {query} ELSE '' END)"""


def synthesize_urls(
    df: DataFrame,
    id_col: str = "doc_id",
    effective_mod: int | None = None,
) -> DataFrame:
    """Deterministic URL fixture over the documents table — pure
    expressions, so DuckDB re-derives the raw strings exactly
    (:func:`synthesize_urls_oracle`). ``effective_mod`` plants
    duplicate classes the way synthesize_images does: the CONTENT
    parts (host base, path) derive from ``id % effective_mod`` while
    the cosmetic parts (scheme case, www, default port, tracking
    params, param order, fragment, trailing slash) keep the real id —
    every class's raw URLs differ as strings but normalize to ONE
    canonical form, the planted ground truth for url dedup."""
    i = F.col(id_col)
    eid = (i % effective_mod) if effective_mod else i
    # SEMANTIC parts — all keyed on eid (the class identity):
    proto = F.when(eid % 2 == 0, F.lit("https")).otherwise(F.lit("http"))
    tld = F.when(eid % 3 == 0, F.lit("com")).when(
        eid % 3 == 1, F.lit("org")
    ).otherwise(F.lit("co.uk"))
    hostbase = F.concat(
        F.lit("site-"), (eid % 13).cast("string"), F.lit("."), tld
    )
    path_core = F.concat(
        F.lit("/cat-"), (eid % 5).cast("string"),
        F.lit("/item-"), eid.cast("string"),
    )
    p_id = F.concat(F.lit("id="), (eid % 100).cast("string"))
    p_lang = F.lit("lang=en")
    # COSMETIC parts — keyed on the raw id, erased by normalization:
    scheme = F.when(i % 4 == 0, F.upper(proto)).otherwise(proto)
    www = F.when(i % 5 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    host = F.when(i % 7 == 0, F.upper(hostbase)).otherwise(hostbase)
    port = F.when(
        (i % 6 == 0) & (proto == "https"), F.lit(":443")
    ).when((i % 6 == 3) & (proto == "http"), F.lit(":80")).otherwise(
        F.lit("")
    )
    slash = F.when(i % 2 == 0, F.lit("/")).otherwise(F.lit(""))
    noise = F.when(
        i % 3 == 0, F.concat(F.lit("&utm_source=s"), (i % 9).cast("string"))
    ).when(i % 3 == 1, F.lit("&ref=feed")).otherwise(F.lit(""))
    params = F.when(
        i % 2 == 0, F.concat(p_id, F.lit("&"), p_lang, noise)
    ).otherwise(F.concat(p_lang, F.lit("&"), p_id, noise))
    frag = F.when(i % 6 == 2, F.lit("#section-3")).otherwise(F.lit(""))
    raw = F.concat(scheme, F.lit("://"), www, host, port,
                   path_core, slash, F.lit("?"), params, frag)
    return df.select(i.alias("doc_id"), raw.alias("url"))


def synthesize_urls_oracle(effective_mod: int | None = None) -> str:
    """DuckDB SELECT producing the identical (doc_id, url) fixture."""
    eid = f"(doc_id % {effective_mod})" if effective_mod else "doc_id"
    return f"""
    SELECT doc_id,
        (CASE WHEN doc_id % 4 = 0
              THEN upper(CASE WHEN {eid} % 2 = 0
                              THEN 'https' ELSE 'http' END)
              ELSE CASE WHEN {eid} % 2 = 0
                        THEN 'https' ELSE 'http' END END
         || '://'
         || (CASE WHEN doc_id % 5 = 0 THEN 'WWW.' ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0
             THEN upper('site-' || CAST({eid} % 13 AS VARCHAR) || '.'
                  || (CASE {eid} % 3 WHEN 0 THEN 'com'
                      WHEN 1 THEN 'org' ELSE 'co.uk' END))
             ELSE 'site-' || CAST({eid} % 13 AS VARCHAR) || '.'
                  || (CASE {eid} % 3 WHEN 0 THEN 'com'
                      WHEN 1 THEN 'org' ELSE 'co.uk' END) END)
         || (CASE WHEN doc_id % 6 = 0 AND {eid} % 2 = 0 THEN ':443'
                  WHEN doc_id % 6 = 3 AND {eid} % 2 = 1 THEN ':80'
                  ELSE '' END)
         || '/cat-' || CAST({eid} % 5 AS VARCHAR)
         || '/item-' || CAST({eid} AS VARCHAR)
         || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
         || '?'
         || (CASE WHEN doc_id % 2 = 0
             THEN 'id=' || CAST({eid} % 100 AS VARCHAR) || '&lang=en'
             ELSE 'lang=en&id=' || CAST({eid} % 100 AS VARCHAR) END)
         || (CASE doc_id % 3
             WHEN 0 THEN '&utm_source=s' || CAST(doc_id % 9 AS VARCHAR)
             WHEN 1 THEN '&ref=feed' ELSE '' END)
         || (CASE WHEN doc_id % 6 = 2 THEN '#section-3' ELSE '' END)
        ) AS url
    FROM documents
    """
