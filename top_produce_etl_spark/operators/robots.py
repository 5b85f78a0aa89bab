"""robots.txt compliance (round 11): the crawl-side LEGAL gate every
responsible training-data pipeline runs — parse each domain's
robots.txt (RFC 9309, the Robots Exclusion Protocol) and decide
per-URL fetchability for a configured user agent. Public spec;
public reimplementations: Google's robotstxt C++ parser, Python's
urllib.robotparser (both consulted for SEMANTICS only).

Everything is in-engine and expression-only:

- **Parsing** is windows + regexp projections over exploded lines:
  comment/CR strip, case-insensitive ``directive: value`` split,
  user-agent GROUP reconstruction (consecutive ``User-agent`` lines
  open one group; its rules follow until the next group — the
  block_id is a running sum of group starts), unknown directives
  (``Crawl-delay``, ``Sitemap``) ignored, empty-value Allow/Disallow
  dropped (an empty ``Disallow:`` means "no restriction" per spec).
- **Group selection** per RFC 9309 §2.2.1: if any group names the
  configured agent (case-insensitive product token), ONLY those
  groups apply; otherwise the ``*`` groups.
- **Rule matching** per §2.2.2: patterns are path prefixes with
  ``*`` wildcards and an optional trailing ``$`` anchor. Each
  pattern translates to a regex by a chain of LITERAL ``replace``
  calls (escape metachars, then ``*`` → ``.*`` — no capture groups,
  so Spark and DuckDB compute byte-identical regexes) evaluated as
  a DATA-driven pattern (``rlike`` with a column pattern). The
  verdict is longest-match-wins with allow beating disallow on ties
  (``max`` over (pattern length, is_allow) structs); no match →
  allowed.

Scale shape: robots files are a per-domain DIMENSION (thousands of
rules, not billions) — parsing is one explode + two windows over
that dimension; URL gating is one broadcast join + one per-URL
aggregate. Zero Python, zero shuffle on the URL side beyond the
gating aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# regex metacharacters escaped in robots patterns — backslash FIRST
# (later escapes insert backslashes that must not re-escape), '*'
# deliberately absent (it is the REP wildcard), '$' included (only
# a TRAILING '$' is the anchor; mid-pattern '$' is literal).
_META = ("\\", ".", "+", "?", "(", ")", "[", "]", "{", "}", "|", "^", "$")


def _regex_of_pattern(pat: Column) -> Column:
    """REP pattern → anchored regex, by literal replaces only (the
    input column must be named ``__pat`` — parse_robots arranges
    that; the DuckDB twin is literally parallel)."""
    core = F.when(
        F.substring(pat, -1, 1) == "$", F.expr("left(__pat, length(__pat) - 1)")
    ).otherwise(pat)
    esc = core
    for ch in _META:
        lit = ch
        esc = F.replace(esc, F.lit(lit), F.lit("\\" + lit))
    esc = F.replace(esc, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"),
        esc,
        F.when(F.substring(pat, -1, 1) == "$", F.lit("$")).otherwise(
            F.lit("")
        ),
    )


def parse_robots(
    robots: DataFrame,
    id_col: str = "domain",
    text_col: str = "robots_txt",
    agent: str = "trainingbot",
) -> DataFrame:
    """Effective Allow/Disallow rules of ``robots[text_col]`` for
    ``agent``: ``(id_col, rule_type, pattern, match_len, regex)``.
    See the module docstring for the exact RFC 9309 semantics."""
    from pyspark.sql import Window

    agent = agent.lower()
    lines = F.split(F.col(text_col), "\n", -1)
    rows = robots.select(
        F.col(id_col),
        F.posexplode(lines).alias("__ln", "__raw"),
    )
    content = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("__raw"), "\r", ""), "#.*", ""
        )
    )
    rows = rows.select(
        id_col, "__ln", content.alias("__content")
    )
    directive = F.lower(
        F.regexp_extract(F.col("__content"), r"^([A-Za-z-]+)\s*:", 1)
    )
    value = F.trim(
        F.regexp_replace(F.col("__content"), r"^[A-Za-z-]+\s*:\s*", "")
    )
    rows = rows.select(
        id_col,
        "__ln",
        directive.alias("__d"),
        value.alias("__v"),
    )
    is_ua = F.col("__d") == "user-agent"
    is_rule = F.col("__d").isin("allow", "disallow") & (
        F.col("__v") != ""
    )
    w = Window.partitionBy(id_col).orderBy("__ln")
    prev_ua = F.lag(is_ua, 1, False).over(w)
    block_start = is_ua & ~prev_ua
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    rows = rows.withColumn(
        "__block", F.sum(block_start.cast("int")).over(wsum)
    ).withColumn("__is_ua", is_ua).withColumn("__is_rule", is_rule)
    agents = rows.where(F.col("__is_ua")).select(
        id_col,
        "__block",
        F.lower(F.col("__v")).alias("__agent"),
    )
    # group selection: specific groups win when any exists (RFC
    # 9309 §2.2.1); per-domain flag via one aggregate over the
    # dimension-sized agents relation
    spec = agents.groupBy(id_col).agg(
        F.max((F.col("__agent") == agent).cast("int")).alias("__has")
    )
    chosen = (
        agents.join(spec, id_col)
        .where(
            (F.col("__agent") == agent)
            | ((F.col("__has") == 0) & (F.col("__agent") == "*"))
        )
        .select(id_col, "__block")
        .distinct()
    )
    rules = rows.where(F.col("__is_rule") & (F.col("__block") >= 1))
    out = rules.join(chosen, [id_col, "__block"], "left_semi").select(
        id_col,
        F.col("__d").alias("rule_type"),
        F.col("__v").alias("pattern"),
        F.length("__v").cast("int").alias("match_len"),
    )
    out = out.withColumn("__pat", F.col("pattern")).withColumn(
        "regex", _regex_of_pattern(F.col("__pat"))
    ).drop("__pat")
    return out


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_id_col: str = "doc_id",
    domain_col: str = "domain",
    path_col: str = "path",
) -> DataFrame:
    """Per-URL fetch verdict against parsed rules: longest-match
    wins, allow beats disallow on ties, no match → allowed. One
    broadcast join of the rule dimension + one per-URL aggregate;
    emits every urls column plus ``allowed`` and the deciding
    ``matched_len`` (NULL when no rule matched)."""
    # Simple-prefix fast path (the 100 TB consideration): a pattern
    # with no wildcard and no trailing anchor matches iff the path
    # STARTS WITH it — a cheap codegen'd string compare. Only the
    # rare wildcard/anchored rules pay the data-driven-regex
    # evaluation (a per-row Pattern.compile in the JVM, fine for a
    # handful of rules, wrong as the default).
    simple = ~F.col("pattern").contains("*") & (
        F.substring(F.col("pattern"), -1, 1) != "$"
    )
    r = rules.select(
        F.col(domain_col).alias("__rd"),
        F.col("rule_type").alias("__rt"),
        F.col("match_len").alias("__ml"),
        F.col("regex").alias("__rx"),
        F.col("pattern").alias("__rp"),
        simple.alias("__simple"),
    )
    j = urls.join(
        F.broadcast(r),
        (urls[domain_col] == F.col("__rd"))
        & F.when(
            F.col("__simple"),
            F.col(path_col).startswith(F.col("__rp")),
        ).otherwise(F.expr(f"{path_col} rlike __rx")),
        "left",
    )
    best = F.max(
        F.when(
            F.col("__rx").isNotNull(),
            F.struct(
                F.col("__ml").alias("l"),
                (F.col("__rt") == "allow").alias("a"),
            ),
        )
    )
    out = j.groupBy(*[urls[c] for c in urls.columns]).agg(
        best.alias("__best")
    )
    return out.select(
        *[F.col(c) for c in urls.columns],
        F.coalesce(F.col("__best.a"), F.lit(True)).alias("allowed"),
        F.col("__best.l").alias("matched_len"),
    )


# Planted URL paths covering every rule family (index = doc_id % 12)
ROBOTS_FIXTURE_PATHS: tuple[str, ...] = (
    "/", "/private/x", "/private/pub/ok", "/tmp1.log", "/tmp.txt",
    "/exact", "/exact2", "/no-ai/page", "/shared/a", "/public/a",
    "/private/pubx", "/xtmp2.log",
)


def synthesize_robots_corpus(
    docs: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic (robots, urls) fixture pair: 10 domains whose
    robots.txt texts exercise every parser path — the ``*`` group
    with wildcard/anchored/override rules, ignored directives and
    comments, a trainingbot-specific group on even domains (RFC
    group shadowing), a STACKED two-agent group on d%3==0 domains
    (groups MERGE when both match), junk lines and empty-value
    rules on d%5==1 — and one planted URL per document over
    ROBOTS_FIXTURE_PATHS. Every byte derivable in SQL
    (:func:`robots_oracle_ctes`)."""
    i = F.col(id_col)
    d = F.col("__d")
    base = F.concat(
        F.lit("# robots for site"), d.cast("string"), F.lit("\n"),
        F.lit(
            "User-agent: *\n"
            "Disallow: /private/\n"
            "Allow: /private/pub\n"
            "Disallow: /tmp*.log\n"
            "Disallow: /exact$\n"
            "Crawl-delay: 5\n"
        ),
        F.when(
            d % 2 == 0,
            F.lit(
                "\nUser-agent: trainingbot\n"
                "Disallow: /no-ai/\n"
                "Allow: /\n"
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.lit(
                "\nUser-agent: otherbot\n"
                "User-agent: trainingbot\n"
                "Disallow: /shared/\n"
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 1,
            F.lit("\nbadline without colon\nDisallow:\n"),
        ).otherwise(F.lit("")),
    )
    robots = (
        docs.select((i % 10).cast("int").alias("__d"))
        .distinct()
        .select(
            F.concat(
                F.lit("site"), d.cast("string"), F.lit(".com")
            ).alias("domain"),
            base.alias("robots_txt"),
        )
    )
    urls = docs.select(
        F.col(id_col),
        F.concat(
            F.lit("site"), (i % 10).cast("string"), F.lit(".com")
        ).alias("domain"),
        F.element_at(
            F.array(*[F.lit(p) for p in ROBOTS_FIXTURE_PATHS]),
            (i % 12).cast("int") + 1,
        ).alias("path"),
    )
    return robots, urls


def _regex_sql(pat_sql: str) -> str:
    """DuckDB twin of :func:`_regex_of_pattern` over the SQL
    fragment ``pat_sql`` — the same literal-replace chain."""
    core = (
        f"CASE WHEN right({pat_sql}, 1) = '$' "
        f"THEN left({pat_sql}, length({pat_sql}) - 1) "
        f"ELSE {pat_sql} END"
    )
    esc = core
    for ch in _META:
        lit = ch.replace("'", "''")
        esc = f"replace({esc}, '{lit}', '\\{lit}')"
    esc = f"replace({esc}, '*', '.*')"
    return (
        f"'^' || {esc} || CASE WHEN right({pat_sql}, 1) = '$' "
        f"THEN '$' ELSE '' END"
    )


def robots_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    agent: str = "trainingbot",
) -> str:
    """DuckDB CTE chain replaying fixture synthesis, the RFC 9309
    parse (groups, shadowing, merging), the regex translation and
    the longest-match verdict byte for byte. Ends in
    ``robots_verdicts`` (doc_id, domain, path, allowed,
    matched_len)."""
    agent = agent.lower().replace("'", "''")
    paths = ", ".join(f"'{p}'" for p in ROBOTS_FIXTURE_PATHS)
    nl = "chr(10)"
    return f"""
rb_domains AS (
    SELECT DISTINCT CAST({id_col} % 10 AS INT) AS d FROM {table}
),
rb_files AS (
    SELECT 'site' || CAST(d AS VARCHAR) || '.com' AS domain,
           '# robots for site' || CAST(d AS VARCHAR) || {nl}
           || 'User-agent: *' || {nl}
           || 'Disallow: /private/' || {nl}
           || 'Allow: /private/pub' || {nl}
           || 'Disallow: /tmp*.log' || {nl}
           || 'Disallow: /exact$' || {nl}
           || 'Crawl-delay: 5' || {nl}
           || CASE WHEN d % 2 = 0 THEN
                {nl} || 'User-agent: trainingbot' || {nl}
                || 'Disallow: /no-ai/' || {nl} || 'Allow: /' || {nl}
              ELSE '' END
           || CASE WHEN d % 3 = 0 THEN
                {nl} || 'User-agent: otherbot' || {nl}
                || 'User-agent: trainingbot' || {nl}
                || 'Disallow: /shared/' || {nl}
              ELSE '' END
           || CASE WHEN d % 5 = 1 THEN
                {nl} || 'badline without colon' || {nl}
                || 'Disallow:' || {nl}
              ELSE '' END AS robots_txt
    FROM rb_domains
),
rb_lines AS (
    SELECT domain, ln,
           trim(regexp_replace(regexp_replace(
               string_split(robots_txt, {nl})[ln],
               chr(13), ''), '#.*', '')) AS content
    FROM rb_files,
         UNNEST(range(1, len(string_split(robots_txt, {nl})) + 1))
             u(ln)
),
rb_parsed AS (
    SELECT domain, ln,
           lower(regexp_extract(content, '^([A-Za-z-]+)\\s*:', 1))
               AS d,
           trim(regexp_replace(content, '^[A-Za-z-]+\\s*:\\s*', ''))
               AS v
    FROM rb_lines
),
rb_prev AS (
    SELECT *,
           COALESCE(LAG(d = 'user-agent') OVER (
               PARTITION BY domain ORDER BY ln), FALSE) AS prev_ua
    FROM rb_parsed
),
rb_blocks AS (
    SELECT *,
           SUM(CASE WHEN d = 'user-agent' AND NOT prev_ua
                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY domain ORDER BY ln
               ROWS UNBOUNDED PRECEDING) AS block
    FROM rb_prev
),
rb_agents AS (
    SELECT domain, block, lower(v) AS agent
    FROM rb_blocks WHERE d = 'user-agent'
),
rb_spec AS (
    SELECT domain,
           MAX(CASE WHEN agent = '{agent}' THEN 1 ELSE 0 END)
               AS has_spec
    FROM rb_agents GROUP BY 1
),
rb_chosen AS (
    SELECT DISTINCT a.domain, a.block
    FROM rb_agents a JOIN rb_spec s USING (domain)
    WHERE a.agent = '{agent}'
       OR (s.has_spec = 0 AND a.agent = '*')
),
rb_rules AS (
    SELECT b.domain, b.d AS rule_type, b.v AS pattern,
           CAST(length(b.v) AS INT) AS match_len,
           {_regex_sql('b.v')} AS regex
    FROM rb_blocks b
    JOIN rb_chosen c ON b.domain = c.domain AND b.block = c.block
    WHERE b.d IN ('allow', 'disallow') AND b.v <> ''
      AND b.block >= 1
),
rb_urls AS (
    SELECT {id_col},
           'site' || CAST({id_col} % 10 AS VARCHAR) || '.com'
               AS domain,
           ([{paths}])[CAST({id_col} % 12 AS INT) + 1] AS path
    FROM {table}
),
robots_verdicts AS (
    SELECT u.{id_col}, u.domain, u.path,
           COALESCE(MAX(CASE WHEN r.regex IS NOT NULL THEN
               struct_pack(l := r.match_len,
                           a := r.rule_type = 'allow') END).a,
               TRUE) AS allowed,
           MAX(CASE WHEN r.regex IS NOT NULL THEN
               struct_pack(l := r.match_len,
                           a := r.rule_type = 'allow') END).l
               AS matched_len
    FROM rb_urls u
    LEFT JOIN rb_rules r
      ON u.domain = r.domain AND regexp_matches(u.path, r.regex)
    GROUP BY 1, 2, 3
)"""
