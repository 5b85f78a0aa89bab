"""HTML main-text extraction (round 11): the step a real crawl
pipeline runs FIRST — raw HTML → visible text — before any of the
text-quality/dedup/langid tiers downstream (CCNet, C4 and FineWeb
all begin here; public reimplementations: jusText, trafilatura,
resiliparse). This module implements the deterministic core of that
step as PURE COLUMN EXPRESSIONS:

1. drop the ``<head>`` region, ``<script>``/``<style>`` elements
   and HTML comments (their contents are never visible text);
2. turn block-level boundaries (``</p>``, ``</div>``, ``<br>``,
   headings, ``</li>``, ``</tr>``) into newlines so downstream
   LINE-level cleaners (textquality.clean_lines — the C4 rules) see
   real line structure;
3. strip every remaining tag;
4. decode the common character entities (``&amp; &lt; &gt; &quot;
   &#39; &nbsp;``);
5. normalize whitespace (collapse runs, trim line edges, drop blank
   lines).

Every pattern is RE2-safe AND java.util.regex-safe (non-greedy
ranges, ``(?s)``/``(?i)`` flags only — no backreferences, no
lookaround: the pii.py cross-engine convention), so the DuckDB twin
(:func:`extract_html_text_oracle`) replays the chain byte for byte
and extraction is fully hash-checkable. Heuristic BOILERPLATE
removal (nav/footer classification) is deliberately out of scope
here: that is the corpus-statistical job of
``textquality.strip_boilerplate`` / Gopher shape rules, which
compose downstream of this operator.

Scale shape: a fixed chain of ``regexp_replace`` projections —
zero shuffle, zero Python, whole-stage codegen; at 100 TB the
extraction runs at scan speed like the rest of the text tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement) chain — ORDER MATTERS and is shared with
# the DuckDB twin: containers first (their text must vanish), then
# block boundaries, then the generic tag strip, then entities, then
# whitespace. Patterns are RE2- and java.util.regex-compatible.
_STEPS: tuple[tuple[str, str], ...] = (
    (r"(?is)<head>.*?</head>", " "),
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?i)</(p|div|li|tr|h1|h2|h3|h4|h5|h6|blockquote)>", "\n"),
    (r"(?i)<(br|hr)[^>]*>", "\n"),
    (r"<[^>]*>", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),  # LAST: "&amp;lt;" decodes to "&lt;", not "<"
    (r"[ \t\r]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{2,}", "\n"),
    (r"^\s+|\s+$", ""),
)


def html_to_text(col: Column) -> Column:
    """The extraction chain as one column expression."""
    out = col
    for pat, rep in _STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def extract_html_text(
    df: DataFrame, html_col: str = "html", out: str = "text"
) -> DataFrame:
    """Attach the extracted visible text of ``html_col`` as
    ``out`` (see module docstring for exactly what is removed,
    decoded and normalized)."""
    return df.withColumn(out, html_to_text(F.col(html_col)))


def extract_html_text_oracle(html_sql: str) -> str:
    """DuckDB expression replaying :func:`html_to_text` byte for
    byte over the SQL fragment ``html_sql`` (DuckDB's regexp_replace
    needs the global 'g' flag to match Spark's replace-all; inline
    flags move to the flag argument)."""
    out = html_sql
    for pat, rep in _STEPS:
        flags = "g"
        p = pat
        for inline, f in (("(?is)", "is"), ("(?s)", "s"), ("(?i)", "i")):
            if p.startswith(inline):
                p = p[len(inline):]
                flags += f
        # DuckDB standard string literals do no backslash
        # processing: '\t' reaches RE2 as backslash-t, which RE2
        # itself decodes — pass the pattern through unchanged
        # (quotes doubled only)
        p_sql = p.replace("'", "''")
        r_sql = rep.replace("'", "''").replace(
            "\n", "' || chr(10) || '"
        )
        out = (
            f"regexp_replace({out}, '{p_sql}', '{r_sql}', '{flags}')"
        )
    return out


def synthesize_html_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic raw-HTML fixture around the corpus text: head
    with title/style/script junk, a nav div, the document text in a
    ``<p>`` with entity-encoded punctuation appended, and a footer —
    every byte derivable in SQL (:func:`synthesize_html_docs_
    oracle`), so extraction is provable, not eyeballed."""
    i = F.col(id_col)
    html = F.concat(
        F.lit(
            "<!DOCTYPE html><html><head><title>Doc "
        ),
        i.cast("string"),
        F.lit(
            "</title><style>body{color:#000}</style>"
            "<script>var x=1;</script></head><body>"
            "<!-- generated -->"
            "<div class=\"nav\">Home | Section "
        ),
        (i % 7).cast("string"),
        F.lit("</div><h1>Title "),
        i.cast("string"),
        F.lit("</h1><p>"),
        F.col(text_col),
        F.lit(
            " &amp; more &lt;data&gt; &#39;quoted&#39;&nbsp;here"
            "</p><div>footer</div></body></html>"
        ),
    )
    return docs.select(F.col(id_col), html.alias("html"))


def synthesize_html_docs_oracle(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SELECT re-deriving the fixture byte for byte."""
    return f"""
    SELECT {id_col},
           '<!DOCTYPE html><html><head><title>Doc '
           || CAST({id_col} AS VARCHAR)
           || '</title><style>body{{color:#000}}</style>'
           || '<script>var x=1;</script></head><body>'
           || '<!-- generated -->'
           || '<div class="nav">Home | Section '
           || CAST({id_col} % 7 AS VARCHAR)
           || '</div><h1>Title ' || CAST({id_col} AS VARCHAR)
           || '</h1><p>' || {text_col}
           || ' &amp; more &lt;data&gt; &#39;quoted&#39;&nbsp;here'
           || '</p><div>footer</div></body></html>' AS html
    FROM {table}
    """
