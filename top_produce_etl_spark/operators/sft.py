"""SFT / code training-data layout operators (round 11): the last
mile between curated documents and model-ready training text.

- :func:`chat_render` — multi-turn conversations (long format: one
  row per turn) → one rendered training string per conversation in
  a ChatML-style template (public format:
  ``<|im_start|>role\\ncontent<|im_end|>\\n`` per turn). The
  distributed shape is ONE hash-agg per conversation:
  ``sort_array(collect_list(struct(turn_idx, …)))`` makes the turn
  order explicit and partition-independent, then a fold
  concatenates — no window, no driver-side assembly.
- :func:`fim_transform` — fill-in-the-middle reordering for code
  corpora (Bayer et al. 2022 "Efficient Training of Language Models
  to Fill in the Middle", public): deterministic split points cut
  each selected document into (prefix, middle, suffix), re-emitted
  as ``<PRE>prefix<SUF>suffix<MID>middle`` (PSM). Selection and cut
  points derive from the id, so the transform is reproducible and
  both engines compute identical strings. Pure column expressions —
  scan speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHAT_ROLES = ("system", "user", "assistant")


def chat_render(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
) -> DataFrame:
    """(conv_id, n_turns, n_assistant_turns, text): the rendered
    ChatML-style training string per conversation; turn order is
    pinned by ``turn_col`` inside the sorted collect, so the result
    is independent of partitioning."""
    t = F.struct(
        F.col(turn_col).alias("i"),
        F.col(role_col).alias("r"),
        F.col(content_col).alias("c"),
    )
    g = turns.groupBy(conv_col).agg(
        F.sort_array(F.collect_list(t)).alias("__t"),
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.sum(
            (F.col(role_col) == "assistant").cast("bigint")
        ).alias("n_assistant_turns"),
    )
    rendered = F.aggregate(
        F.col("__t"),
        F.lit("").cast("string"),
        lambda acc, x: F.concat(
            acc,
            F.lit("<|im_start|>"),
            x["r"],
            F.lit("\n"),
            x["c"],
            F.lit("<|im_end|>\n"),
        ),
    )
    return g.select(
        conv_col, "n_turns", "n_assistant_turns",
        rendered.alias("text"),
    )


def chat_render_oracle_sql(
    turns_cte: str,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
) -> str:
    """DuckDB twin: ordered string_agg replays the sorted fold."""
    return f"""
    SELECT {conv_col},
           CAST(COUNT(*) AS BIGINT) AS n_turns,
           CAST(SUM(CASE WHEN {role_col} = 'assistant'
                    THEN 1 ELSE 0 END) AS BIGINT)
               AS n_assistant_turns,
           string_agg(
               '<|im_start|>' || {role_col} || chr(10)
               || {content_col} || '<|im_end|>' || chr(10),
               '' ORDER BY {turn_col}) AS text
    FROM {turns_cte}
    GROUP BY 1
    """


def fim_transform(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_mod: int = 2,
) -> DataFrame:
    """(id, fim_applied, text_out, n_chars): documents with
    ``id % rate_mod == 0`` are PSM-reordered at deterministic cut
    points (p1 = len·(2 + id%3)//10, p2 = len·(5 + id%4)//10 —
    varied per document, p2 clamped ≥ p1); the rest pass through.
    1-based substring arithmetic identical on both engines."""
    i = F.col(id_col)
    txt = F.col(text_col)
    n = F.length(txt)
    # integer DIV end to end — no float cut-point arithmetic
    p1 = F.expr(
        f"CAST(length({text_col})"
        f" * (CAST({id_col} % 3 AS INT) + 2) DIV 10 AS INT)"
    )
    p2 = F.greatest(
        F.expr(
            f"CAST(length({text_col})"
            f" * (CAST({id_col} % 4 AS INT) + 5) DIV 10 AS INT)"
        ),
        p1,
    )
    fim = F.concat(
        F.lit("<PRE>"), txt.substr(F.lit(1), p1),
        F.lit("<SUF>"), txt.substr(p2 + 1, n),
        F.lit("<MID>"), txt.substr(p1 + 1, p2 - p1),
    )
    applied = (i % rate_mod) == 0
    out = F.when(applied, fim).otherwise(txt)
    return docs.select(
        i,
        applied.alias("fim_applied"),
        out.alias("text_out"),
        F.length(out).cast("bigint").alias("n_chars"),
    )


def fim_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_mod: int = 2,
) -> str:
    """DuckDB twin of :func:`fim_transform` (same integer cut-point
    arithmetic; DuckDB // on non-negative operands equals the cast
    truncation Spark's cast('int') performs)."""
    n = f"length({text_col})"
    p1 = f"(({n} * (CAST({id_col} % 3 AS INT) + 2)) // 10)"
    p2 = (
        f"GREATEST(({n} * (CAST({id_col} % 4 AS INT) + 5)) // 10, {p1})"
    )
    fim = (
        f"'<PRE>' || substr({text_col}, 1, {p1}) || "
        f"'<SUF>' || substr({text_col}, {p2} + 1, {n}) || "
        f"'<MID>' || substr({text_col}, {p1} + 1, {p2} - {p1})"
    )
    return f"""
    SELECT {id_col},
           ({id_col} % {rate_mod} = 0) AS fim_applied,
           CASE WHEN {id_col} % {rate_mod} = 0 THEN {fim}
                ELSE {text_col} END AS text_out,
           CAST(length(CASE WHEN {id_col} % {rate_mod} = 0
                       THEN {fim} ELSE {text_col} END) AS BIGINT)
               AS n_chars
    FROM {table}
    """


def chat_assistant_spans(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
) -> DataFrame:
    """Per-turn LOSS-MASK spans for :func:`chat_render`'s template
    (round 11): SFT training masks the loss to assistant content,
    so beside the rendered string the pipeline must emit WHERE each
    turn's content lives in it. Per turn: the 0-based character
    offset of its content inside the rendered conversation and its
    length, plus the assistant flag the mask keys on.

    Offsets are pure window arithmetic over the turn order — the
    cumulative rendered length of all earlier turns plus this
    turn's header — so both engines derive them without
    re-rendering, and ``span_text_ok`` verifies in-engine that
    ``substr(rendered, start+1, len) = content`` for every turn (a
    drifted template constant cannot pass).

    Output: (conv_col, turn_col, role, span_start, span_len,
    is_assistant, span_text_ok)."""
    from pyspark.sql import Window

    header_len = F.lit(len("<|im_start|>")) + F.length(
        F.col(role_col)
    ) + F.lit(1)  # trailing newline after the role
    seg_len = header_len + F.length(F.col(content_col)) + F.lit(
        len("<|im_end|>\n")
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(turn_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(seg_len).over(w), F.lit(0)) + header_len
    spans = turns.select(
        F.col(conv_col),
        F.col(turn_col),
        F.col(role_col).alias("role"),
        start.cast("bigint").alias("span_start"),
        F.length(F.col(content_col)).cast("bigint").alias("span_len"),
        (F.col(role_col) == "assistant").alias("is_assistant"),
        F.col(content_col).alias("__content"),
    )
    rendered = chat_render(
        turns, conv_col, turn_col, role_col, content_col
    ).select(conv_col, F.col("text").alias("__text"))
    out = spans.join(rendered, conv_col)
    ok = (
        F.expr(
            "substr(__text, CAST(span_start + 1 AS INT), "
            "CAST(span_len AS INT))"
        )
        == F.col("__content")
    )
    return out.select(
        conv_col, turn_col, "role", "span_start", "span_len",
        "is_assistant", ok.alias("span_text_ok"),
    )


def chat_spans_oracle_sql(
    turns_cte: str,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "content",
) -> str:
    """DuckDB twin: the same window arithmetic + an ordered
    string_agg re-render for the substring check."""
    hl = f"(12 + length({role_col}) + 1)"
    seg = f"({hl} + length({content_col}) + 11)"  # <|im_end|> + newline
    return f"""
    WITH sp_turns AS ({turns_cte}),
    sp_rendered AS (
        SELECT {conv_col},
               string_agg('<|im_start|>' || {role_col} || chr(10)
                          || {content_col} || '<|im_end|>'
                          || chr(10), '' ORDER BY {turn_col})
                   AS rendered
        FROM sp_turns GROUP BY 1
    ),
    sp_spans AS (
        SELECT {conv_col}, {turn_col}, {role_col} AS role,
               CAST(COALESCE(SUM({seg}) OVER (
                   PARTITION BY {conv_col} ORDER BY {turn_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) + {hl}
                    AS BIGINT) AS span_start,
               CAST(length({content_col}) AS BIGINT) AS span_len,
               ({role_col} = 'assistant') AS is_assistant,
               {content_col} AS c
        FROM sp_turns
    )
    SELECT s.{conv_col}, s.{turn_col}, s.role, s.span_start,
           s.span_len, s.is_assistant,
           substr(r.rendered, CAST(s.span_start + 1 AS INT),
                  CAST(s.span_len AS INT)) = s.c AS span_text_ok
    FROM sp_spans s JOIN sp_rendered r USING ({conv_col})
    """
