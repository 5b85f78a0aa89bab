"""SFT layout operators (round 11 — operators/sft.py): chat
rendering semantics (order pinning, template bytes) and FIM
reconstruction invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.sft import (
    chat_render,
    fim_transform,
)


def test_chat_render_template_and_order(spark):
    turns = spark.createDataFrame(
        [
            (1, 2, "assistant", "a2"),
            (1, 0, "system", "s0"),
            (1, 1, "user", "u1"),
            (2, 0, "user", "solo"),
        ],
        "conv_id bigint, turn_idx int, role string, content string",
    )
    got = {r["conv_id"]: r for r in chat_render(turns).collect()}
    assert got[1]["text"] == (
        "<|im_start|>system\ns0<|im_end|>\n"
        "<|im_start|>user\nu1<|im_end|>\n"
        "<|im_start|>assistant\na2<|im_end|>\n"
    )
    assert got[1]["n_turns"] == 3 and got[1]["n_assistant_turns"] == 1
    assert got[2]["n_assistant_turns"] == 0


def test_chat_render_partitioning_invariant(spark):
    turns = spark.createDataFrame(
        [(0, i, "user", f"c{i}") for i in range(20)],
        "conv_id bigint, turn_idx int, role string, content string",
    )
    a = chat_render(turns.repartition(1)).collect()[0]["text"]
    b = chat_render(turns.repartition(13)).collect()[0]["text"]
    assert a == b


def test_fim_reconstruction(spark):
    """PSM pieces reassemble to the original document, and the
    pass-through half is untouched."""
    docs = spark.createDataFrame(
        [(i, "abcdefghijklmnopqrstuvwxyz") for i in range(8)],
        "doc_id bigint, text string",
    )
    for r in fim_transform(docs).collect():
        t = r["text_out"]
        if not r["fim_applied"]:
            assert t == "abcdefghijklmnopqrstuvwxyz"
            continue
        assert t.startswith("<PRE>")
        pre, rest = t[5:].split("<SUF>", 1)
        suf, mid = rest.split("<MID>", 1)
        assert pre + mid + suf == "abcdefghijklmnopqrstuvwxyz"
        assert r["n_chars"] == len(t)


def test_chat_spans_extract_assistant_content(spark):
    from top_produce_etl_spark.operators.sft import (
        chat_assistant_spans,
        chat_render,
    )

    turns = spark.createDataFrame(
        [
            (1, 0, "system", "sys"),
            (1, 1, "user", "hello there"),
            (1, 2, "assistant", "hi! how can I help?"),
        ],
        "conv_id bigint, turn_idx int, role string, content string",
    )
    spans = chat_assistant_spans(turns).collect()
    assert all(r["span_text_ok"] for r in spans)
    text = chat_render(turns).collect()[0]["text"]
    a = [r for r in spans if r["is_assistant"]][0]
    assert (
        text[a["span_start"]:a["span_start"] + a["span_len"]]
        == "hi! how can I help?"
    )
