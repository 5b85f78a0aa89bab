"""BPE tokenizer training (operators/bpe.py): merge order, greedy
left-to-right application, and the encode path on held-out words."""

from __future__ import annotations

from pyspark.sql import functions as F

from top_produce_etl_spark.operators.bpe import (
    bpe_train,
    merge_pair,
    segment_words,
)


def test_bpe_learns_classic_merges(spark):
    """The Sennrich toy corpus: 'low' x5, 'lower' x2, 'newest' x6,
    'widest' x3 (word-internal BPE, no end-of-word marker). Round 1
    must merge the most frequent pair (e,s): 6+3=9; round 2 (es,t):
    9; round 3 (l,o): 7."""
    docs = spark.createDataFrame(
        [(" ".join(["low"] * 5 + ["lower"] * 2
                   + ["newest"] * 6 + ["widest"] * 3),)],
        "text string",
    )
    merges, vocab = bpe_train(docs, "text", 3)
    assert merges == [("e", "s"), ("es", "t"), ("l", "o")]
    seg = {r["word"]: r["sym"] for r in vocab.collect()}
    assert seg["newest"] == ["n", "e", "w", "est"]
    assert seg["widest"] == ["w", "i", "d", "est"]
    assert seg["low"] == ["lo", "w"]
    assert seg["lower"] == ["lo", "w", "e", "r"]


def test_merge_pair_greedy_overlaps(spark):
    """Greedy left-to-right on overlapping runs: aaaa -> [aa, aa],
    aaa -> [aa, a] — the disambiguation the oracle fold mirrors."""
    df = spark.createDataFrame(
        [("aaaa",), ("aaa",), ("ba",), ("a",)], "w string"
    )
    got = {
        r["w"]: r["m"]
        for r in df.select(
            "w", merge_pair(F.split("w", ""), "a", "a").alias("m")
        ).collect()
    }
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaa"] == ["aa", "a"]
    assert got["ba"] == ["b", "a"]
    assert got["a"] == ["a"]


def test_segment_words_applies_learned_model(spark):
    """Encoding a held-out word with the learned merge list uses the
    merges in training order."""
    words = spark.createDataFrame([("lowest",)], "word string")
    out = segment_words(words, [("e", "s"), ("es", "t"), ("l", "o")])
    assert out.collect()[0]["sym"] == ["lo", "w", "est"]


def test_encode_corpus_round_trips_words(spark):
    """Encoded pieces concatenate back to the original words, in
    document order, and n_pieces counts every emitted piece."""
    from top_produce_etl_spark.operators.bpe import encode_corpus

    docs = spark.createDataFrame(
        [
            (1, " ".join(["low"] * 5 + ["newest"] * 6 + ["widest"] * 3)),
            (2, "lower low"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           encode_corpus(docs, "doc_id", "text", 3).collect()}
    # merges (e,s)(es,t)(l,o): low -> "lo w", newest -> "n e w est"
    assert got[2].encoded == "lo w e r lo w"
    assert got[2].n_pieces == 6
    enc1 = got[1].encoded.split(" ")
    assert "".join(enc1) == "low" * 5 + "newest" * 6 + "widest" * 3


def test_bpe_checkpoint_invariant_to_cadence(spark):
    """Lineage checkpointing is a physical-only change: the learned
    merge list and final vocabulary must be IDENTICAL at any
    checkpoint cadence (including none), and per-round timings are
    collected when asked."""
    from top_produce_etl_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(i, "hug " * 10 + "pug " * 5 + "pun " * 12 + "bun hugs")
         for i in range(4)],
        "doc_id long, text string",
    )
    rt: list = []
    m_ck, v_ck = bpe_train(
        docs, "text", 8, checkpoint_every=2, round_times=rt
    )
    m_no, v_no = bpe_train(docs, "text", 8, checkpoint_every=0)
    assert m_ck == m_no
    assert len(rt) == len(m_ck)
    key = lambda r: r["word"]  # noqa: E731
    assert sorted(v_ck.collect(), key=key) == sorted(
        v_no.collect(), key=key
    )
