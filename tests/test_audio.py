"""WAV/PCM16 audio codec tier (round 10 — operators/audio.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from top_produce_etl_spark.operators.audio import (
    audio_frame_features,
    decode_audio_stats,
    decode_wav_bytes,
    encode_wav_pcm16,
    synthesize_audio,
)


def _wav(samples, rate=8000, info=None):
    return encode_wav_pcm16(
        rate, np.asarray(samples, dtype="<i2").tobytes(), info
    )


def test_round_trip():
    s = [0, 100, -100, 32767, -32768, 7]
    rate, got = decode_wav_bytes(_wav(s, rate=44100))
    assert rate == 44100
    assert got.tolist() == s


def test_list_chunk_skipped_word_alignment():
    """A LIST metadata chunk between fmt and data — with an ODD
    body forcing the pad byte — must not perturb the samples."""
    s = [1, -2, 3]
    b = _wav(s, info=b"ISFT" + struct.pack("<I", 5) + b"hello")
    rate, got = decode_wav_bytes(b)
    assert got.tolist() == s
    # the pad byte is real: chunk body INFO+ISFT+size+5 = 17, odd
    assert b.index(b"data") % 1 == 0  # container still parses


def test_capability_gates():
    s = np.asarray([1, 2], dtype="<i2").tobytes()
    good = encode_wav_pcm16(8000, s)
    # IEEE float format word (3)
    bad = bytearray(good)
    off = good.index(b"fmt ") + 8
    struct.pack_into("<H", bad, off, 3)
    with pytest.raises(NotImplementedError, match="codec 3"):
        decode_wav_bytes(bytes(bad))
    # stereo
    bad = bytearray(good)
    struct.pack_into("<H", bad, off + 2, 2)
    with pytest.raises(NotImplementedError, match="2-channel"):
        decode_wav_bytes(bytes(bad))
    # 8-bit
    bad = bytearray(good)
    struct.pack_into("<H", bad, off + 14, 8)
    with pytest.raises(NotImplementedError, match="8-bit"):
        decode_wav_bytes(bytes(bad))


def test_broken_container_rejected():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_bytes(b"OggS" + b"\x00" * 40)
    # truncated: fmt but no data chunk
    good = _wav([1, 2, 3])
    with pytest.raises(ValueError, match="missing"):
        decode_wav_bytes(good[: good.index(b"data")])


def test_stats_and_frames_on_spark(spark):
    media = synthesize_audio(
        spark.range(9).selectExpr("id AS doc_id")
    )
    stats = {r["media_id"]: r for r in decode_audio_stats(media).collect()}
    assert len(stats) == 9
    # hand-check doc 0: s(i) = (i*97 % 4001) - 2000, n=800, rate=8000
    i = np.arange(800, dtype=np.int64)
    s = (i * 97) % 4001 - 2000
    r0 = stats[0]
    assert r0["sample_rate"] == 8000 and r0["n_samples"] == 800
    assert r0["sum_s"] == int(s.sum())
    assert r0["energy"] == int((s * s).sum())
    assert r0["zero_crossings"] == int(((s[:-1] * s[1:]) < 0).sum())
    assert r0["pos_checksum"] == int((i * s).sum())
    # id 0 carries the LIST chunk (0 % 3 == 0): 44 + 2n + 28
    assert r0["byte_len"] == 44 + 1600 + 28
    assert stats[1]["byte_len"] == 44 + 2 * stats[1]["n_samples"]
    # frames: energies sum back to the doc energy; indices contiguous
    fr = [
        r
        for r in audio_frame_features(media, 256).collect()
        if r["media_id"] == 0
    ]
    assert [r["frame_idx"] for r in sorted(fr, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert sum(r["n"] for r in fr) == 800 and fr[-1] is not None
    assert sum(r["energy"] for r in fr) == r0["energy"]


def test_content_dedup_crosses_byte_variants(spark):
    """Classes planted at id % 4: members' bytes differ (LIST chunk
    on every third raw id) but decode to identical content."""
    media = synthesize_audio(
        spark.range(24).selectExpr("id AS doc_id"), effective_mod=4
    )
    rows = decode_audio_stats(media).collect()
    by_class: dict = {}
    for r in rows:
        key = (r["n_samples"], r["sum_s"], r["energy"], r["pos_checksum"])
        by_class.setdefault(key, []).append(r)
    assert len(by_class) == 4
    for members in by_class.values():
        assert len(members) == 6
        assert len({m["byte_len"] for m in members}) == 2


def test_frame_features_rejects_bad_width(spark):
    with pytest.raises(ValueError):
        audio_frame_features(
            synthesize_audio(spark.range(1).selectExpr("id AS doc_id")),
            1,
        )


def test_resample_identity_rate(spark):
    """Resampling to the clip's own rate is the identity (every
    output position lands exactly on an input sample)."""
    from top_produce_etl_spark.operators.audio import (
        decode_audio_stats,
        resample_audio_stats,
        synthesize_audio,
    )

    ids = spark.range(3).selectExpr("id AS doc_id")
    media = synthesize_audio(ids)
    base = {r["media_id"]: r for r in decode_audio_stats(media).collect()}
    for r in resample_audio_stats(media, target_rate=8000).collect():
        b = base[r["media_id"]]
        if b["sample_rate"] == 8000:
            assert r["n_out"] == b["n_samples"]
            assert r["sum_s"] == b["sum_s"]
            assert r["energy"] == b["energy"]
            assert r["pos_checksum"] == b["pos_checksum"]


def test_resample_linear_midpoints():
    """Pure-kernel check on a tiny hand signal: doubling an
    alternating ±100 signal interpolates exact midpoints (0), and
    values always stay between the neighboring samples."""
    import numpy as np

    from top_produce_etl_spark.operators.audio import (
        decode_wav_bytes,
        encode_wav_pcm16,
    )

    s = np.array([100, -100, 100, -100], dtype="<i2")
    # replicate the kernel arithmetic at target = 2 x src
    src, tgt, n = 4000, 8000, s.size
    v = s.astype(np.int64)
    m = (n - 1) * tgt // src + 1
    j = np.arange(m)
    num = j * src
    i0 = num // tgt
    rem = num % tgt
    i1 = np.minimum(i0 + 1, n - 1)
    res = v[i0] + (v[i1] - v[i0]) * rem // tgt
    assert list(res) == [100, 0, -100, 0, 100, 0, -100]
    # kernel floor semantics on negative deltas: (−200·2000)//4000
    assert (np.int64(-200) * 2000 // 4000) == -100
    # round-trips through a real container
    rate, back = decode_wav_bytes(
        encode_wav_pcm16(tgt, res.astype("<i2").tobytes())
    )
    assert rate == tgt and list(back) == list(res)


def test_trim_silence_planted_pads(spark):
    """The detector recovers the planted pad frame counts exactly
    and the trimmed signal equals the voiced middle."""
    from top_produce_etl_spark.operators.audio import (
        synthesize_padded_audio,
        trim_silence_stats,
    )

    ids = spark.range(12).selectExpr("id AS doc_id")
    rows = trim_silence_stats(synthesize_padded_audio(ids)).collect()
    for r in rows:
        eid = r["media_id"]
        assert r["lead_frames"] == eid % 4
        assert r["tail_frames"] == eid % 3
        assert r["n_trimmed"] == 800 + (eid % 5) * 160
        assert r["byte_len"] == 44 + 2 * r["n_trimmed"]


def test_trim_silence_all_quiet(spark):
    """A clip with NO voiced frame trims to the empty container."""
    import numpy as np
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType)

    from top_produce_etl_spark.operators.audio import (
        encode_wav_pcm16,
        trim_silence_stats,
    )

    quiet = np.zeros(320, dtype="<i2")
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(16000, quiet.tobytes())))],
        StructType([
            StructField("media_id", LongType()),
            StructField("content", BinaryType()),
        ]),
    )
    r = trim_silence_stats(df).collect()[0]
    assert r["n_trimmed"] == 0 and r["byte_len"] == 44
    assert r["lead_frames"] == 2 and r["tail_frames"] == 0
