"""AVI/DIB video codec tier (round 10 — operators/video.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from top_produce_etl_spark.operators.video import (
    decode_avi_frames,
    decode_video_stats,
    encode_avi_rgb,
    synthesize_videos,
    video_frame_stats,
)


def test_round_trip_with_row_padding():
    """w=2 rows are 6 pixel bytes padded to 8 — the padding and the
    bottom-up/BGR undo must both be exact."""
    w, h = 2, 3
    frames = [bytes(range(w * h * 3)), bytes(range(200, 200 + w * h * 3))]
    got = decode_avi_frames(encode_avi_rgb(w, h, frames, fps=15))
    assert got[0:3] == (w, h, 15)
    assert got[3] == frames


def test_capability_gates():
    b = bytearray(encode_avi_rgb(2, 2, [bytes(12)], fps=10))
    # compressed fourCC in strh handler
    off = bytes(b).index(b"vids") + 4
    b2 = bytearray(b)
    b2[off:off + 4] = b"MJPG"
    with pytest.raises(NotImplementedError, match="MJPG"):
        decode_avi_frames(bytes(b2))
    # BI compression word in strf
    off = bytes(b).index(b"strf") + 8 + 16
    b3 = bytearray(b)
    struct.pack_into("<I", b3, off, 1)
    with pytest.raises(NotImplementedError, match="compression 1"):
        decode_avi_frames(bytes(b3))
    # junk magic
    with pytest.raises(ValueError, match="AVI"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_corrupt_frame_size_rejected():
    b = bytearray(encode_avi_rgb(2, 2, [bytes(12)], fps=10))
    off = bytes(b).index(b"00db") + 4
    struct.pack_into("<I", b, off, 5)  # lie about the chunk size
    with pytest.raises(ValueError, match="frame payload"):
        decode_avi_frames(bytes(b))


def test_stats_on_spark(spark):
    media = synthesize_videos(spark.range(7).selectExpr("id AS doc_id"))
    stats = {
        r["media_id"]: r for r in decode_video_stats(media).collect()
    }
    assert len(stats) == 7
    # hand-check doc 3: w=0? no: w = 3%5+2 = 5, h = 3%3+2 = 2,
    # nf = 3%4+2 = 5, fps = 10+1 = 11
    r = stats[3]
    assert (r["width"], r["height"], r["n_frames"], r["fps"]) == (5, 2, 5, 11)
    n = 5 * 2 * 3
    tot_r = tot_chk = 0
    for f in range(5):
        i = np.arange(n, dtype=np.int64)
        v = (3 * 31 + f * 11 + i * 7) % 256
        tot_r += int(v[0::3].sum())
        tot_chk += int(((f * n + i) * v).sum())
    assert r["sum_r"] == tot_r and r["video_checksum"] == tot_chk
    # frame grain: every=2 keeps frames 0,2,4
    fr = [
        x for x in video_frame_stats(media, every=2).collect()
        if x["media_id"] == 3
    ]
    assert sorted(x["frame_idx"] for x in fr) == [0, 2, 4]


def test_bad_every_rejected(spark):
    with pytest.raises(ValueError):
        video_frame_stats(
            synthesize_videos(spark.range(1).selectExpr("id AS doc_id")),
            0,
        )


def test_keyframe_dhash_collapses_reencodes(spark):
    """Byte-different re-encodes (fps keyed on the raw id) of the
    same frames share the keyframe fingerprint; different content
    classes do not all collide."""
    from top_produce_etl_spark.operators.video import (
        synthesize_videos,
        video_keyframe_dhash,
    )

    ids = spark.range(10).selectExpr("id AS doc_id")
    rows = video_keyframe_dhash(
        synthesize_videos(ids, effective_mod=5), every=1
    ).collect()
    by_class: dict = {}
    fps_seen: dict = {}
    for r in rows:
        key = (r["w"], r["h"], r["n_keyframes"],
               r["fp0"], r["fp1"], r["fp2"], r["fp3"])
        by_class.setdefault(key, []).append(r["media_id"])
        fps_seen.setdefault(key, set()).add(r["fps"])
    assert all(len(v) == 2 for v in by_class.values())
    assert len(by_class) == 5
    # the collapse crossed real byte differences (fps header varies)
    assert all(len(s) == 2 for s in fps_seen.values())


def test_keyframe_dhash_every_validates(spark):
    import pytest

    from top_produce_etl_spark.operators.video import (
        synthesize_videos,
        video_keyframe_dhash,
    )

    media = synthesize_videos(spark.range(1).selectExpr("id AS doc_id"))
    with pytest.raises(ValueError, match="every"):
        video_keyframe_dhash(media, every=0)


def test_scene_changes_planted_structure(spark):
    """The detector recovers exactly ceil(nf / scene_len) scenes and
    the boundary checksum equals the planted boundary positions."""
    from top_produce_etl_spark.operators.video import (
        synthesize_scene_videos,
        video_scene_changes,
    )

    ids = spark.range(12).selectExpr("id AS doc_id")
    rows = video_scene_changes(
        synthesize_scene_videos(ids), threshold=8
    ).collect()
    assert len(rows) == 12
    for r in rows:
        eid = r["media_id"]
        sl = eid % 2 + 2
        nf = (eid % 3) * 3 + 6
        assert r["n_frames"] == nf
        assert r["n_scenes"] == -(-nf // sl)
        assert r["boundary_checksum"] == sum(
            f for f in range(sl, nf, sl)
        )
        assert r["max_hamming"] >= 12


def test_scene_changes_threshold_validates(spark):
    import pytest

    from top_produce_etl_spark.operators.video import (
        synthesize_scene_videos,
        video_scene_changes,
    )

    media = synthesize_scene_videos(
        spark.range(1).selectExpr("id AS doc_id")
    )
    with pytest.raises(ValueError, match="threshold"):
        video_scene_changes(media, threshold=0)


def test_motion_census_recovers_boundaries(spark):
    """Active frames == planted scene boundaries; flicker stays
    below the threshold."""
    from top_produce_etl_spark.operators.video import (
        synthesize_scene_videos,
        video_motion_stats,
    )

    ids = spark.range(10).selectExpr("id AS doc_id")
    for r in video_motion_stats(synthesize_scene_videos(ids)).collect():
        eid = r["media_id"]
        sl = eid % 2 + 2
        nf = (eid % 3) * 3 + 6
        assert r["n_active_frames"] == -(-nf // sl) - 1
        assert r["max_frame_motion"] > 10 * r["w"] * r["h"] * 3
