"""Video column plumbing (round 10): REAL AVI encode + frame decode
with zero media libraries — completing the modality triple (image:
PPM/BMP/PNG, audio: WAV/PCM16, video: AVI/DIB).

An AVI file is a RIFF container (the same chunk grammar as WAV,
operators/audio.py) holding a header list and a ``movi`` list of
per-frame chunks. With the uncompressed ``DIB`` codec each frame's
payload follows the BMP pixel rules (bottom-up rows, BGR order,
4-byte row padding) — so this module writes honest AVI files
(``avih`` main header, ``strl``/``strh``/``strf`` stream headers
with a real BITMAPINFOHEADER, ``00db`` frame chunks, ``idx1``
index) and the decoder walks them back: compressed fourCCs
(MJPG/H264/...) and non-24-bit frames raise precise
``NotImplementedError`` — the documented capability gate, exactly
the WAV/PNG convention.

The fixture plants a closed-form pixel function over (frame, pos)
that DuckDB re-derives without parsing a byte, so frame extraction
is fully hash-checkable: per-frame channel sums and a GLOBAL
positional checksum ``Σ (f·w·h·3 + i) · v(f, i)`` pin every byte of
every frame to its (frame, row, column, channel) slot — a decoder
that flips rows wrong, mis-skips padding, drops the idx1 chunk
tail, or swaps frames cannot pass.

Scale shape: ``mapInPandas`` over bounded Arrow batches; frame
explosion happens inside the worker at (media, frame) grain — the
multimodal.py contract.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)

VIDEO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
        StructField("video_checksum", LongType()),
    ]
)


def _dib_frame(w: int, h: int, rgb: bytes) -> bytes:
    """Row-major RGB → DIB pixel payload: bottom-up rows, BGR
    order, rows padded to 4 bytes (the BMP rules)."""
    row_out = (w * 3 + 3) & ~3
    pad = b"\x00" * (row_out - w * 3)
    out = bytearray()
    for y in range(h - 1, -1, -1):
        row = rgb[y * w * 3:(y + 1) * w * 3]
        # BGR swap per pixel
        bgr = bytearray(len(row))
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        out += bgr + pad
    return bytes(out)


def _undib_frame(w: int, h: int, payload: bytes) -> bytes:
    row_out = (w * 3 + 3) & ~3
    if len(payload) != row_out * h:
        raise ValueError(
            f"frame payload {len(payload)} != expected {row_out * h}"
        )
    out = bytearray(w * h * 3)
    for y in range(h):
        src = payload[(h - 1 - y) * row_out:(h - 1 - y) * row_out + w * 3]
        row = bytearray(len(src))
        row[0::3] = src[2::3]
        row[1::3] = src[1::3]
        row[2::3] = src[0::3]
        out[y * w * 3:(y + 1) * w * 3] = row
    return bytes(out)


def _list(four: bytes, body: bytes) -> bytes:
    if len(body) % 2:
        body += b"\x00"
    return struct.pack("<4sI4s", b"LIST", 4 + len(body), four) + body


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return struct.pack("<4sI", cid, len(body)) + body + pad


def encode_avi_rgb(
    w: int, h: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Honest AVI/DIB file from row-major RGB frame buffers."""
    frame_bytes = ((w * 3 + 3) & ~3) * h
    avih = _chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // fps,  # microseconds per frame
            frame_bytes * fps,  # max bytes/sec
            0,  # padding granularity
            0x10,  # AVIF_HASINDEX
            len(frames),
            0,  # initial frames
            1,  # streams
            frame_bytes,  # suggested buffer
            w, h,
            0, 0, 0, 0,  # reserved
        ),
    )
    strh = _chunk(
        b"strh",
        struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", b"DIB ",
            0, 0, 0, 0,
            1, fps,  # scale, rate -> fps
            0, len(frames),
            frame_bytes, 0xFFFFFFFF, 0,
            0, 0, w, h,
        ),
    )
    strf = _chunk(
        b"strf",
        struct.pack(
            "<IiiHHIIiiII",
            40, w, h, 1, 24,
            0,  # BI_RGB, uncompressed
            frame_bytes, 0, 0, 0, 0,
        ),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))
    movi_body = b""
    offsets = []
    for rgb in frames:
        offsets.append(4 + len(movi_body))  # offset from 'movi' tag
        movi_body += _chunk(b"00db", _dib_frame(w, h, rgb))
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            struct.pack("<4sIII", b"00db", 0x10, off, frame_bytes)
            for off in offsets
        ),
    )
    body = hdrl + movi + idx1
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"AVI ") + body


def decode_avi_frames(b: bytes) -> tuple[int, int, int, list[bytes]]:
    """(width, height, fps, row-major RGB frames) from AVI bytes.
    Walks the RIFF tree, validates the uncompressed 24-bit DIB
    stream, un-DIBs each ``00db``/``00dc`` chunk; skips junk and
    ``idx1`` like a real player. NotImplementedError on compressed
    fourCCs or non-24-bit frames."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    w = h = fps = None
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h, fps
        pos = 0
        while pos + 8 <= len(buf):
            cid, size = struct.unpack_from("<4sI", buf, pos)
            pos += 8
            body = buf[pos:pos + size]
            if cid == b"LIST":
                walk(body[4:])
            elif cid == b"avih":
                w, h = struct.unpack_from("<II", body, 32)
            elif cid == b"strh":
                fcc_type, handler = struct.unpack_from("<4s4s", body, 0)
                if fcc_type == b"vids":
                    scale, rate = struct.unpack_from("<II", body, 20)
                    fps = rate // max(scale, 1)
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00"):
                        raise NotImplementedError(
                            f"AVI codec {handler!r} unsupported: only "
                            "uncompressed DIB decodes here; MJPG/H264 "
                            "need a media library (capability gate)"
                        )
            elif cid == b"strf":
                bits, compression = struct.unpack_from("<HI", body, 14)
                if compression != 0:
                    raise NotImplementedError(
                        f"BI compression {compression} unsupported: "
                        "BI_RGB only"
                    )
                if bits != 24:
                    raise NotImplementedError(
                        f"{bits}-bit frames unsupported: 24-bit only"
                    )
            elif cid in (b"00db", b"00dc"):
                frames.append(body)
            pos += size + (size % 2)

    walk(b[12:])
    if w is None or fps is None:
        raise ValueError("missing avih or strh header")
    return w, h, fps, [_undib_frame(w, h, f) for f in frames]


def synthesize_videos(
    ids: DataFrame,
    id_col: str = "doc_id",
    effective_mod: int | None = None,
) -> DataFrame:
    """Deterministic AVI fixture ENCODER: frame f, row-major RGB
    position i has value ``v = (eid·31 + f·11 + i·7) mod 256`` with
    ``w = eid%5+2``, ``h = eid%3+2``, ``n_frames = eid%4+2``,
    ``fps = 10 + eid%2`` — closed forms DuckDB re-derives without
    parsing a byte.

    With ``effective_mod`` the duplicate classes key frame CONTENT
    on ``eid = mid % effective_mod`` while ``fps`` keys on the RAW
    id (r11): re-encodes of the same frames at different frame
    rates differ in the avih/strh header bytes — the byte-level
    variation a content-grain dedup must collapse (the audio tier's
    cosmetic-LIST-chunk convention, at the header field level)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                eid = mid % effective_mod if effective_mod else mid
                w, h = eid % 5 + 2, eid % 3 + 2
                nf = eid % 4 + 2
                fps = 10 + (mid if effective_mod else eid) % 2
                i = np.arange(w * h * 3, dtype=np.int64)
                frames = [
                    ((eid * 31 + f * 11 + i * 7) % 256)
                    .astype(np.uint8)
                    .tobytes()
                    for f in range(nf)
                ]
                out.append((mid, encode_avi_rgb(w, h, frames, fps)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return ids.select(id_col).mapInPandas(
        fn,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("content", BinaryType()),
            ]
        ),
    )


def decode_video_stats(media: DataFrame) -> DataFrame:
    """REAL frame extraction over a binary AVI column: per media the
    header dims/fps, per-channel sums over ALL frames, and the
    global positional checksum Σ (f·w·h·3 + i)·v."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, fps, frames = decode_avi_frames(bytes(content))
                sr = sg = sb = chk = 0
                for f, rgb in enumerate(frames):
                    v = np.frombuffer(rgb, dtype=np.uint8).astype(
                        np.int64
                    )
                    sr += int(v[0::3].sum())
                    sg += int(v[1::3].sum())
                    sb += int(v[2::3].sum())
                    chk += int(
                        ((f * v.size + np.arange(v.size)) * v).sum()
                    )
                out.append(
                    (int(mid), w, h, len(frames), fps, sr, sg, sb, chk)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_STATS_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, VIDEO_STATS_SCHEMA
    )


def video_frame_stats(media: DataFrame, every: int = 1) -> DataFrame:
    """Frame-grain extraction (the real counterpart of the
    metadata-only frame-sampling plan): every ``every``-th frame's
    channel sums + per-frame positional checksum, emitted at
    (media, frame) grain inside the Arrow worker."""
    if every < 1:
        raise ValueError("every must be >= 1")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, _fps, frames = decode_avi_frames(bytes(content))
                for f in range(0, len(frames), every):
                    v = np.frombuffer(
                        frames[f], dtype=np.uint8
                    ).astype(np.int64)
                    out.append(
                        (
                            int(mid), f, w, h,
                            int(v[0::3].sum()),
                            int(v[1::3].sum()),
                            int(v[2::3].sum()),
                            int((np.arange(v.size) * v).sum()),
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in VIDEO_FRAME_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, VIDEO_FRAME_SCHEMA
    )


def video_stats_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    effective_mod: int | None = None,
) -> str:
    """DuckDB twin re-deriving the per-media stats from the closed
    form; ends in ``video_stats``."""
    eid = f"({id_col} % {effective_mod})" if effective_mod else id_col
    return f"""
video_px AS (
    SELECT {id_col} AS media_id,
           CAST({eid} % 5 + 2 AS INT) AS width,
           CAST({eid} % 3 + 2 AS INT) AS height,
           CAST({eid} % 4 + 2 AS INT) AS n_frames,
           CAST(10 + {eid} % 2 AS INT) AS fps,
           f, i,
           ({eid} * 31 + f * 11 + i * 7) % 256 AS v
    FROM {table},
         UNNEST(range({eid} % 4 + 2)) tf(f),
         UNNEST(range(({eid} % 5 + 2) * ({eid} % 3 + 2) * 3)) ti(i)
),
video_stats AS (
    SELECT media_id,
           ANY_VALUE(width) AS width,
           ANY_VALUE(height) AS height,
           ANY_VALUE(n_frames) AS n_frames,
           ANY_VALUE(fps) AS fps,
           CAST(SUM(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT)
               AS sum_r,
           CAST(SUM(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS BIGINT)
               AS sum_g,
           CAST(SUM(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT)
               AS sum_b,
           CAST(SUM((f * width * height * 3 + i) * v) AS BIGINT)
               AS video_checksum
    FROM video_px
    GROUP BY media_id
)"""


def video_frames_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    every: int = 1,
    effective_mod: int | None = None,
) -> str:
    """DuckDB twin of :func:`video_frame_stats`; ends in
    ``video_frames``."""
    eid = f"({id_col} % {effective_mod})" if effective_mod else id_col
    return f"""
video_px AS (
    SELECT {id_col} AS media_id,
           CAST({eid} % 5 + 2 AS INT) AS width,
           CAST({eid} % 3 + 2 AS INT) AS height,
           CAST(f AS INT) AS frame_idx, i,
           ({eid} * 31 + f * 11 + i * 7) % 256 AS v
    FROM {table},
         UNNEST(range({eid} % 4 + 2)) tf(f),
         UNNEST(range(({eid} % 5 + 2) * ({eid} % 3 + 2) * 3)) ti(i)
    WHERE f % {every} = 0
),
video_frames AS (
    SELECT media_id, frame_idx,
           ANY_VALUE(width) AS width,
           ANY_VALUE(height) AS height,
           CAST(SUM(CASE WHEN i % 3 = 0 THEN v ELSE 0 END) AS BIGINT)
               AS sum_r,
           CAST(SUM(CASE WHEN i % 3 = 1 THEN v ELSE 0 END) AS BIGINT)
               AS sum_g,
           CAST(SUM(CASE WHEN i % 3 = 2 THEN v ELSE 0 END) AS BIGINT)
               AS sum_b,
           CAST(SUM(i * v) AS BIGINT) AS frame_checksum
    FROM video_px
    GROUP BY 1, 2
)"""


KEYFRAME_DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fps", IntegerType()),
        StructField("n_keyframes", IntegerType()),
        StructField("fp0", LongType()),
        StructField("fp1", LongType()),
        StructField("fp2", LongType()),
        StructField("fp3", LongType()),
    ]
)


def video_keyframe_dhash(media: DataFrame, every: int = 1) -> DataFrame:
    """Per-video perceptual fingerprint at KEYFRAME grain (round 11
    — the video leg of the decoded-fingerprint dedup family): every
    ``every``-th frame gets the image tier's difference hash
    (operators/multimodal.py::image_dhash — nearest-neighbor 8×9
    grid over raw r+g+b sums, one bit per horizontal comparison,
    four 16-bit bands), and the video's fingerprint folds the
    keyframe bands positionally:

        fp_b = Σ_k (k + 1) · band_b(keyframe k)

    so re-ordered, dropped, or altered keyframes change the
    fingerprint while byte-level RE-ENCODES of the same frames
    (different fps headers, container cosmetic differences) collapse
    onto it. Integer-exact end to end — (k+1) ≤ a few and bands
    < 2^16, so the fold lives comfortably in int64 and DuckDB
    re-derives every bit from the fixture's closed-form pixel
    formula.

    Scale shape: one Arrow-batched map over the binary column; the
    dedup downstream is a hash-agg on four ints per video."""
    if every < 1:
        raise ValueError("every must be >= 1")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        rows, cols = 8, 9
        ty = np.arange(rows)
        tx = np.arange(cols)
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, fps, frames = decode_avi_frames(bytes(content))
                sy = (ty * h) // rows
                sx = (tx * w) // cols
                base = 3 * (sy[:, None] * w + sx[None, :])
                fps_ = [0, 0, 0, 0]
                nk = 0
                for k, f in enumerate(range(0, len(frames), every)):
                    v = np.frombuffer(
                        frames[f], dtype=np.uint8
                    ).astype(np.int64)
                    g = v[base] + v[base + 1] + v[base + 2]
                    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)
                    for b in range(rows // 2):
                        band = sum(
                            int(bits[2 * b + r, c]) << (r * 8 + c)
                            for r in range(2)
                            for c in range(cols - 1)
                        )
                        fps_[b] += (k + 1) * band
                    nk += 1
                out.append(
                    (int(mid), w, h, fps, nk, *fps_)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in KEYFRAME_DHASH_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, KEYFRAME_DHASH_SCHEMA
    )


def video_keyframe_dhash_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    every: int = 1,
    effective_mod: int | None = None,
) -> str:
    """DuckDB CTE chain re-deriving the keyframe fingerprints from
    the fixture's closed-form pixel formula (no byte parsing): grid
    brightness g(f, ty, tx) = Σ_c v(f, 3·(sy·w + sx) + c), lead()
    over tx gives the comparison bits, two grouped folds pack bands
    and then positional fingerprints. Ends in ``kf_dhash`` with
    KEYFRAME_DHASH_SCHEMA's columns."""
    eid = (
        f"({id_col} % {effective_mod})" if effective_mod else id_col
    )
    fps_src = id_col if effective_mod else eid
    v_at = (
        lambda pos: f"((eid * 31 + f * 11 + ({pos}) * 7) % 256)"
    )
    return f"""
kf_grid AS (
    SELECT {id_col} AS media_id,
           CAST({eid} AS BIGINT) AS eid,
           CAST({eid} % 5 + 2 AS INT) AS w,
           CAST({eid} % 3 + 2 AS INT) AS h,
           CAST(10 + ({fps_src}) % 2 AS INT) AS fps,
           f, ty, tx
    FROM {table},
         UNNEST(range({eid} % 4 + 2)) uf(f),
         UNNEST(range(8)) uy(ty),
         UNNEST(range(9)) ux(tx)
    WHERE f % {every} = 0
),
kf_g AS (
    SELECT media_id, w, h, fps, f, ty, tx,
           {v_at('base')} + {v_at('base + 1')}
           + {v_at('base + 2')} AS g
    FROM (
        SELECT *,
               3 * (((ty * h) // 8) * w + ((tx * w) // 9)) AS base
        FROM kf_grid
    )
),
kf_bits AS (
    SELECT media_id, w, h, fps, f, ty, tx,
           CASE WHEN LEAD(g) OVER (
                    PARTITION BY media_id, f, ty ORDER BY tx) > g
                THEN 1 ELSE 0 END AS bit
    FROM kf_g
),
kf_bands AS (
    SELECT media_id, w, h, fps, f, ty // 2 AS band,
           SUM(bit * (1 << ((ty % 2) * 8 + tx))) AS bandval
    FROM kf_bits
    WHERE tx < 8
    GROUP BY 1, 2, 3, 4, 5, 6
),
kf_dhash AS (
    SELECT media_id,
           ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
           ANY_VALUE(fps) AS fps,
           CAST(COUNT(DISTINCT f) AS INT) AS n_keyframes,
           CAST(SUM(CASE WHEN band = 0
                    THEN (f // {every} + 1) * bandval END)
                AS BIGINT) AS fp0,
           CAST(SUM(CASE WHEN band = 1
                    THEN (f // {every} + 1) * bandval END)
                AS BIGINT) AS fp1,
           CAST(SUM(CASE WHEN band = 2
                    THEN (f // {every} + 1) * bandval END)
                AS BIGINT) AS fp2,
           CAST(SUM(CASE WHEN band = 3
                    THEN (f // {every} + 1) * bandval END)
                AS BIGINT) AS fp3
    FROM kf_bands
    GROUP BY media_id
)"""


SCENE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_scenes", IntegerType()),
        StructField("boundary_checksum", LongType()),
        StructField("sum_hamming", LongType()),
        StructField("max_hamming", IntegerType()),
    ]
)


def synthesize_scene_videos(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic AVI fixture with PLANTED SCENE STRUCTURE: clips
    of ``nf = (eid%3)·3 + 6`` frames split into scenes of
    ``scene_len = eid%2 + 2`` frames. Within a scene only a ±1
    brightness flicker changes (``f % 2`` — the perceptual hash must
    see through it); across scenes the pixel gradient's SLOPE jumps
    (``7 + 10·s``), flipping most brightness comparisons. Frame f,
    position i:

        v = (eid·31 + s·97 + i·(7 + 10·s) + f%2) mod 256,
        s = f // scene_len

    with ``w = eid%4+6``, ``h = eid%3+4``. Measured on the dHash
    grid: within-scene Hamming ≤ 2 bits, cross-scene ≥ 12 — the
    threshold-8 detector is exact on this fixture, and DuckDB
    re-derives every bit from the closed form."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                eid = int(mid)
                w, h = eid % 4 + 6, eid % 3 + 4
                nf = (eid % 3) * 3 + 6
                sl = eid % 2 + 2
                i = np.arange(w * h * 3, dtype=np.int64)
                frames = []
                for f in range(nf):
                    s = f // sl
                    frames.append(
                        (
                            (eid * 31 + s * 97 + i * (7 + 10 * s)
                             + f % 2) % 256
                        ).astype(np.uint8).tobytes()
                    )
                out.append((eid, encode_avi_rgb(w, h, frames, 10)))
            yield pd.DataFrame(out, columns=["media_id", "content"])

    return ids.select(id_col).mapInPandas(
        fn,
        StructType(
            [
                StructField("media_id", LongType()),
                StructField("content", BinaryType()),
            ]
        ),
    )


def video_scene_changes(
    media: DataFrame, threshold: int = 8
) -> DataFrame:
    """Scene-change detection over a binary AVI column (round 11 —
    the clip-segmentation primitive a video training-data pipeline
    cuts on): each frame gets the image tier's 8×9 difference hash;
    a frame starts a new scene iff it is frame 0 or its Hamming
    distance to the previous frame's hash reaches ``threshold``
    bits. Per clip: scene count, the boundary-frame index checksum
    (Σ f over scene starts — pins WHICH frames cut, not just how
    many), and the Hamming mass/max — all exact integers the DuckDB
    twin re-derives from the fixture's closed form.

    Scale shape: one Arrow-batched map, hash state is 64 bits per
    frame inside the worker; output is one row per clip."""
    if threshold < 1:
        raise ValueError("threshold must be >= 1")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        rows, cols = 8, 9
        ty = np.arange(rows)
        tx = np.arange(cols)
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, _fps, frames = decode_avi_frames(bytes(content))
                sy = (ty * h) // rows
                sx = (tx * w) // cols
                base = 3 * (sy[:, None] * w + sx[None, :])
                prev = None
                n_scenes = 0
                bchk = 0
                sham = 0
                mham = 0
                for f, rgb in enumerate(frames):
                    v = np.frombuffer(rgb, dtype=np.uint8).astype(
                        np.int64
                    )
                    g = v[base] + v[base + 1] + v[base + 2]
                    bits = (g[:, 1:] > g[:, :-1])
                    if prev is None:
                        n_scenes += 1
                    else:
                        ham = int((bits != prev).sum())
                        sham += ham
                        mham = max(mham, ham)
                        if ham >= threshold:
                            n_scenes += 1
                            bchk += f
                    prev = bits
                out.append(
                    (
                        int(mid), w, h, len(frames),
                        n_scenes, bchk, sham, mham,
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in SCENE_STATS_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, SCENE_STATS_SCHEMA
    )


def video_scene_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    threshold: int = 8,
) -> str:
    """DuckDB CTE chain re-deriving the scene census from
    :func:`synthesize_scene_videos`' closed form: per-(frame, grid
    cell) comparison bits, LAG over the frame axis per cell for the
    Hamming distances, then the boundary census. Ends in
    ``scene_stats`` with SCENE_STATS_SCHEMA's columns."""
    v_at = (
        lambda pos: f"((eid * 31 + (f // sl) * 97 "
        f"+ ({pos}) * (7 + 10 * (f // sl)) + f % 2) % 256)"
    )
    return f"""
sc_grid AS (
    SELECT {id_col} AS media_id,
           CAST({id_col} AS BIGINT) AS eid,
           CAST({id_col} % 4 + 6 AS INT) AS w,
           CAST({id_col} % 3 + 4 AS INT) AS h,
           CAST({id_col} % 2 + 2 AS INT) AS sl,
           CAST(({id_col} % 3) * 3 + 6 AS INT) AS nf,
           f, ty, tx
    FROM {table},
         UNNEST(range(({id_col} % 3) * 3 + 6)) uf(f),
         UNNEST(range(8)) uy(ty),
         UNNEST(range(8)) ux(tx)
),
sc_bits AS (
    SELECT media_id, w, h, nf, f, ty, tx,
           CASE WHEN ({v_at('base1')} + {v_at('base1 + 1')}
                      + {v_at('base1 + 2')})
                   > ({v_at('base0')} + {v_at('base0 + 1')}
                      + {v_at('base0 + 2')})
                THEN 1 ELSE 0 END AS bit
    FROM (
        SELECT *,
               3 * (((ty * h) // 8) * w + ((tx * w) // 9)) AS base0,
               3 * (((ty * h) // 8) * w
                    + (((tx + 1) * w) // 9)) AS base1
        FROM sc_grid
    )
),
sc_ham AS (
    SELECT media_id, w, h, nf, f,
           SUM(CASE WHEN prev_bit IS NOT NULL
                     AND bit <> prev_bit THEN 1 ELSE 0 END) AS ham,
           BOOL_AND(prev_bit IS NULL) AS is_first
    FROM (
        SELECT *, LAG(bit) OVER (
            PARTITION BY media_id, ty, tx ORDER BY f) AS prev_bit
        FROM sc_bits
    )
    GROUP BY 1, 2, 3, 4, 5
),
scene_stats AS (
    SELECT media_id,
           ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
           ANY_VALUE(nf) AS n_frames,
           CAST(SUM(CASE WHEN is_first OR ham >= {threshold}
                    THEN 1 ELSE 0 END) AS INT) AS n_scenes,
           CAST(SUM(CASE WHEN NOT is_first AND ham >= {threshold}
                    THEN f ELSE 0 END) AS BIGINT)
               AS boundary_checksum,
           CAST(SUM(CASE WHEN NOT is_first THEN ham ELSE 0 END)
                AS BIGINT) AS sum_hamming,
           CAST(MAX(CASE WHEN NOT is_first THEN ham ELSE 0 END)
                AS INT) AS max_hamming
    FROM sc_ham
    GROUP BY media_id
)"""


MOTION_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("total_motion", LongType()),
        StructField("max_frame_motion", LongType()),
        StructField("n_active_frames", IntegerType()),
    ]
)


def video_motion_stats(
    media: DataFrame, active_factor: int = 10
) -> DataFrame:
    """Temporal-activity signal over a binary AVI column (round 11
    — the cheap motion filter video curation ranks clips by before
    any model sees them): per consecutive frame pair the
    exact-integer sum of absolute byte differences; a frame is
    ACTIVE when its difference exceeds ``active_factor`` per byte
    (Σ|Δ| > active_factor·w·h·3). The default 10 clears the
    fixture's flicker even at its worst: a ±1 offset step wraps
    255→0 at ~n/256 positions, each contributing 255 instead of 1,
    so flicker tops out near 2n+254 while scene jumps average ~85
    per byte. Per clip: total/max motion and
    the active-frame count, all DuckDB-re-derivable from the
    fixture's closed form."""
    if active_factor < 1:
        raise ValueError("active_factor must be >= 1")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, _fps, frames = decode_avi_frames(bytes(content))
                prev = None
                total = 0
                mx = 0
                active = 0
                thr = active_factor * w * h * 3
                for rgb in frames:
                    v = np.frombuffer(rgb, dtype=np.uint8).astype(
                        np.int64
                    )
                    if prev is not None:
                        d = int(np.abs(v - prev).sum())
                        total += d
                        mx = max(mx, d)
                        if d > thr:
                            active += 1
                    prev = v
                out.append(
                    (int(mid), w, h, len(frames), total, mx, active)
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in MOTION_STATS_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, MOTION_STATS_SCHEMA
    )


def video_motion_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    active_factor: int = 10,
) -> str:
    """DuckDB CTE chain re-deriving the motion census from
    :func:`synthesize_scene_videos`' closed form — per (frame,
    position) the two pixel values and their absolute difference,
    rolled up per frame then per clip. Ends in ``motion_stats``."""
    v = (
        lambda f: f"((eid * 31 + (({f}) // sl) * 97 "
        f"+ i * (7 + 10 * (({f}) // sl)) + ({f}) % 2) % 256)"
    )
    return f"""
mo_pos AS (
    SELECT {id_col} AS media_id,
           CAST({id_col} AS BIGINT) AS eid,
           CAST({id_col} % 4 + 6 AS INT) AS w,
           CAST({id_col} % 3 + 4 AS INT) AS h,
           CAST({id_col} % 2 + 2 AS INT) AS sl,
           CAST(({id_col} % 3) * 3 + 6 AS INT) AS nf,
           f, i
    FROM {table},
         UNNEST(range(1, ({id_col} % 3) * 3 + 6)) uf(f),
         UNNEST(range(({id_col} % 4 + 6) * ({id_col} % 3 + 4) * 3))
             ui(i)
),
mo_frame AS (
    SELECT media_id, w, h, nf, f,
           SUM(ABS({v('f')} - {v('f - 1')})) AS d
    FROM mo_pos
    GROUP BY 1, 2, 3, 4, 5
),
motion_stats AS (
    SELECT media_id,
           ANY_VALUE(w) AS w, ANY_VALUE(h) AS h,
           ANY_VALUE(nf) AS n_frames,
           CAST(SUM(d) AS BIGINT) AS total_motion,
           CAST(MAX(d) AS BIGINT) AS max_frame_motion,
           CAST(SUM(CASE WHEN d > {active_factor} * w * h * 3
                    THEN 1 ELSE 0 END) AS INT) AS n_active_frames
    FROM mo_frame
    GROUP BY media_id
)"""
