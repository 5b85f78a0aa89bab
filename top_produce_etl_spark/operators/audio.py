"""Audio column plumbing (round 10): REAL WAV (RIFF/PCM16) encode +
decode with zero media libraries — the r9 PNG move applied to the
audio modality, upgrading "audio as an opaque binary column" from a
fake kernel to a working codec.

- :func:`encode_wav_pcm16` writes honest RIFF files: ``RIFF`` size
  header, ``fmt `` chunk (PCM, mono, 16-bit LE), optional ``LIST``
  metadata chunk, ``data`` chunk — stdlib ``struct`` only.
- :func:`decode_wav_bytes` walks chunks (skipping unknown ones on
  word boundaries, the real container rule), validates the PCM16
  format words, and returns the sample array. Compressed/float WAV
  (IEEE float, ADPCM, ...) raises a precise ``NotImplementedError``
  — the documented capability gate, same convention as the PNG
  decoder's interlace rejection.
- The fixture (:func:`synthesize_audio`) plants a CLOSED-FORM
  waveform ``s(i) = ((eid·13 + i·97) mod 4001) − 2000`` that DuckDB
  re-derives without parsing a byte, so the decode round-trip is
  fully hash-checkable: per-doc sums, energy (Σ s², exact int64),
  zero crossings, and a positional checksum ``Σ i·s(i)`` that pins
  every sample to its index (a decoder that drops a chunk header or
  misaligns the data offset cannot pass).
- ``effective_mod`` plants DUPLICATE CLASSES at the CONTENT level:
  samples derive from ``id % effective_mod`` while a cosmetic
  ``LIST`` metadata chunk keyed on the raw id varies the BYTES —
  byte-level dedup misses these; decoded-fingerprint dedup must
  collapse them (and the chunk walk is load-bearing to do it).

Scale shape: everything is ``mapInPandas`` over bounded Arrow
batches (the multimodal.py contract); frame features explode to
(media, frame) grain inside the worker — no corpus-sized driver
state, no row-Python.
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
    StringType,
    StructField,
    StructType,
)

AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_s", LongType()),
        StructField("sum_abs", LongType()),
        StructField("energy", LongType()),  # sum of s^2, exact int64
        StructField("min_s", IntegerType()),
        StructField("max_s", IntegerType()),
        StructField("zero_crossings", LongType()),
        StructField("pos_checksum", LongType()),  # sum of i * s(i)
        StructField("byte_len", LongType()),  # container size incl. chunks
    ]
)

FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n", IntegerType()),
        StructField("energy", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def encode_wav_pcm16(
    sample_rate: int,
    pcm16le: bytes,
    list_info: bytes | None = None,
) -> bytes:
    """Real RIFF/WAVE container around mono PCM16-LE sample bytes;
    ``list_info`` (optional) inserts a LIST/INFO metadata chunk
    BETWEEN fmt and data — cosmetic bytes a correct decoder must
    skip."""
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ", 16,
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,  # byte rate
        2,  # block align
        16,  # bits per sample
    )
    chunks = fmt
    if list_info is not None:
        body = b"INFO" + list_info
        if len(body) % 2:
            body += b"\x00"  # chunks sit on word boundaries
        chunks += struct.pack("<4sI", b"LIST", len(body)) + body
    chunks += struct.pack("<4sI", b"data", len(pcm16le)) + pcm16le
    return struct.pack("<4sI4s", b"RIFF", 4 + len(chunks), b"WAVE") + chunks


def decode_wav_bytes(b: bytes) -> tuple[int, "object"]:
    """(sample_rate, int16 numpy array) from RIFF/PCM16 bytes. Walks
    chunks on word boundaries, tolerates unknown chunks (LIST, fact,
    cue, ...), validates mono PCM16. Raises ValueError on a broken
    container and NotImplementedError on honest capability gaps
    (non-PCM codecs, multi-channel)."""
    import numpy as np

    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt_seen = None
    data = None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, pos)
        pos += 8
        body = b[pos:pos + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            (audio_fmt, channels, rate, _brate, _balign, bits
             ) = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"WAV codec {audio_fmt} unsupported: only PCM "
                    "(format 1) decodes here; float/ADPCM need an "
                    "audio library (capability gate)"
                )
            if bits != 16:
                raise NotImplementedError(
                    f"{bits}-bit PCM unsupported: PCM16 only"
                )
            if channels != 1:
                raise NotImplementedError(
                    f"{channels}-channel WAV unsupported: mono only"
                )
            fmt_seen = rate
        elif cid == b"data":
            data = body
        pos += size + (size % 2)  # word alignment
    if fmt_seen is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return fmt_seen, np.frombuffer(data, dtype="<i2")


def synthesize_audio(
    ids: DataFrame,
    id_col: str = "doc_id",
    effective_mod: int | None = None,
) -> DataFrame:
    """Deterministic WAV fixture ENCODER: mono PCM16 with samples
    ``s(i) = ((eid·13 + i·97) mod 4001) − 2000`` over
    ``n = 800 + (eid % 5)·160`` samples at
    ``rate = 8000 + (eid % 3)·4000`` Hz — closed forms DuckDB
    re-derives without parsing bytes. Every third raw id gets a
    cosmetic LIST/INFO chunk (keyed on the RAW id), so with
    ``effective_mod`` the duplicate classes differ at the byte level
    while decoding to identical content."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                mid = int(mid)
                eid = mid % effective_mod if effective_mod else mid
                n = 800 + (eid % 5) * 160
                rate = 8000 + (eid % 3) * 4000
                i = np.arange(n, dtype=np.int64)
                s = ((eid * 13 + i * 97) % 4001 - 2000).astype("<i2")
                info = (
                    b"ISFT" + struct.pack("<I", 8)
                    + b"synth%03d" % (mid % 1000)
                    if mid % 3 == 0 else None
                )
                out.append(
                    (mid, encode_wav_pcm16(rate, s.tobytes(), info))
                )
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


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """REAL decode over a binary WAV column: Arrow-batched chunk
    walk + PCM16 parse, emitting exact-integer per-doc stats (see
    AUDIO_STATS_SCHEMA). zero_crossings counts strict sign flips
    (s[i]·s[i+1] < 0); energy is Σ s² (exact in int64 at any
    realistic clip length: 2^31 per sample × 2^32 samples head
    room)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, s16 = decode_wav_bytes(bytes(content))
                v = s16.astype(np.int64)
                zc = int(((v[:-1] * v[1:]) < 0).sum())
                out.append(
                    (
                        int(mid),
                        int(rate),
                        int(v.size),
                        int(v.sum()),
                        int(np.abs(v).sum()),
                        int((v * v).sum()),
                        int(v.min()),
                        int(v.max()),
                        zc,
                        int((np.arange(v.size) * v).sum()),
                        len(bytes(content)),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_STATS_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, AUDIO_STATS_SCHEMA
    )


def audio_frame_features(
    media: DataFrame, frame_samples: int = 256
) -> DataFrame:
    """Frame-level features over the decoded waveform: fixed
    ``frame_samples`` windows (last frame ragged), per frame the
    exact-integer energy and strict zero-crossing count — the
    classic cheap VAD/segmentation signals, emitted at
    (media, frame) grain from inside the Arrow worker."""
    if frame_samples < 2:
        raise ValueError("frame_samples must be >= 2")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                _, s16 = decode_wav_bytes(bytes(content))
                v = s16.astype(np.int64)
                for f in range(0, v.size, frame_samples):
                    w = v[f:f + frame_samples]
                    zc = int(((w[:-1] * w[1:]) < 0).sum())
                    out.append(
                        (
                            int(mid),
                            f // frame_samples,
                            int(w.size),
                            int((w * w).sum()),
                            zc,
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAME_FEATURES_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, FRAME_FEATURES_SCHEMA
    )


def audio_stats_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    effective_mod: int | None = None,
) -> str:
    """DuckDB CTE chain re-deriving the fixture's decoded stats from
    the closed form (no byte parsing — the image-oracle convention):
    ends in ``audio_stats`` with AUDIO_STATS_SCHEMA's columns."""
    eid = (
        f"({id_col} % {effective_mod})" if effective_mod else id_col
    )
    return f"""
audio_samples AS (
    SELECT {id_col} AS media_id,
           CAST(8000 + ({eid} % 3) * 4000 AS INT) AS sample_rate,
           CAST(44 + 2 * (800 + ({eid} % 5) * 160)
                + CASE WHEN {id_col} % 3 = 0 THEN 28 ELSE 0 END
                AS BIGINT) AS byte_len,
           i,
           (({eid} * 13 + i * 97) % 4001) - 2000 AS s
    FROM {table},
         UNNEST(range(800 + ({eid} % 5) * 160)) t(i)
),
audio_stats AS (
    SELECT media_id,
           ANY_VALUE(sample_rate) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(s) AS BIGINT) AS sum_s,
           CAST(SUM(ABS(s)) AS BIGINT) AS sum_abs,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(MIN(s) AS INT) AS min_s,
           CAST(MAX(s) AS INT) AS max_s,
           CAST(SUM(CASE WHEN nxt IS NOT NULL AND s * nxt < 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings,
           CAST(SUM(i * s) AS BIGINT) AS pos_checksum,
           ANY_VALUE(byte_len) AS byte_len
    FROM (
        SELECT *, LEAD(s) OVER (
            PARTITION BY media_id ORDER BY i) AS nxt
        FROM audio_samples
    )
    GROUP BY media_id
)"""


def audio_frames_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    frame_samples: int = 256,
    effective_mod: int | None = None,
) -> str:
    """DuckDB twin of :func:`audio_frame_features` from the closed
    form; ends in ``audio_frames``."""
    eid = (
        f"({id_col} % {effective_mod})" if effective_mod else id_col
    )
    return f"""
audio_samples AS (
    SELECT {id_col} AS media_id, i,
           CAST(i // {frame_samples} AS INT) AS frame_idx,
           (({eid} * 13 + i * 97) % 4001) - 2000 AS s
    FROM {table},
         UNNEST(range(800 + ({eid} % 5) * 160)) t(i)
),
audio_frames AS (
    SELECT media_id, frame_idx,
           CAST(COUNT(*) AS INT) AS n,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN nxt IS NOT NULL AND s * nxt < 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
    FROM (
        SELECT *, LEAD(s) OVER (
            PARTITION BY media_id, frame_idx ORDER BY i) AS nxt
        FROM audio_samples
    )
    GROUP BY 1, 2
)"""


RESAMPLE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("src_rate", IntegerType()),
        StructField("out_rate", IntegerType()),
        StructField("n_src", LongType()),
        StructField("n_out", LongType()),
        StructField("sum_s", LongType()),
        StructField("energy", LongType()),
        StructField("min_s", IntegerType()),
        StructField("max_s", IntegerType()),
        StructField("pos_checksum", LongType()),
        StructField("byte_len", LongType()),  # re-encoded container
    ]
)


def resample_audio_stats(
    media: DataFrame, target_rate: int = 16_000
) -> DataFrame:
    """Content-preserving LINEAR-INTERPOLATION resample to
    ``target_rate`` (round 11 — the audio tier's counterpart of the
    r10 image resize): decode the WAV, resample, RE-ENCODE a real
    PCM16 container at the new rate, decode that container back, and
    emit exact-integer stats of the re-decoded samples — the whole
    decode → resample → encode → decode chain is pinned by one
    closed-form oracle.

    Integer-exact interpolation (the oracle requirement): output
    length ``m = (n−1)·target // src + 1`` (the last output sample
    sits exactly on the last input sample); output j maps to source
    position ``j·src / target`` as ``i0 = (j·src) // target``,
    ``rem = (j·src) mod target``, and

        out[j] = s[i0] + floor((s[i0+1] − s[i0]) · rem / target)

    — FLOOR division (numpy's ``//``; the DuckDB twin uses the
    non-negative-remainder identity because its ``//`` truncates).
    Values stay between the neighboring samples, so PCM16 range is
    preserved by construction. Upsampling and downsampling both
    work; ``rem > 0`` implies ``i0 < n−1`` by the length formula, so
    the ``i0+1`` access never overruns.

    Scale shape: one Arrow-batched map over the binary column —
    scan speed, no shuffle (the codec-tier contract)."""
    if target_rate < 1:
        raise ValueError("target_rate must be >= 1")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                src_rate, s16 = decode_wav_bytes(bytes(content))
                s = s16.astype(np.int64)
                n = s.size
                m = (n - 1) * target_rate // src_rate + 1
                j = np.arange(m, dtype=np.int64)
                num = j * src_rate
                i0 = num // target_rate
                rem = num % target_rate
                i1 = np.minimum(i0 + 1, n - 1)
                res = s[i0] + (s[i1] - s[i0]) * rem // target_rate
                wav = encode_wav_pcm16(
                    target_rate, res.astype("<i2").tobytes()
                )
                rate2, v16 = decode_wav_bytes(wav)
                v = v16.astype(np.int64)
                out.append(
                    (
                        int(mid),
                        int(src_rate),
                        int(rate2),
                        int(n),
                        int(v.size),
                        int(v.sum()),
                        int((v * v).sum()),
                        int(v.min()),
                        int(v.max()),
                        int((np.arange(v.size) * v).sum()),
                        len(wav),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in RESAMPLE_STATS_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, RESAMPLE_STATS_SCHEMA
    )


def audio_resample_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    target_rate: int = 16_000,
    effective_mod: int | None = None,
) -> str:
    """DuckDB CTE chain re-deriving the resampled stats from the
    fixture's closed form (no byte parsing): source sample
    ``s(i) = ((eid·13 + i·97) mod 4001) − 2000`` is evaluated at
    ``i0`` and ``i0+1`` directly, interpolation uses the
    non-negative-remainder floor-division identity
    ``floor(a/b) = (a − ((a % b) + b) % b) / b`` (DuckDB ``//``
    truncates; the kernel floors). Ends in ``resample_stats``."""
    eid = (
        f"({id_col} % {effective_mod})" if effective_mod else id_col
    )
    t = target_rate
    # closed-form source sample at position POS, over the carried
    # ``eid`` column (a SQL fragment)
    s_at = lambda pos: f"(((eid * 13 + ({pos}) * 97) % 4001) - 2000)"
    delta_rem = f"(({s_at('i0 + 1')}) - ({s_at('i0')})) * rem"
    return f"""
resample_out AS (
    SELECT {id_col} AS media_id,
           CAST({eid} AS BIGINT) AS eid,
           CAST(8000 + ({eid} % 3) * 4000 AS INT) AS src_rate,
           CAST(800 + ({eid} % 5) * 160 AS BIGINT) AS n_src,
           j,
           (j * (8000 + ({eid} % 3) * 4000)) // {t} AS i0,
           (j * (8000 + ({eid} % 3) * 4000)) % {t} AS rem
    FROM {table},
         UNNEST(range(
             ((800 + ({eid} % 5) * 160) - 1) * {t}
             // (8000 + ({eid} % 3) * 4000) + 1)) u(j)
),
resample_vals AS (
    SELECT media_id, src_rate, n_src, j,
           ({s_at('i0')})
           + ({delta_rem}
              - (({delta_rem}) % {t} + {t}) % {t}) // {t} AS v
    FROM resample_out
),
resample_stats AS (
    SELECT media_id,
           ANY_VALUE(src_rate) AS src_rate,
           CAST({t} AS INT) AS out_rate,
           ANY_VALUE(n_src) AS n_src,
           CAST(COUNT(*) AS BIGINT) AS n_out,
           CAST(SUM(v) AS BIGINT) AS sum_s,
           CAST(SUM(v * v) AS BIGINT) AS energy,
           CAST(MIN(v) AS INT) AS min_s,
           CAST(MAX(v) AS INT) AS max_s,
           CAST(SUM(j * v) AS BIGINT) AS pos_checksum,
           CAST(44 + 2 * COUNT(*) AS BIGINT) AS byte_len
    FROM resample_vals
    GROUP BY media_id
)"""


TRIM_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_total", LongType()),
        StructField("n_trimmed", LongType()),
        StructField("lead_frames", IntegerType()),
        StructField("tail_frames", IntegerType()),
        StructField("sum_s", LongType()),
        StructField("energy", LongType()),
        StructField("pos_checksum", LongType()),
        StructField("byte_len", LongType()),
    ]
)


def synthesize_padded_audio(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """WAV fixture with PLANTED low-level noise pads around the
    voiced middle: ``lead = (eid%4)·160`` and ``tail = (eid%3)·160``
    pad samples of ±10 noise (``((eid·7 + i·13) mod 21) − 10`` at
    the PADDED index i) surround the standard voiced signal
    (``((eid·13 + k·97) mod 4001) − 2000`` at voiced-relative index
    k, ``n = 800 + (eid%5)·160``). Pads and the voiced length are
    multiples of the 160-sample frame, so frame grids align with
    region boundaries by construction — the trim detector's
    correctness is exact, not threshold-luck. Rate fixed at 16 kHz
    (160 samples = one 10 ms VAD frame)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid in pdf[id_col]:
                eid = int(mid)
                lead = (eid % 4) * 160
                tail = (eid % 3) * 160
                n = 800 + (eid % 5) * 160
                total = lead + n + tail
                i = np.arange(total, dtype=np.int64)
                noise = ((eid * 7 + i * 13) % 21) - 10
                k = i - lead
                voiced = ((eid * 13 + k * 97) % 4001) - 2000
                s = np.where(
                    (i >= lead) & (i < lead + n), voiced, noise
                ).astype("<i2")
                out.append((eid, encode_wav_pcm16(16_000, s.tobytes())))
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


def trim_silence_stats(
    media: DataFrame,
    frame_samples: int = 160,
    energy_threshold: int = 100_000,
) -> DataFrame:
    """Energy-gated silence trim (round 11 — the speech-data
    curation primitive): frame the waveform into ``frame_samples``
    windows, call a frame voiced when its exact-integer energy
    Σ s² reaches ``energy_threshold``, drop every frame before the
    first and after the last voiced frame, RE-ENCODE the trimmed
    clip, and emit exact stats of the re-decoded result (positional
    checksum re-indexed from 0 — pins the trim offset, not just the
    length). A clip with no voiced frame trims to the empty clip
    (44-byte container).

    Scale shape: one Arrow-batched map over the binary column —
    scan speed, no shuffle."""
    if frame_samples < 1:
        raise ValueError("frame_samples must be >= 1")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, s16 = decode_wav_bytes(bytes(content))
                v = s16.astype(np.int64)
                n = v.size
                nf = -(-n // frame_samples)
                voiced = [
                    f
                    for f in range(nf)
                    if int(
                        (v[f * frame_samples:(f + 1) * frame_samples]
                         ** 2).sum()
                    ) >= energy_threshold
                ]
                if voiced:
                    lo = voiced[0] * frame_samples
                    hi = min((voiced[-1] + 1) * frame_samples, n)
                    lead, tail = voiced[0], nf - 1 - voiced[-1]
                else:
                    lo = hi = 0
                    lead, tail = nf, 0
                wav = encode_wav_pcm16(
                    rate, v[lo:hi].astype("<i2").tobytes()
                )
                rate2, t16 = decode_wav_bytes(wav)
                t = t16.astype(np.int64)
                out.append(
                    (
                        int(mid),
                        int(rate2),
                        int(n),
                        int(t.size),
                        int(lead),
                        int(tail),
                        int(t.sum()),
                        int((t * t).sum()),
                        int((np.arange(t.size) * t).sum()),
                        len(wav),
                    )
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in TRIM_STATS_SCHEMA]
            )

    return media.select("media_id", "content").mapInPandas(
        fn, TRIM_STATS_SCHEMA
    )


def trim_silence_oracle_ctes(
    table: str = "documents",
    id_col: str = "doc_id",
    frame_samples: int = 160,
    energy_threshold: int = 100_000,
) -> str:
    """DuckDB CTE chain re-deriving the trim census from
    :func:`synthesize_padded_audio`'s closed form: per-sample
    values, frame energies, the voiced-frame window, then exact
    stats over the kept range re-indexed from 0. Ends in
    ``trim_stats`` with TRIM_STATS_SCHEMA's columns."""
    fs = frame_samples
    return f"""
trim_samples AS (
    SELECT {id_col} AS media_id,
           CAST(({id_col} % 4) * 160 AS BIGINT) AS lead_n,
           CAST(800 + ({id_col} % 5) * 160 AS BIGINT) AS n_voiced,
           CAST(({id_col} % 3) * 160 AS BIGINT) AS tail_n,
           i,
           CASE WHEN i >= ({id_col} % 4) * 160
                 AND i < ({id_col} % 4) * 160
                         + 800 + ({id_col} % 5) * 160
                THEN (({id_col} * 13
                       + (i - ({id_col} % 4) * 160) * 97) % 4001)
                     - 2000
                ELSE (({id_col} * 7 + i * 13) % 21) - 10
           END AS s
    FROM {table},
         UNNEST(range(({id_col} % 4) * 160
                      + 800 + ({id_col} % 5) * 160
                      + ({id_col} % 3) * 160)) u(i)
),
trim_frames AS (
    SELECT media_id, i // {fs} AS f,
           SUM(s * s) AS fenergy,
           ANY_VALUE(lead_n + n_voiced + tail_n) AS n_total
    FROM trim_samples
    GROUP BY 1, 2
),
trim_window AS (
    SELECT media_id,
           ANY_VALUE(n_total) AS n_total,
           CAST(MIN(CASE WHEN fenergy >= {energy_threshold}
                    THEN f END) AS BIGINT) AS first_v,
           CAST(MAX(CASE WHEN fenergy >= {energy_threshold}
                    THEN f END) AS BIGINT) AS last_v,
           COUNT(*) AS nf
    FROM trim_frames
    GROUP BY 1
),
trim_stats AS (
    SELECT w.media_id,
           CAST(16000 AS INT) AS sample_rate,
           w.n_total,
           CAST(COUNT(s.i) AS BIGINT) AS n_trimmed,
           CAST(COALESCE(w.first_v, w.nf) AS INT) AS lead_frames,
           CAST(CASE WHEN w.last_v IS NULL THEN 0
                ELSE w.nf - 1 - w.last_v END AS INT) AS tail_frames,
           CAST(COALESCE(SUM(s.s), 0) AS BIGINT) AS sum_s,
           CAST(COALESCE(SUM(s.s * s.s), 0) AS BIGINT) AS energy,
           CAST(COALESCE(SUM((s.i - w.first_v * {fs}) * s.s), 0)
                AS BIGINT) AS pos_checksum,
           CAST(44 + 2 * COUNT(s.i) AS BIGINT) AS byte_len
    FROM trim_window w
    LEFT JOIN trim_samples s
      ON s.media_id = w.media_id
     AND s.i >= w.first_v * {fs}
     AND s.i < LEAST((w.last_v + 1) * {fs}, w.n_total)
    GROUP BY w.media_id, w.n_total, w.first_v, w.last_v, w.nf
)"""
