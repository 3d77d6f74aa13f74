"""Multimodal payload plumbing — video/audio as opaque binary columns with
typed metadata, processed by Arrow-batched UDFs (training-data tier).

Images are fully real in this engine (functions/codec.py decodes actual
bytes). Real video codecs (pyav/ffmpeg) are NOT in this container, so video
decode is REAL over a deterministic synthetic frame container instead of a
stub: **SFV1**, a keyframe container this module both writes and genuinely
parses — magic check, fixed-width header, per-keyframe record walk, zlib
plane decompression, plane-size validation — with probe-style error
categories (``bad_magic`` / ``truncated`` / ``corrupt``) so malformed
payloads become error ROWS, never task failures (the semantics a 100 TB
fetch tier needs; same pattern as operators/media.py probe_media). A real
mp4/webm payload routes to the ``unsupported`` category where a pyav/ffmpeg
branch would slot in — nothing else changes.

Frame-sampling math is the reference's thumbnail timestamp rule
(thumbnail_enricher.py:51-52): evenly spaced samples,
``n = min(max(1, duration/60 * per_min), max_n)``, endpoints excluded. All
sampling/selection arithmetic is integer milliseconds so a cross-engine
oracle reproduces it exactly.

Audio remains a declared deterministic fake PCM source (torchaudio-class
decoders are likewise absent); the windowed RMS / zero-crossing features
over it are real.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

VIDEO_SCHEMA = "media_id string, bytes binary"
FRAME_SCHEMA = (
    "media_id string, frame_idx int, ts_ms long, key_idx int, "
    "frame_png binary, phash long, sum_luma long, err string"
)
AUDIO_FEATURE_SCHEMA = (
    "media_id string, n_windows int, rms array<float>, zero_cross array<float>, "
    "sum_sq array<long>, n_zc array<int>, err string"
)

# ---------------------------------------------------------------------------
# SFV1 synthetic frame container: real write + real parse
# ---------------------------------------------------------------------------

SFV_MAGIC = b"SFV1"
_SFV_HDR = struct.Struct("<4sHHIH")  # magic, w, h, duration_ms, n_key
_SFV_REC = struct.Struct("<II")  # ts_ms, payload_len


def sfv_encode(
    w: int, h: int, duration_ms: int, planes: list[tuple[int, bytes]]
) -> bytes:
    """Write an SFV1 container: header + ``(ts_ms, len, zlib(gray w*h))``
    keyframe records in timestamp order."""
    parts = [_SFV_HDR.pack(SFV_MAGIC, w, h, duration_ms, len(planes))]
    for ts_ms, gray in planes:
        if len(gray) != w * h:
            raise ValueError(f"plane must be w*h={w * h} bytes, got {len(gray)}")
        comp = zlib.compress(gray, 6)
        parts.append(_SFV_REC.pack(ts_ms, len(comp)))
        parts.append(comp)
    return b"".join(parts)


class SfvError(ValueError):
    """Parse failure with a coarse deterministic category (the value that
    lands in the ``err`` column)."""

    def __init__(self, category: str):
        super().__init__(category)
        self.category = category


def sfv_parse(data: bytes) -> tuple[int, int, int, list[tuple[int, np.ndarray]]]:
    """Validate + fully decode an SFV1 container ->
    ``(w, h, duration_ms, [(ts_ms, gray_plane(h,w))...])``.

    Probe semantics: the WHOLE container is walked and every plane
    decompressed before any frame is served, so a payload truncated
    anywhere yields ``truncated`` deterministically (core/media.py:108-130
    decode-verify, not header-sniff)."""
    if data is None or len(data) < _SFV_HDR.size:
        raise SfvError("truncated")
    magic, w, h, duration_ms, n_key = _SFV_HDR.unpack_from(data, 0)
    if magic != SFV_MAGIC:
        raise SfvError("bad_magic")
    if w <= 0 or h <= 0 or n_key <= 0 or duration_ms <= 0:
        raise SfvError("corrupt")
    off, planes = _SFV_HDR.size, []
    for _ in range(n_key):
        if off + _SFV_REC.size > len(data):
            raise SfvError("truncated")
        ts_ms, plen = _SFV_REC.unpack_from(data, off)
        off += _SFV_REC.size
        if off + plen > len(data):
            raise SfvError("truncated")
        try:
            gray = zlib.decompress(data[off : off + plen])
        except zlib.error as e:
            raise SfvError("corrupt") from e
        if len(gray) != w * h:
            raise SfvError("corrupt")
        off += plen
        planes.append((ts_ms, np.frombuffer(gray, dtype=np.uint8).reshape(h, w)))
    # Keyframe-index invariants: the stream must start at ts 0, be strictly
    # increasing, and stay inside the declared duration. Without this a
    # parse-valid container whose earliest keyframe is AFTER the first
    # sampled timestamp would make extract_frames' at-or-before selection
    # an empty max() — a task failure, which malformed payloads must never
    # cause (they become error rows instead).
    ts_list = [ts for ts, _ in planes]
    if ts_list[0] != 0 or ts_list != sorted(set(ts_list)) or ts_list[-1] > duration_ms:
        raise SfvError("corrupt")
    return w, h, duration_ms, planes


def sample_timestamps_ms(
    duration_ms: int, per_minute: float = 1.0, max_n: int = 4
) -> list[int]:
    """Integer-ms frame-sampling rule (reference thumbnail_enricher.py:51-52):
    clamp count to [1, max_n], place samples evenly, excluding endpoints.
    Pure integer arithmetic so the DuckDB oracle reproduces it bit-exactly."""
    n = int(min(max(1.0, duration_ms / 60000.0 * per_minute), float(max_n)))
    return [duration_ms * (i + 1) // (n + 1) for i in range(n)]


def sample_timestamps(
    duration_s: float, per_minute: float = 1.0, max_n: int = 4
) -> list[float]:
    """Seconds-domain twin of sample_timestamps_ms (kept for the O4
    thumbnail-plan math and its tests)."""
    n = int(min(max(1, duration_s / 60.0 * per_minute), max_n))
    return [duration_s * (i + 1) / (n + 1) for i in range(n)]


def extract_frames(
    videos: DataFrame, per_minute: float = 1.0, max_n: int = 4
) -> DataFrame:
    """One row per sampled frame: (media_id, bytes) -> (media_id, frame_idx,
    ts_ms, key_idx, frame_png, phash, sum_luma, err).

    Real decode of the SFV1 container: parse + validate the whole payload,
    pick for each sampled timestamp the latest keyframe at-or-before it
    (key_idx), PNG-encode the gray plane as RGB, dHash it, and emit the
    exact luma sum (a standard training-data quality signal, and integer so
    it is oracle-checkable). Malformed payloads yield ONE error row with
    the parse category and NULL frame columns — bad media must never kill
    a 100 TB job. Arrow-batched mapInPandas; per-partition decoder state
    initializes once (iterator form, like the fetch UDF)."""
    from ..functions.codec import dhash64, png_encode  # noqa: PLC0415

    err_row = {
        "frame_idx": None, "ts_ms": None, "key_idx": None,
        "frame_png": None, "phash": None, "sum_luma": None,
    }  # fmt: skip

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    data = bytes(row.bytes) if row.bytes is not None else None
                    _, _, duration_ms, planes = sfv_parse(data)
                except SfvError as e:
                    out.append({"media_id": row.media_id, "err": e.category, **err_row})
                    continue
                for idx, ts in enumerate(
                    sample_timestamps_ms(duration_ms, per_minute, max_n)
                ):
                    key_idx = max(k for k, (kts, _) in enumerate(planes) if kts <= ts)
                    plane = planes[key_idx][1]
                    rgb = np.repeat(plane[:, :, None], 3, axis=2)
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": idx,
                            "ts_ms": ts,
                            "key_idx": key_idx,
                            "frame_png": png_encode(rgb),
                            "phash": dhash64(rgb),
                            "sum_luma": int(plane.sum(dtype=np.int64)),
                            "err": None,
                        }
                    )
            yield (
                pd.DataFrame.from_records(out)
                if out
                else pd.DataFrame(
                    {
                        "media_id": pd.Series(dtype="object"),
                        "frame_idx": pd.Series(dtype="object"),
                        "ts_ms": pd.Series(dtype="object"),
                        "key_idx": pd.Series(dtype="object"),
                        "frame_png": pd.Series(dtype="object"),
                        "phash": pd.Series(dtype="object"),
                        "sum_luma": pd.Series(dtype="object"),
                        "err": pd.Series(dtype="object"),
                    }
                )
            )

    return videos.mapInPandas(gen, FRAME_SCHEMA)


def _decode_audio_stub(data: bytes, n_windows: int) -> np.ndarray:
    """Deterministic fake PCM windows derived from the content hash
    (declared: audio codecs absent from this container)."""
    seed = int.from_bytes(hashlib.md5(data[:64]).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_windows, 256)).astype(np.float32)


# SFA1 synthetic audio container: real write + real parse (the audio twin of
# SFV1 above — a real decoder slots in where sfa_parse sits). Layout:
# magic "SFA1", uint32 n_samples, then n_samples int8 PCM samples. Window
# size is fixed at 256 samples so features are oracle-checkable per window.
SFA_MAGIC = b"SFA1"
_SFA_HDR = struct.Struct("<4sI")
SFA_WINDOW = 256


class SfaError(Exception):
    def __init__(self, category: str):
        super().__init__(category)
        self.category = category


def sfa_encode(samples: np.ndarray) -> bytes:
    """Write an SFA1 container from int8 PCM samples."""
    s = np.asarray(samples, dtype=np.int8)
    return _SFA_HDR.pack(SFA_MAGIC, len(s)) + s.tobytes()


def sfa_parse(data: bytes | None) -> np.ndarray:
    """Parse an SFA1 container into (n_windows, 256) int8 PCM windows.
    Raises SfaError('empty'|'bad_magic'|'truncated'|'corrupt') — bad media
    must never kill the job (same contract as sfv_parse)."""
    if data is None or len(data) == 0:
        raise SfaError("empty")
    # length-first, magic second — the same categorization order as
    # sfv_parse: a short header with valid magic is 'truncated', not
    # 'bad_magic'
    if len(data) < _SFA_HDR.size:
        raise SfaError("truncated")
    if data[:4] != SFA_MAGIC:
        raise SfaError("bad_magic")
    (_, n_samples) = _SFA_HDR.unpack_from(data)
    if len(data) < _SFA_HDR.size + n_samples:
        raise SfaError("truncated")
    if n_samples == 0 or n_samples % SFA_WINDOW != 0:
        raise SfaError("corrupt")
    pcm = np.frombuffer(data, dtype=np.int8, count=n_samples, offset=_SFA_HDR.size)
    return pcm.reshape(-1, SFA_WINDOW)


def extract_audio_features(
    audio: DataFrame, n_windows: int = 8, container: str = "auto"
) -> DataFrame:
    """Windowed RMS + zero-crossing-rate per clip, plus the integer-exact
    twins (sum of squared samples, zero-crossing count) that make the
    operator oracle-checkable without a float crossing the engine boundary.

    SFA1 payloads get a REAL decode (sfa_parse: magic check, length check,
    window reshape — window count comes from the container); any other
    payload falls back to the deterministic stub PCM (audio codecs are
    absent from this container, declared at _decode_audio_stub), where the
    integer features are null (stub samples are floats). Malformed SFA1
    yields one error row with the parse category — bad media must never
    kill a 100 TB job. ``container="sfa"`` disables the stub fallback so
    non-SFA bytes are judged (and categorized) by the parser instead of
    silently stubbed — the gate-query mode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["media_id", "n_windows", "rms", "zero_cross", "sum_sq", "n_zc", "err"]
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                data = bytes(row.bytes) if row.bytes is not None else b""
                sum_sq = n_zc = None
                if container == "sfa" or data[:4] == SFA_MAGIC or not data:
                    try:
                        pcm = sfa_parse(data)
                    except SfaError as e:
                        out.append(
                            {
                                "media_id": row.media_id, "n_windows": None,
                                "rms": None, "zero_cross": None,
                                "sum_sq": None, "n_zc": None, "err": e.category,
                            }
                        )
                        continue
                    wide = pcm.astype(np.int64)
                    sum_sq = [int(x) for x in (wide * wide).sum(axis=1)]
                    n_zc = [
                        int(x)
                        for x in (np.diff(np.signbit(pcm), axis=1) != 0).sum(axis=1)
                    ]
                else:
                    pcm = _decode_audio_stub(data, n_windows)
                rms = np.sqrt((pcm.astype(np.float64) ** 2).mean(axis=1))
                zc = (np.diff(np.signbit(pcm), axis=1) != 0).mean(axis=1)
                out.append(
                    {
                        "media_id": row.media_id,
                        "n_windows": pcm.shape[0],
                        "rms": [float(x) for x in rms],
                        "zero_cross": [float(x) for x in zc],
                        "sum_sq": sum_sq,
                        "n_zc": n_zc,
                        "err": None,
                    }
                )
            yield (
                pd.DataFrame.from_records(out, columns=cols)
                if out
                else pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
            )

    return audio.mapInPandas(gen, AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic synthetic video fixtures (shared by tests and the gate)
# ---------------------------------------------------------------------------

SFV_W, SFV_H = 32, 18


def synthetic_plane(media_seed: int, key: int) -> bytes:
    """Closed-form gray plane: px(r,c) = (seed + 31r + 7c) % 256 with
    seed = (media_seed*97 + key*13) % 256 — the formula a SQL oracle can
    evaluate cell-by-cell to verify the zlib round-trip exactly."""
    seed = (media_seed * 97 + key * 13) % 256
    r = np.arange(SFV_H, dtype=np.int64)[:, None] * 31
    c = np.arange(SFV_W, dtype=np.int64)[None, :] * 7
    return ((seed + r + c) % 256).astype(np.uint8).tobytes()


def synthetic_sfv_payload(media_seed: int) -> bytes:
    """A valid SFV1 container for ``media_seed``: duration 30..329 s,
    1..3 keyframes at evenly floored timestamps."""
    duration_ms = (30 + (media_seed * 37) % 300) * 1000
    n_key = 1 + media_seed % 3
    planes = [
        (duration_ms * k // n_key, synthetic_plane(media_seed, k))
        for k in range(n_key)
    ]
    return sfv_encode(SFV_W, SFV_H, duration_ms, planes)


def synthetic_sfa_payload(media_seed: int, n_win: int | None = None) -> bytes:
    """A valid SFA1 container for ``media_seed``: 2..4 windows of 256 int8
    PCM samples with the closed-form signal
    ``x(t) = ((seed*31 + 5*t*t + 11*t) % 256) - 128`` over the GLOBAL sample
    index t — the formula a SQL oracle evaluates sample-by-sample to verify
    the container round-trip and the windowed features exactly."""
    if n_win is None:
        n_win = 2 + media_seed % 3
    t = np.arange(n_win * SFA_WINDOW, dtype=np.int64)
    x = (media_seed * 31 + 5 * t * t + 11 * t) % 256 - 128
    return sfa_encode(x.astype(np.int8))


def synthetic_videos_df(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic video table with REAL SFV1 payloads."""

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame.from_records(
                [
                    {
                        "media_id": f"vid_{int(i):06d}",
                        "bytes": synthetic_sfv_payload(int(i)),
                    }
                    for i in pdf["id"]
                ]
            )

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, VIDEO_SCHEMA)
