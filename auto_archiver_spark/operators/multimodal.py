"""Multimodal payload plumbing — video/audio as opaque binary columns with
typed metadata, processed by Arrow-batched UDFs (training-data tier).

Images are fully real in this engine (functions/codec.py decodes actual
bytes). Video/audio codecs are NOT in this container, so — per the task
contract — the *decode* step is stubbed behind a deterministic fake while
everything Spark-side is real and tested: schemas, partitioning, mapInPandas
signatures, Arrow batch shapes, frame-sampling math (the reference's
thumbnail timestamp rule, thumbnail_enricher.py:51-52: evenly spaced samples,
``n = min(max(1, duration/60 * per_min), max_n)``).

Swap ``_decode_video_stub``/``_decode_audio_stub`` for pyav/ffmpeg/torchaudio
calls in a real deployment; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

VIDEO_SCHEMA = (
    "media_id string, bytes binary, duration_s double, fps int, w int, h int, fmt string"
)
FRAME_SCHEMA = (
    "media_id string, frame_idx int, ts_s double, frame_png binary, phash long"
)
AUDIO_FEATURE_SCHEMA = (
    "media_id string, n_windows int, rms array<float>, zero_cross array<float>"
)

VIDEO_CODEC_AVAILABLE = False  # flipped when a real decoder is wired in


def sample_timestamps(duration_s: float, per_minute: float = 1.0, max_n: int = 4) -> list[float]:
    """Frame-sampling rule (reference thumbnail_enricher.py:51-52): clamp
    count to [1, max_n], place samples evenly, excluding the endpoints."""
    n = int(min(max(1, duration_s / 60.0 * per_minute), max_n))
    return [duration_s * (i + 1) / (n + 1) for i in range(n)]


def _decode_video_stub(data: bytes, ts_s: float, w: int, h: int) -> np.ndarray:
    """Deterministic fake decoder: a frame derived from (content hash, ts).

    Raises if a caller expects real pixels from real video bytes —
    the deterministic fake is only valid for the synthetic fixtures."""
    if VIDEO_CODEC_AVAILABLE:
        raise NotImplementedError("wire pyav/ffmpeg decode here")
    seed = int.from_bytes(hashlib.md5(data[:64] + str(round(ts_s, 3)).encode()).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(min(h, 64), min(w, 64), 3), dtype=np.uint8)


def _decode_audio_stub(data: bytes, n_windows: int) -> np.ndarray:
    """Deterministic fake PCM windows derived from the content hash."""
    seed = int.from_bytes(hashlib.md5(data[:64]).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_windows, 256)).astype(np.float32)


def extract_frames(videos: DataFrame, per_minute: float = 1.0, max_n: int = 4) -> DataFrame:
    """One row per sampled frame: video table -> (media_id, frame_idx, ts,
    frame_png, phash). Arrow-batched; per-partition decoder state initializes
    once (the mapInPandas iterator form, like the fetch UDF)."""
    from ..functions.codec import dhash64, png_encode  # noqa: PLC0415

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decoder/session init would happen here, once per partition
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                for idx, ts in enumerate(
                    sample_timestamps(float(row.duration_s), per_minute, max_n)
                ):
                    frame = _decode_video_stub(bytes(row.bytes), ts, row.w, row.h)
                    out.append(
                        {
                            "media_id": row.media_id,
                            "frame_idx": idx,
                            "ts_s": round(ts, 3),
                            "frame_png": png_encode(frame),
                            "phash": dhash64(frame),
                        }
                    )
            yield pd.DataFrame.from_records(out) if out else pd.DataFrame(
                {"media_id": pd.Series(dtype="object"),
                 "frame_idx": pd.Series(dtype="int32"),
                 "ts_s": pd.Series(dtype="float64"),
                 "frame_png": pd.Series(dtype="object"),
                 "phash": pd.Series(dtype="int64")}
            )

    return videos.mapInPandas(gen, FRAME_SCHEMA)


def extract_audio_features(audio: DataFrame, n_windows: int = 8) -> DataFrame:
    """Windowed RMS + zero-crossing-rate per clip (cheap, deterministic
    features over the fake PCM; the real decoder slots into the stub)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                pcm = _decode_audio_stub(bytes(row.bytes), n_windows)
                rms = np.sqrt((pcm**2).mean(axis=1))
                zc = (np.diff(np.signbit(pcm), axis=1) != 0).mean(axis=1)
                out.append(
                    {
                        "media_id": row.media_id,
                        "n_windows": n_windows,
                        "rms": [float(x) for x in rms],
                        "zero_cross": [float(x) for x in zc],
                    }
                )
            yield pd.DataFrame.from_records(out)

    return audio.mapInPandas(gen, AUDIO_FEATURE_SCHEMA)


def synthetic_videos_df(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic fake video table (bytes = opaque seeded blobs)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(1000 + i)
                rows.append(
                    {
                        "media_id": f"vid_{i:06d}",
                        "bytes": rng.integers(0, 256, 4096, dtype=np.uint8).tobytes(),
                        "duration_s": float(10 + (i * 37) % 400),
                        "fps": 25,
                        "w": 640,
                        "h": 360,
                        "fmt": "mp4",
                    }
                )
            yield pd.DataFrame.from_records(rows)

    return spark.range(0, n, numPartitions=partitions).mapInPandas(gen, VIDEO_SCHEMA)
