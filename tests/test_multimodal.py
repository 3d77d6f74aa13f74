"""Multimodal plumbing: frame-sampling math (O4 rule), the REAL SFV1
container codec (write + parse + error categories), schema/batch shapes of
the video/audio UDFs, decode determinism."""

import numpy as np
import pytest

from auto_archiver_spark.operators.multimodal import (
    SFV_H,
    SFV_W,
    SfvError,
    extract_audio_features,
    extract_frames,
    sample_timestamps,
    sample_timestamps_ms,
    sfv_encode,
    sfv_parse,
    synthetic_plane,
    synthetic_sfv_payload,
    synthetic_videos_df,
)


@pytest.mark.parametrize(
    "dur,expected_n",
    [(10, 1), (59, 1), (120, 2), (240, 4), (2000, 4)],
)
def test_sample_count_rule(dur, expected_n):
    # reference thumbnail_enricher.py:51-52: min(max(1, dur/60), max_n)
    ts = sample_timestamps(dur, per_minute=1.0, max_n=4)
    assert len(ts) == expected_n
    assert all(0 < t < dur for t in ts)
    # evenly spaced
    gaps = [round(b - a, 6) for a, b in zip([0, *ts], [*ts, dur])]
    assert len(set(gaps)) == 1
    # integer-ms twin agrees up to the floor
    ms = sample_timestamps_ms(dur * 1000, per_minute=1.0, max_n=4)
    assert ms == [int(t * 1000) for t in ts]


def test_sfv_roundtrip():
    planes = [(0, synthetic_plane(5, 0)), (40_000, synthetic_plane(5, 1))]
    data = sfv_encode(SFV_W, SFV_H, 80_000, planes)
    w, h, dur, got = sfv_parse(data)
    assert (w, h, dur) == (SFV_W, SFV_H, 80_000)
    assert [ts for ts, _ in got] == [0, 40_000]
    for (_, want), (_, plane) in zip(planes, got):
        assert plane.shape == (SFV_H, SFV_W)
        assert plane.tobytes() == want


@pytest.mark.parametrize(
    "mutate,category",
    [
        (lambda b: b"XXXX" + b[4:], "bad_magic"),
        (lambda b: b[: len(b) // 2], "truncated"),
        (lambda b: b[:10], "truncated"),
        (lambda b: b"", "truncated"),
        # flip bytes inside the first zlib payload -> inflate fails
        (lambda b: b[:25] + bytes([b[25] ^ 0xFF, b[26] ^ 0xFF]) + b[27:], "corrupt"),
    ],
)
def test_sfv_parse_error_categories(mutate, category):
    data = synthetic_sfv_payload(7)
    with pytest.raises(SfvError) as ei:
        sfv_parse(mutate(data))
    assert ei.value.category == category


@pytest.fixture(scope="module")
def videos(spark):
    return synthetic_videos_df(spark, 12, partitions=3).localCheckpoint()


def test_extract_frames_schema_counts_and_luma(spark, videos):
    frames = extract_frames(videos)
    assert frames.schema.simpleString() == (
        "struct<media_id:string,frame_idx:int,ts_ms:bigint,key_idx:int,"
        "frame_png:binary,phash:bigint,sum_luma:bigint,err:string>"
    )
    rows = frames.collect()
    assert all(r.err is None for r in rows)
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.media_id, []).append(r)
    for vid, fr in by_vid.items():
        seed = int(vid.split("_")[1])
        duration_ms = (30 + (seed * 37) % 300) * 1000
        n_key = 1 + seed % 3
        ts_want = sample_timestamps_ms(duration_ms)
        assert sorted(f.frame_idx for f in fr) == list(range(len(ts_want)))
        for f in sorted(fr, key=lambda x: x.frame_idx):
            assert f.ts_ms == ts_want[f.frame_idx]
            # latest keyframe at-or-before the sample timestamp
            assert f.key_idx == max(
                k for k in range(n_key) if duration_ms * k // n_key <= f.ts_ms
            )
            # luma sum equals the closed-form plane sum (zlib round-trip exact)
            plane = np.frombuffer(
                synthetic_plane(seed, f.key_idx), dtype=np.uint8
            )
            assert f.sum_luma == int(plane.sum(dtype=np.int64))
            assert bytes(f.frame_png).startswith(b"\x89PNG")


def test_extract_frames_error_rows_not_failures(spark):
    import pandas as pd

    good = synthetic_sfv_payload(1)
    rows = [
        ("ok", good),
        ("magic", b"XXXX" + good[4:]),
        ("trunc", good[: len(good) // 2]),
        ("null", None),
        ("mp4ish", b"\x00\x00\x00 ftypisom-not-sfv-payload"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "bytes"]),
        "media_id string, bytes binary",
    )
    got = {r.media_id: r for r in extract_frames(df).collect() if r.frame_idx in (0, None)}
    assert got["ok"].err is None and got["ok"].sum_luma is not None
    assert got["magic"].err == "bad_magic" and got["magic"].frame_png is None
    assert got["trunc"].err == "truncated"
    assert got["null"].err == "truncated"
    assert got["mp4ish"].err == "bad_magic"  # where a pyav branch would slot in


def test_extract_frames_deterministic(spark, videos):
    a = {(r.media_id, r.frame_idx): (bytes(r.frame_png), r.phash, r.sum_luma)
         for r in extract_frames(videos).collect()}
    b = {(r.media_id, r.frame_idx): (bytes(r.frame_png), r.phash, r.sum_luma)
         for r in extract_frames(videos).collect()}
    assert a == b


def test_audio_features_shape(spark, videos):
    feats = extract_audio_features(videos, n_windows=8).collect()
    assert len(feats) == 12
    for r in feats:
        assert r.n_windows == 8
        assert len(r.rms) == 8 and len(r.zero_cross) == 8
        assert all(x >= 0 for x in r.rms)
        assert all(0 <= x <= 1 for x in r.zero_cross)


def test_extract_frames_keyframe_index_invariants(spark):
    # ADVICE r5: a parse-valid container whose earliest keyframe is LATER
    # than the first sampled timestamp crashed the task (empty max()).
    # sfv_parse now enforces ts0==0 / strictly-increasing / ts<=duration,
    # so these payloads become deterministic 'corrupt' error rows.
    import pandas as pd

    plane = synthetic_plane(3, 0)
    bad = [
        # single keyframe at 50s of a 60s clip: first sample ts is 30000
        sfv_encode(SFV_W, SFV_H, 60_000, [(50_000, plane)]),
        # unsorted keyframes
        sfv_encode(SFV_W, SFV_H, 60_000, [(0, plane), (40_000, plane), (20_000, plane)]),
        # duplicate timestamps
        sfv_encode(SFV_W, SFV_H, 60_000, [(0, plane), (0, plane)]),
        # keyframe beyond the declared duration
        sfv_encode(SFV_W, SFV_H, 60_000, [(0, plane), (70_000, plane)]),
    ]
    for b in bad:
        with pytest.raises(SfvError) as ei:
            sfv_parse(b)
        assert ei.value.category == "corrupt"
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [str(i) for i in range(len(bad))], "bytes": bad})
    )
    rows = extract_frames(df).collect()
    assert len(rows) == len(bad)
    assert all(r.err == "corrupt" and r.frame_idx is None for r in rows)
