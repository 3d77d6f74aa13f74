"""Multimodal plumbing: frame-sampling math (O4 rule), schema/batch shapes of
the video/audio UDFs, determinism of the stubbed decode."""

import pytest

from auto_archiver_spark.operators.multimodal import (
    extract_audio_features,
    extract_frames,
    sample_timestamps,
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


@pytest.fixture(scope="module")
def videos(spark):
    return synthetic_videos_df(spark, 12, partitions=3).localCheckpoint()


def test_extract_frames_schema_and_counts(spark, videos):
    frames = extract_frames(videos)
    assert frames.schema.simpleString() == (
        "struct<media_id:string,frame_idx:int,ts_s:double,frame_png:binary,phash:bigint>"
    )
    rows = frames.collect()
    durs = {r.media_id: r.duration_s for r in videos.collect()}
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.media_id, []).append(r)
    for vid, fr in by_vid.items():
        assert len(fr) == len(sample_timestamps(durs[vid]))
        assert sorted(f.frame_idx for f in fr) == list(range(len(fr)))
        for f in fr:
            assert bytes(f.frame_png).startswith(b"\x89PNG")


def test_extract_frames_deterministic(spark, videos):
    a = {(r.media_id, r.frame_idx): (bytes(r.frame_png), r.phash)
         for r in extract_frames(videos).collect()}
    b = {(r.media_id, r.frame_idx): (bytes(r.frame_png), r.phash)
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
