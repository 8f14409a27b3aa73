"""Audio payload path: container round-trip, O(1) segment slicing
(bytes outside the segment never read), vectorized features vs numpy
ground truth, honest codec stubs, shuffle-free plans."""

from __future__ import annotations

import numpy as np
import pytest

from simplepolygon_spark.operators.audio_ops import audio_features, sample_segments
from simplepolygon_spark.sources.audio import (
    audio_df,
    clip_samples,
    decode_audio,
    encode_audio,
    slice_segment,
)


def test_audio_round_trip():
    data = encode_audio(5, sample_rate=8000, n_samples=4000)
    pcm, sr = decode_audio(data)
    assert sr == 8000 and len(pcm) == 4000
    assert (pcm == clip_samples(5, 4000, 8000)).all()


def test_slice_segment_never_reads_outside():
    """Corrupt all bytes before/after the segment window: the sliced
    segment must still equal ground truth exactly."""
    data = bytearray(encode_audio(9, sample_rate=8000, n_samples=4000))
    start, n = 1000, 500
    lo, hi = 12 + 2 * start, 12 + 2 * (start + n)
    data[12:lo] = b"\xee" * (lo - 12)
    data[hi:] = b"\xee" * (len(data) - hi)
    seg = slice_segment(bytes(data), start, n)
    pcm, sr = decode_audio(seg)
    assert (pcm == clip_samples(9, 4000, 8000)[start : start + n]).all()
    with pytest.raises(IndexError):
        slice_segment(bytes(data), 3900, 500)  # past the end
    with pytest.raises(IndexError):
        slice_segment(bytes(data), 5, -3)  # negative length: would emit
        # a SAUD header claiming n_samples=-3 over an empty payload


def test_unsupported_codec_raises():
    with pytest.raises(NotImplementedError, match="mp3"):
        decode_audio(b"whatever", fmt="mp3")


def test_audio_features_match_numpy(spark):
    clips = audio_df(spark, 12, sample_rate=8000, n_samples=2000, partitions=3)
    got = {r.clip_id: r for r in audio_features(clips).collect()}
    assert len(got) == 12
    for i in range(12):
        cid = f"aud{i:09d}"
        x = clip_samples(i, 2000, 8000).astype(np.float64)
        r = got[cid]
        assert r.duration_sec == pytest.approx(0.25)
        assert r.rms == pytest.approx(float(np.sqrt((x * x).mean())))
        assert r.peak == int(np.abs(x).max())
        zc = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
        assert r.zero_cross_rate == pytest.approx(zc)


def test_sample_segments_compose_and_stay_shuffle_free(spark):
    clips = audio_df(spark, 8, sample_rate=8000, n_samples=8000, partitions=2)
    segs = sample_segments(clips, n_segments=3, seg_samples=1600)
    rows = segs.collect()
    assert len(rows) == 24  # 8 clips x 3 segments
    for r in rows:
        i = int(r.clip_id[3:])
        pcm, sr = decode_audio(bytes(r.bytes))
        assert sr == 8000 and len(pcm) == r.n_samples == 1600
        truth = clip_samples(i, 8000, 8000)[r.start_sample : r.start_sample + 1600]
        assert (pcm == truth).all()
    # segments feed audio_features unchanged; plan has no Exchange
    feats = audio_features(
        segs.drop("clip_id", "start_sample").withColumnRenamed("segment_id", "clip_id")
    )
    assert feats.count() == 24
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
