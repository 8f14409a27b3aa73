"""Video frame sampling: container round-trip, seek-only decode (bytes
of skipped frames never touched), composition with the image payload
operators, and the honest-codec-stub contract."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from simplepolygon_spark.operators.frames import sample_frames, sample_indices
from simplepolygon_spark.operators.payload import decode_features
from simplepolygon_spark.sources.images import decode_image
from simplepolygon_spark.sources.videos import (
    decode_frame,
    encode_video,
    frame_pixels,
    video_header,
    videos_df,
)


def test_sample_indices():
    assert sample_indices(12, 4) == [0, 3, 6, 9]
    assert sample_indices(5, 10) == [0, 1, 2, 3, 4]  # capped at n_frames
    assert sample_indices(7, 1) == [0]


def test_video_container_round_trip():
    data = encode_video(3, w=32, h=24, n_frames=5)
    w, h, n, table, off = video_header(data)
    assert (w, h, n) == (32, 24, 5)
    assert off + int(table.sum()) == len(data)
    for f in range(5):
        assert (decode_frame(data, f) == frame_pixels(3, f, 32, 24)).all()
    # out-of-range and negative indices fail loudly on BOTH entry points
    # (frame_to_spim used to slice silently and emit a corrupt SPIM)
    from simplepolygon_spark.sources.videos import frame_to_spim

    for bad in (-1, 5):
        with pytest.raises(IndexError):
            decode_frame(data, bad)
        with pytest.raises(IndexError):
            frame_to_spim(data, bad, 32, 24)


def test_decode_frame_never_touches_skipped_frames():
    """Corrupt every byte of frame 2's payload: frames 0/1/3/4 must
    still decode bit-exact — the length-table seek skips frame 2's
    bytes entirely."""
    data = bytearray(encode_video(7, w=32, h=24, n_frames=5))
    w, h, n, table, off = video_header(bytes(data))
    s = off + int(table[:2].sum())
    e = s + int(table[2])
    data[s:e] = b"\xff" * (e - s)
    data = bytes(data)
    for f in (0, 1, 3, 4):
        assert (decode_frame(data, f) == frame_pixels(7, f, 32, 24)).all()
    with pytest.raises(Exception):
        # frame 2 is garbage RLE: wrong decoded length -> reshape fails
        decode_frame(data, 2)


def test_unsupported_container_raises():
    with pytest.raises(NotImplementedError, match="h264"):
        decode_frame(b"whatever", 0, fmt="h264")


def test_sample_frames_emits_valid_image_rows(spark):
    vids = videos_df(spark, 20, n_frames=12, partitions=4)
    rows = sample_frames(vids, n_samples=4).collect()
    assert len(rows) == 80  # 20 videos x 4 frames
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r.video_id, []).append(r.frame_idx)
        # each emitted row is a decodable SPIM image equal to the
        # ground-truth frame pixels
        vidx = int(r.video_id[3:])
        px = decode_image(bytes(r.bytes), r.fmt)
        assert (px == frame_pixels(vidx, r.frame_idx, r.w, r.h)).all()
        assert r.image_id == f"{r.video_id}#{r.frame_idx}"
    assert all(sorted(v) == [0, 3, 6, 9] for v in by_vid.values())


def test_sampled_frames_compose_with_image_operators(spark):
    """The whole point of emitting SPIM rows: decode_features consumes
    sampled frames unchanged, and the plan stays shuffle-free."""
    vids = videos_df(spark, 10, n_frames=6, partitions=2)
    frames = sample_frames(vids, n_samples=2)
    feats = decode_features(frames)
    got = feats.collect()
    assert len(got) == 20
    assert all(0 <= r.mean_r <= 255 for r in got)
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # video bytes never shuffle
