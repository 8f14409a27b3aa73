"""Audio payload operators (multimodal brief: feature-extract +
segment-sample over an opaque audio `binary` column).

Same plan shape as the image/video payload path: one scan →
mapInArrow → narrow feature rows or re-wrapped segment clips; audio
bytes never shuffle (the cardinal byte-column rule, SCALE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def audio_features(clips: DataFrame) -> DataFrame:
    """(clip_id, duration_sec, rms, peak, zero_cross_rate) — vectorized
    per clip inside the Arrow batch (no per-sample Python)."""
    from ..sources.audio import decode_audio

    schema = (
        "clip_id string, duration_sec double, rms double, peak int, "
        "zero_cross_rate double"
    )

    def run(batches):
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            bts = batch.column("bytes").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            out = {k: [] for k in ("clip_id", "duration_sec", "rms", "peak", "zero_cross_rate")}
            for cid, data, fmt in zip(ids, bts, fmts):
                pcm, sr = decode_audio(data, fmt)
                x = pcm.astype(np.float64)
                out["clip_id"].append(cid)
                out["duration_sec"].append(len(pcm) / sr)
                out["rms"].append(float(np.sqrt((x * x).mean())) if len(x) else 0.0)
                # upcast before abs: np.abs(int16 -32768) overflows back
                # to -32768 and would report a wrong (negative) peak
                out["peak"].append(
                    int(np.abs(pcm.astype(np.int64)).max()) if len(pcm) else 0
                )
                zc = (np.signbit(x[1:]) != np.signbit(x[:-1])).mean() if len(x) > 1 else 0.0
                out["zero_cross_rate"].append(float(zc))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["clip_id"], pa.string()),
                    pa.array(out["duration_sec"], pa.float64()),
                    pa.array(out["rms"], pa.float64()),
                    pa.array(out["peak"], pa.int32()),
                    pa.array(out["zero_cross_rate"], pa.float64()),
                ],
                names=["clip_id", "duration_sec", "rms", "peak", "zero_cross_rate"],
            )

    # NULL bytes carry no audio — exclude SQL-side (header parse crash)
    return (
        clips.select("clip_id", "bytes", "fmt")
        .where(F.col("bytes").isNotNull())
        .mapInArrow(run, schema)
    )


def sample_segments(clips: DataFrame, n_segments: int = 3, seg_samples: int = 1600) -> DataFrame:
    """(segment_id, clip_id, start_sample, bytes, sample_rate,
    n_samples, fmt) — evenly-spaced fixed-length segments re-wrapped as
    standalone SAUD clips by pure byte arithmetic (fixed-width PCM:
    bytes outside a segment are never read), the audio analogue of
    video ``sample_frames``."""
    from ..sources.audio import audio_header, slice_segment

    schema = (
        "segment_id string, clip_id string, start_sample int, bytes binary, "
        "sample_rate int, n_samples int, fmt string"
    )

    def run(batches):
        for batch in batches:
            ids = batch.column("clip_id").to_pylist()
            bts = batch.column("bytes").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            out = {k: [] for k in (
                "segment_id", "clip_id", "start_sample", "bytes",
                "sample_rate", "n_samples", "fmt",
            )}
            for cid, data, fmt in zip(ids, bts, fmts):
                if fmt != "saud":
                    raise NotImplementedError(
                        f"fmt={fmt!r}: no audio codec in this environment"
                    )
                sr, total, _ = audio_header(data)
                k = min(n_segments, max(total // seg_samples, 1))
                span = max(total - seg_samples, 0)
                starts = sorted({j * span // max(k - 1, 1) for j in range(k)})
                for s in starts:
                    n = min(seg_samples, total - s)
                    out["segment_id"].append(f"{cid}#{s}")
                    out["clip_id"].append(cid)
                    out["start_sample"].append(s)
                    out["bytes"].append(slice_segment(data, s, n))
                    out["sample_rate"].append(sr)
                    out["n_samples"].append(n)
                    out["fmt"].append("saud")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["segment_id"], pa.string()),
                    pa.array(out["clip_id"], pa.string()),
                    pa.array(out["start_sample"], pa.int32()),
                    pa.array(out["bytes"], pa.binary()),
                    pa.array(out["sample_rate"], pa.int32()),
                    pa.array(out["n_samples"], pa.int32()),
                    pa.array(out["fmt"], pa.string()),
                ],
                names=list(out),
            )

    # NULL bytes carry no audio — exclude SQL-side (header parse crash)
    return (
        clips.select("clip_id", "bytes", "fmt")
        .where(F.col("bytes").isNotNull())
        .mapInArrow(run, schema)
    )
