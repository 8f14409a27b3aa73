"""Video frame sampling (multimodal brief item "frame-sample").

``sample_frames`` turns a video table (opaque `binary` column, SVID
container — sources/videos.py) into image-table rows: one row per
sampled frame, with SPIM 'rle' bytes directly consumable by the image
payload operators (decode_features / resize_images / validate-style
gates).  Sampling is pure byte surgery — the length table in the
container header lets each sampled frame's payload be SLICED out and
re-headered without decoding it, and skipped frames' bytes are never
touched (proven by a corrupted-frame test).

Plan shape: one scan of the video table → mapInArrow → narrow image
rows.  Zero shuffle; video bytes never leave the stage that read them
(the cardinal byte-column rule, SCALE.md).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_indices(n_frames: int, n_samples: int) -> list[int]:
    """Evenly-spaced deterministic frame indices (first frame always
    included; never more than n_frames)."""
    k = min(n_samples, n_frames)
    return sorted({j * n_frames // k for j in range(k)})


def sample_frames(videos: DataFrame, n_samples: int = 4) -> DataFrame:
    """(image_id, video_id, frame_idx, bytes, w, h, fmt, caption) — one
    image row per sampled frame.  ``image_id`` is ``{video_id}#{idx}``
    so downstream image operators keep a unique key."""
    from ..sources.videos import frame_to_spim, video_header

    schema = (
        "image_id string, video_id string, frame_idx int, bytes binary, "
        "w int, h int, fmt string, caption string"
    )

    def run(batches):
        for batch in batches:
            vids = batch.column("video_id").to_pylist()
            bts = batch.column("bytes").to_pylist()
            fmts = batch.column("fmt").to_pylist()
            caps = batch.column("caption").to_pylist()
            out = {k: [] for k in (
                "image_id", "video_id", "frame_idx", "bytes", "w", "h", "fmt", "caption"
            )}
            for vid, data, fmt, cap in zip(vids, bts, fmts, caps):
                if fmt != "svid":
                    raise NotImplementedError(
                        f"fmt={fmt!r}: no video codec in this environment"
                    )
                w, h, n, _, _ = video_header(data)
                for idx in sample_indices(n, n_samples):
                    out["image_id"].append(f"{vid}#{idx}")
                    out["video_id"].append(vid)
                    out["frame_idx"].append(idx)
                    out["bytes"].append(frame_to_spim(data, idx, w, h))
                    out["w"].append(w)
                    out["h"].append(h)
                    out["fmt"].append("rle")
                    out["caption"].append(cap)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["image_id"], pa.string()),
                    pa.array(out["video_id"], pa.string()),
                    pa.array(out["frame_idx"], pa.int32()),
                    pa.array(out["bytes"], pa.binary()),
                    pa.array(out["w"], pa.int32()),
                    pa.array(out["h"], pa.int32()),
                    pa.array(out["fmt"], pa.string()),
                    pa.array(out["caption"], pa.string()),
                ],
                names=list(out),
            )

    # NULL bytes carry no frames — exclude SQL-side (the header parse
    # would crash the worker); a present-but-corrupt container still
    # raises, caught by validate-first pipelines
    return (
        videos.select("video_id", "bytes", "fmt", "caption")
        .where(F.col("bytes").isNotNull())
        .mapInArrow(run, schema)
    )
