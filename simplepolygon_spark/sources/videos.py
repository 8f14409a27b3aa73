"""Deterministic fake video source (multimodal plumbing, brief item
"frame-sample").

The sandbox has no video codecs, so — exactly like the image table's
SPIM format (`sources/images.py`) — videos use a deterministic fake
container that keeps the Spark-side contract real: an opaque `binary`
column with typed metadata, an index-seekable layout so frame sampling
decodes ONLY the sampled frames, and per-frame payloads that are valid
SPIM images (fmt 'rle'), making sampled frames directly composable with
the image payload operators (decode_features / validate_payload).
Real containers (mp4/h264) raise NotImplementedError — honest stubs,
never faked.

SVID container layout (little-endian):
  magic  b"SVID"
  w, h   int32 ×2
  n      int32 frame count
  table  n × int32 frame payload byte lengths   <- the seek index
  frames n × RLE(pixels)                        <- same RLE as images
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .images import MAGIC as IMG_MAGIC
from .images import pixels_of, rle_decode, rle_encode

VIDEO_MAGIC = b"SVID"

VIDEOS_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
    ]
)

_FRAME_SEED_STRIDE = 100_000  # frame f of video i -> pixels_of(i*stride+f)


def frame_pixels(video_idx: int, frame_idx: int, w: int, h: int) -> np.ndarray:
    """Ground-truth pixels of one frame (shared with tests)."""
    return pixels_of(video_idx * _FRAME_SEED_STRIDE + frame_idx, w, h)


def encode_video(video_idx: int, w: int = 32, h: int = 24, n_frames: int = 12) -> bytes:
    frames = [
        rle_encode(frame_pixels(video_idx, f, w, h)) for f in range(n_frames)
    ]
    header = (
        VIDEO_MAGIC
        + np.int32(w).tobytes()
        + np.int32(h).tobytes()
        + np.int32(n_frames).tobytes()
        + np.asarray([len(p) for p in frames], np.int32).tobytes()
    )
    return header + b"".join(frames)


def video_header(data: bytes) -> tuple[int, int, int, np.ndarray, int]:
    """(w, h, n_frames, length_table, frames_start_offset)."""
    if data[:4] != VIDEO_MAGIC:
        raise ValueError("bad SVID magic")
    w, h, n = (int(x) for x in np.frombuffer(data[4:16], np.int32))
    table = np.frombuffer(data[16 : 16 + 4 * n], np.int32)
    return w, h, n, table, 16 + 4 * n


def decode_frame(data: bytes, frame_idx: int, fmt: str = "svid") -> np.ndarray:
    """Decode ONE frame by seeking the length table — bytes of other
    frames are never touched (tests prove this by corrupting them)."""
    if fmt != "svid":
        raise NotImplementedError(f"fmt={fmt!r}: no video codec in this environment")
    w, h, n, table, off = video_header(data)
    if not (0 <= frame_idx < n):
        raise IndexError(f"frame {frame_idx} of {n}")
    start = off + int(table[:frame_idx].sum())
    payload = data[start : start + int(table[frame_idx])]
    return rle_decode(payload).reshape(h, w, 3)


def frame_to_spim(data: bytes, frame_idx: int, w: int, h: int) -> bytes:
    """Re-wrap one frame's (already-RLE) payload as a SPIM 'rle' image
    WITHOUT decoding it — pure byte slicing, so sampling is O(sampled
    frames) decode work and O(1) per skipped frame."""
    _, _, n, table, off = video_header(data)
    if not (0 <= frame_idx < n):
        raise IndexError(f"frame {frame_idx} of {n}")
    start = off + int(table[:frame_idx].sum())
    payload = data[start : start + int(table[frame_idx])]
    return IMG_MAGIC + np.int32(w).tobytes() + np.int32(h).tobytes() + payload


def videos_df(
    spark: SparkSession,
    n: int,
    n_frames: int = 12,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation of N videos (mapInArrow —
    bytes are produced where the row lives, nothing is collected)."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)
    arrow_schema = pa.schema(
        [
            pa.field("video_id", pa.string()),
            pa.field("bytes", pa.binary()),
            pa.field("w", pa.int32()),
            pa.field("h", pa.int32()),
            pa.field("n_frames", pa.int32()),
            pa.field("fmt", pa.string()),
            pa.field("caption", pa.string()),
        ]
    )

    def gen(batches):
        for batch in batches:
            idxs = batch.column("id").to_numpy(zero_copy_only=False)
            rows = {k: [] for k in arrow_schema.names}
            for i in idxs:
                i = int(i)
                w, h = (32, 24) if i % 2 else (48, 32)
                rows["video_id"].append(f"vid{i:09d}")
                rows["bytes"].append(encode_video(i, w, h, n_frames))
                rows["w"].append(w)
                rows["h"].append(h)
                rows["n_frames"].append(n_frames)
                rows["fmt"].append("svid")
                rows["caption"].append(f"clip number {i}")
            yield pa.RecordBatch.from_arrays(
                [pa.array(rows[f.name], f.type) for f in arrow_schema],
                schema=arrow_schema,
            )

    return spark.range(n, numPartitions=partitions).toDF("id").mapInArrow(
        gen, VIDEOS_SCHEMA
    )
