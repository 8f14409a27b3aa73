"""Deterministic fake audio source (multimodal plumbing: the audio leg
of the image/audio/video triple).

Same honesty contract as SPIM images and SVID videos: the sandbox has
no audio codecs, so clips use a deterministic fake container that keeps
the Spark-side contract real — an opaque `binary` column with typed
metadata and a fixed-width PCM payload, so segment extraction is O(1)
byte arithmetic (never touching bytes outside the segment).  Real
codecs (mp3/flac/ogg) raise NotImplementedError.

SAUD container layout (little-endian):
  magic        b"SAUD"
  sample_rate  int32
  n_samples    int32
  payload      n_samples × int16 PCM mono
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

AUDIO_MAGIC = b"SAUD"

AUDIO_SCHEMA = StructType(
    [
        StructField("clip_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
    ]
)


def clip_samples(clip_idx: int, n_samples: int, sample_rate: int) -> np.ndarray:
    """Ground-truth int16 PCM of one clip: a deterministic tone mix +
    seeded noise (shared with tests)."""
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    f0 = 110.0 * (1 + clip_idx % 7)
    wave = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 2.5 * f0 * t)
    rng = np.random.default_rng(7_000_003 + clip_idx)
    wave += 0.05 * rng.standard_normal(n_samples)
    return np.clip(wave * 20000, -32768, 32767).astype(np.int16)


def encode_audio(clip_idx: int, sample_rate: int = 8000, n_samples: int = 8000) -> bytes:
    pcm = clip_samples(clip_idx, n_samples, sample_rate)
    return (
        AUDIO_MAGIC
        + np.int32(sample_rate).tobytes()
        + np.int32(n_samples).tobytes()
        + pcm.tobytes()
    )


def audio_header(data: bytes) -> tuple[int, int, int]:
    """(sample_rate, n_samples, payload_offset)."""
    if data[:4] != AUDIO_MAGIC:
        raise ValueError("bad SAUD magic")
    sr, n = (int(x) for x in np.frombuffer(data[4:12], np.int32))
    return sr, n, 12


def decode_audio(data: bytes, fmt: str = "saud") -> tuple[np.ndarray, int]:
    """(int16 samples, sample_rate).  Unknown codecs raise — never faked."""
    if fmt != "saud":
        raise NotImplementedError(f"fmt={fmt!r}: no audio codec in this environment")
    sr, n, off = audio_header(data)
    return np.frombuffer(data[off : off + 2 * n], np.int16), sr


def slice_segment(data: bytes, start_sample: int, n: int) -> bytes:
    """Re-wrap a sample range as a standalone SAUD clip by pure byte
    arithmetic — fixed-width PCM means O(1) seek and bytes outside the
    segment are never read (the video frame_to_spim analogue)."""
    sr, total, off = audio_header(data)
    if not (0 <= start_sample and 0 <= n and start_sample + n <= total):
        raise IndexError(f"segment [{start_sample}, {start_sample + n}) of {total}")
    seg = data[off + 2 * start_sample : off + 2 * (start_sample + n)]
    return AUDIO_MAGIC + np.int32(sr).tobytes() + np.int32(n).tobytes() + seg


def audio_df(
    spark: SparkSession,
    n: int,
    sample_rate: int = 8000,
    n_samples: int = 8000,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation of N clips (mapInArrow)."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)
    arrow_schema = pa.schema(
        [
            pa.field("clip_id", pa.string()),
            pa.field("bytes", pa.binary()),
            pa.field("sample_rate", pa.int32()),
            pa.field("n_samples", pa.int32()),
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
                rows["clip_id"].append(f"aud{i:09d}")
                rows["bytes"].append(encode_audio(i, sample_rate, n_samples))
                rows["sample_rate"].append(sample_rate)
                rows["n_samples"].append(n_samples)
                rows["fmt"].append("saud")
                rows["caption"].append(f"clip number {i}")
            yield pa.RecordBatch.from_arrays(
                [pa.array(rows[f.name], f.type) for f in arrow_schema],
                schema=arrow_schema,
            )

    return spark.range(n, numPartitions=partitions).toDF("id").mapInArrow(
        gen, AUDIO_SCHEMA
    )
