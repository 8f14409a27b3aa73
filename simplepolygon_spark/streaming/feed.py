"""Streaming image-feed operators.

The batch engine's pipeline is snapshot-based (resume via the lineage
log); when the image table arrives as a *feed* instead, these operators
give the streaming path:

  read_image_feed      — file-source stream with the images schema
  dedupe_feed          — drop duplicate image_ids within a watermark
                         (late re-deliveries beyond the watermark age out)
  windowed_feed_stats  — per event-time window ingest metrics
  stream_tile_assign   — PIP tile assignment on the stream: the same
                         broadcast interval index + Arrow batch kernel as
                         the batch path (foreachBatch would be used for
                         lineage writes; here the transformation itself is
                         stream-safe because it is stateless per row)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.images import IMAGES_SCHEMA


def read_image_feed(spark: SparkSession, path: str, with_ts: bool = True) -> DataFrame:
    """File-source stream over a directory of image-table parquet files."""
    st = spark.readStream.schema(IMAGES_SCHEMA).parquet(path)
    if with_ts:
        # deterministic event time derived from the id (no wall clock):
        # one second per 1000 images starting 2026-01-01
        st = st.withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1767225600)
                + (F.substring("image_id", 4, 9).cast("long") / 1000).cast("long")
            ),
        )
    return st


def dedupe_feed(feed: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once-per-image within the watermark horizon."""
    return feed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["image_id"]
    )


def windowed_feed_stats(feed: DataFrame, window: str = "1 minute") -> DataFrame:
    """Per event-time window: row count + byte volume (append mode)."""
    return (
        feed.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.length("bytes")).alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_images",
            "n_bytes",
        )
    )


def stream_tile_assign(feed: DataFrame, index_bc) -> DataFrame:
    """Streaming PIP tile assignment — same kernel as the batch join."""
    from ..operators.tiling import pip_join

    return pip_join(feed, index_bc)


def dedupe_near_feed(doc_feed: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming near-duplicate suppression for a document feed
    (doc_id, text, ts): each micro-batch computes the 64-bit SimHash
    with the SAME vectorized kernel as the batch operator (stateless
    per row — stream-safe), then drops signature-equal re-posts within
    the watermark horizon.

    Signature equality catches token-identical and near-identical
    re-posts (the dominant streaming dup mode); banded hamming>0
    matching needs multi-key LSH membership, which is not expressible
    as one dropDuplicates key — that remains the batch job
    (operators.dedup.simhash_dup_pairs) run over the landed table."""
    import numpy as np
    import pyarrow as pa

    from ..operators.dedup import simhash_of_texts

    schema = "doc_id long, text string, ts timestamp, simhash long"

    def run(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            sig = simhash_of_texts(batch.column("text").to_pylist())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("text"),
                    batch.column("ts"),
                    pa.array(sig.view(np.int64), pa.int64()),
                ],
                names=["doc_id", "text", "ts", "simhash"],
            )

    sigs = doc_feed.select("doc_id", "text", "ts").mapInArrow(run, schema)
    return sigs.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["simhash"]
    )
