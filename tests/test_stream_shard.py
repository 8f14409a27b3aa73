"""Incremental shard writer (shard_append_batch / start_shard_append):
the in-stream twin of sampling.shuffle_shards.

Contracts under test: single-batch stream ≡ batch operator bit-for-bit;
multi-batch positions continue per shard with no collisions; replay of
a batch is idempotent (same rows, same state); geometry changes on a
live store fail loudly.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from simplepolygon_spark.operators.sampling import shuffle_shards
from simplepolygon_spark.streaming.feed import (
    shard_append_batch,
    start_shard_append,
)


def _pdf(lo, hi):
    return pd.DataFrame(
        [(i, f"text {i}") for i in range(lo, hi)], columns=["doc_id", "text"]
    )


def test_single_batch_stream_equals_batch_operator(spark, tmp_path):
    pdf = _pdf(0, 80)
    feed_dir = str(tmp_path / "feed")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(feed_dir)
    st = spark.readStream.schema("doc_id long, text string").parquet(feed_dir)
    out_dir = str(tmp_path / "out")
    q = start_shard_append(
        st, out_dir, str(tmp_path / "state"), str(tmp_path / "ckpt"), n_shards=4
    )
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.shard, r.pos)
        for r in spark.read.parquet(out_dir)
        .select("doc_id", "shard", "pos")
        .collect()
    }
    exp = {
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_shards(spark.createDataFrame(pdf), n_shards=4).collect()
    }
    assert got == exp and len(got) == 80


def test_positions_continue_across_batches(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    b1 = spark.createDataFrame(_pdf(0, 50))
    b2 = spark.createDataFrame(_pdf(50, 120))
    shard_append_batch(b1, 0, out_dir, state_dir, n_shards=4)
    shard_append_batch(b2, 1, out_dir, state_dir, n_shards=4)

    landed = spark.read.parquet(out_dir)
    assert landed.count() == 120
    # per shard: positions are exactly 0..n-1 (contiguous, no collisions)
    for r in (
        landed.groupBy("shard")
        .agg(
            F.count("*").alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("d"),
        )
        .collect()
    ):
        assert r.lo == 0 and r.hi == r.n - 1 and r.d == r.n
    # batch-1 docs kept their original addresses (append never rewrites)
    first = {
        (r.doc_id, r.shard, r.pos)
        for r in shuffle_shards(b1, n_shards=4).collect()
    }
    now = {
        (r.doc_id, r.shard, r.pos)
        for r in landed.where(F.col("doc_id") < 50)
        .select("doc_id", "shard", "pos")
        .collect()
    }
    assert now == first
    # shard assignment is arrival-time independent: equals the batch
    # operator's shards on the union (positions differ by design)
    all_docs = spark.createDataFrame(_pdf(0, 120))
    exp_shards = {
        (r.doc_id, r.shard) for r in shuffle_shards(all_docs, n_shards=4).collect()
    }
    got_shards = {(r.doc_id, r.shard) for r in landed.collect()}
    assert got_shards == exp_shards


def test_replay_is_idempotent(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    b1 = spark.createDataFrame(_pdf(0, 40))
    b2 = spark.createDataFrame(_pdf(40, 90))
    shard_append_batch(b1, 0, out_dir, state_dir, n_shards=4)
    shard_append_batch(b2, 1, out_dir, state_dir, n_shards=4)
    before = sorted(
        (r.doc_id, r.shard, r.pos) for r in spark.read.parquet(out_dir).collect()
    )
    shard_append_batch(b2, 1, out_dir, state_dir, n_shards=4)  # replay
    after = sorted(
        (r.doc_id, r.shard, r.pos) for r in spark.read.parquet(out_dir).collect()
    )
    assert after == before
    # and a THIRD batch still continues from the right counts
    shard_append_batch(spark.createDataFrame(_pdf(90, 100)), 2, out_dir, state_dir, n_shards=4)
    landed = spark.read.parquet(out_dir)
    for r in (
        landed.groupBy("shard")
        .agg(F.count("*").alias("n"), F.max("pos").alias("hi"))
        .collect()
    ):
        assert r.hi == r.n - 1


def test_geometry_change_fails_loudly(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    state_dir = str(tmp_path / "state")
    b1 = spark.createDataFrame(_pdf(0, 10))
    shard_append_batch(b1, 0, out_dir, state_dir, n_shards=4)
    with pytest.raises(Exception, match="store_meta|meta|geometry|n_shards"):
        shard_append_batch(
            spark.createDataFrame(_pdf(10, 20)), 1, out_dir, state_dir, n_shards=8
        )
