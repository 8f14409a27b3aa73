"""Deterministic image embeddings + composed visual near-dedup.

image_embeddings is the bridge from the binary image column into the
embeddings-table shape; image_dup_pairs_embedding composes it with the
SRP-LSH dedup machinery unchanged.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from simplepolygon_spark.operators.payload import (
    image_dup_pairs_embedding,
    image_embeddings,
)
from simplepolygon_spark.sources.images import (
    MAGIC,
    images_df,
    pixels_of,
    quantize,
)


def _emb_map(df):
    return {
        r.image_id: np.asarray(r.embedding, dtype=np.float64)
        for r in df.collect()
    }


def test_embeddings_unit_norm_and_shape(spark):
    emb = image_embeddings(images_df(spark, 40, partitions=3), dim=32)
    m = _emb_map(emb)
    assert len(m) == 40
    for v in m.values():
        assert v.shape == (32,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-6


def test_embeddings_deterministic_across_partitionings(spark):
    imgs = images_df(spark, 30, partitions=2)
    a = _emb_map(image_embeddings(imgs, dim=48))
    b = _emb_map(image_embeddings(imgs.repartition(7), dim=48))
    assert a.keys() == b.keys()
    for k in a:
        assert np.max(np.abs(a[k] - b[k])) < 1e-12


def _with_twins(spark, n, twin_ids, lossy=False):
    """images_df(n) plus byte-level (or lossy qnt re-encode) twins of
    the given image indices under new ids 'twin<i>'."""
    imgs = images_df(spark, n, partitions=2)
    rows = {
        int(r.image_id[3:]): r
        for r in imgs.where(
            F.col("image_id").isin([f"img{i:09d}" for i in twin_ids])
        ).collect()
    }
    twins = []
    for i in twin_ids:
        r = rows[i]
        if lossy:
            px = pixels_of(i, r.w, r.h)
            header = MAGIC + np.int32(r.w).tobytes() + np.int32(r.h).tobytes()
            data, fmt = header + quantize(px).tobytes(), "qnt"
        else:
            data, fmt = bytes(r.bytes), r.fmt
        twins.append((f"twin{i}", data, r.w, r.h, fmt))
    tdf = spark.createDataFrame(
        twins, "image_id string, bytes binary, w int, h int, fmt string"
    )
    return imgs.select("image_id", "bytes", "w", "h", "fmt").unionByName(tdf)


def test_exact_dup_images_found_at_cosine_one(spark):
    """Byte-identical twins collide in every SRP band — recall 1 —
    and verify at cosine ~1; no organic pair reaches 0.98."""
    twin_ids = [1, 2, 3, 7, 11]
    corpus = _with_twins(spark, 50, twin_ids, lossy=False)
    pairs = image_dup_pairs_embedding(corpus, threshold=0.98).collect()
    got = {tuple(sorted((r.vec_a, r.vec_b))) for r in pairs}
    want = {tuple(sorted((f"img{i:09d}", f"twin{i}"))) for i in twin_ids}
    assert want <= got
    for r in pairs:
        if tuple(sorted((r.vec_a, r.vec_b))) in want:
            assert r.cosine > 1 - 1e-9
    # nothing unrelated sneaks in at this threshold on this corpus
    assert got == want


def test_lossy_reencode_twin_is_near_dup(spark):
    """A qnt (2-bit-quantized) re-encode of the same pixels is what a
    real pipeline sees as 'same image, different file' — it must land
    at cosine ≈ 1 and surface as a near-dup pair."""
    twin_ids = [4, 8]  # raw/rle originals (qnt is i % 5 == 0)
    corpus = _with_twins(spark, 30, twin_ids, lossy=True)
    pairs = image_dup_pairs_embedding(corpus, threshold=0.95).collect()
    got = {tuple(sorted((r.vec_a, r.vec_b))): r.cosine for r in pairs}
    for i in twin_ids:
        key = tuple(sorted((f"img{i:09d}", f"twin{i}")))
        assert key in got
        assert got[key] > 0.999  # quantization error is tiny vs signal


def test_lsh_pairs_subset_of_brute_force(spark):
    """The LSH path never invents a pair: every (a, b, cosine) it
    returns also passes the brute-force all-pairs threshold check."""
    from simplepolygon_spark.operators.dedup import embedding_dup_pairs

    corpus = _with_twins(spark, 40, [5, 9], lossy=False)
    emb = (
        image_embeddings(corpus)
        .withColumnRenamed("image_id", "vec_id")
        .withColumn("blk", F.lit(1))
    )
    brute = {
        tuple(sorted((r.vec_a, r.vec_b)))
        for r in embedding_dup_pairs(emb, threshold=0.9, block_col="blk").collect()
    }
    lsh = {
        tuple(sorted((r.vec_a, r.vec_b)))
        for r in image_dup_pairs_embedding(corpus, threshold=0.9).collect()
    }
    assert lsh <= brute
    # and the planted exact dups are in both
    assert {("img000000005", "twin5"), ("img000000009", "twin9")} <= lsh
