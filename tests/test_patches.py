"""Patch extraction (ViT patchification) + corpus channel stats.

extract_patches / patch_grid share one window rule (the chunker's tail
rule, per axis); channel_stats must be EXACT — integer pixel sums make
it bit-identical under any partitioning.
"""

from __future__ import annotations

import numpy as np
import pytest

from simplepolygon_spark.operators.payload import (
    channel_stats,
    extract_patches,
    patch_grid,
)
from simplepolygon_spark.sources.images import decode_image, images_df


def _axis_starts(e: int, patch: int, stride: int) -> list[int]:
    """Reference re-derivation (used only by this test)."""
    if e <= patch:
        return [0]
    n = (e - patch + stride - 1) // stride + 1
    return [i * stride for i in range(n)]


def test_patch_grid_matches_extract_patches(spark):
    """The metadata-only grid and the pixel-side numpy loop agree
    row-for-row on (patch_index, px, py, pw, ph) — one rule."""
    imgs = images_df(spark, 60, partitions=3)
    grid = {
        tuple(r)
        for r in patch_grid(imgs, patch=8, stride=5)
        .select("image_id", "patch_index", "px", "py", "pw", "ph")
        .collect()
    }
    pix = {
        tuple(r)
        for r in extract_patches(imgs, patch=8, stride=5)
        .select("image_id", "patch_index", "px", "py", "pw", "ph")
        .collect()
    }
    assert grid == pix
    assert len(grid) > 60  # multiple patches per image


def test_patch_checksums_vs_independent_decode(spark):
    """Checksums equal an independent decode+slice on the driver."""
    imgs = images_df(spark, 25, partitions=2)
    rows = imgs.select("image_id", "bytes", "fmt").collect()
    expected = {}
    for r in rows:
        img = decode_image(bytes(r.bytes), r.fmt)
        h, w = img.shape[:2]
        k = 0
        for py in _axis_starts(h, 8, 8):
            for px in _axis_starts(w, 8, 8):
                sl = img[py : py + 8, px : px + 8]
                expected[(r.image_id, k)] = int(sl.sum(dtype=np.int64))
                k += 1
    got = {
        (r.image_id, r.patch_index): r.checksum
        for r in extract_patches(imgs, patch=8).collect()
    }
    assert got == expected


def test_patch_reconstruction_property(spark):
    """stride == patch tiles the image exactly: per-image checksum
    total == whole-image pixel sum, and patch areas tile w*h."""
    imgs = images_df(spark, 40, partitions=2)
    per_img = (
        extract_patches(imgs, patch=8)
        .groupBy("image_id")
        .agg({"checksum": "sum", "*": "count"})
        .withColumnRenamed("sum(checksum)", "total")
        .collect()
    )
    totals = {r.image_id: r.total for r in per_img}
    rows = imgs.select("image_id", "bytes", "fmt", "w", "h").collect()
    for r in rows:
        img = decode_image(bytes(r.bytes), r.fmt)
        assert totals[r.image_id] == int(img.sum(dtype=np.int64))
    # tiling: sum of pw*ph per image == w*h*? -> each pixel exactly once
    from pyspark.sql import functions as F

    tiled = (
        extract_patches(imgs, patch=8)
        .groupBy("image_id")
        .agg(F.sum(F.col("pw") * F.col("ph")).alias("covered"))
        .collect()
    )
    wh = {r.image_id: r.w * r.h for r in rows}
    for r in tiled:
        assert r.covered == wh[r.image_id]


def test_patch_grid_zero_shuffle_and_prunes_bytes(spark, tmp_path):
    """patch_grid is Exchange-free, and over a real parquet table the
    scan's ReadSchema excludes the bytes column (column pruning) —
    patchification planning never touches the payload."""
    imgs = images_df(spark, 30, partitions=2)
    plan = patch_grid(imgs, patch=8, stride=6)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    pq = str(tmp_path / "imgs")
    imgs.write.parquet(pq)
    onparq = patch_grid(spark.read.parquet(pq), patch=8, stride=6)
    scan = onparq._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in scan
    read_schema = [
        ln for ln in scan.splitlines() if "ReadSchema" in ln or "Scan parquet" in ln
    ]
    assert read_schema and all("bytes" not in ln for ln in read_schema)
    onparq.groupBy().count().collect()  # and it runs without the payload


def test_patch_args_validated(spark):
    imgs = images_df(spark, 5, partitions=1)
    with pytest.raises(ValueError, match="stride"):
        patch_grid(imgs, patch=8, stride=9)
    with pytest.raises(ValueError, match="stride"):
        extract_patches(imgs, patch=8, stride=0)


def test_channel_stats_exact_vs_numpy_and_partitioning_invariant(spark):
    imgs = images_df(spark, 80, partitions=5)
    row = channel_stats(imgs).collect()[0]
    # independent full-corpus numpy computation
    px = np.concatenate(
        [
            decode_image(bytes(r.bytes), r.fmt).reshape(-1, 3)
            for r in imgs.select("bytes", "fmt").collect()
        ]
    ).astype(np.float64)
    assert row.n_images == 80
    assert row.n_pixels == px.shape[0]
    for i, c in enumerate("rgb"):
        # engine means/stds derive from EXACT integer sums; numpy's
        # pairwise float sums match to fp ulp here
        assert abs(getattr(row, f"mean_{c}") - px[:, i].mean()) < 1e-9
        assert abs(getattr(row, f"std_{c}") - px[:, i].std()) < 1e-9
    # bit-identical under a different partitioning (exact sums)
    row13 = channel_stats(imgs.repartition(13)).collect()[0]
    assert row13 == row
