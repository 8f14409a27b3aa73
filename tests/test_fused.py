"""Fused validate+assign == separate validate_payload + pip_join."""

from __future__ import annotations

from pyspark.sql import functions as F

from simplepolygon_spark.operators.decompose import decompose_polygons
from simplepolygon_spark.operators.fused import validate_and_assign
from simplepolygon_spark.operators.payload import validate_payload
from simplepolygon_spark.operators.tiling import (
    broadcast_index,
    build_interval_index,
    pip_join,
)
from simplepolygon_spark.sources.footprints import footprints_df
from simplepolygon_spark.sources.images import images_df


def test_fused_equals_separate(spark):
    rings = decompose_polygons(footprints_df(spark, grid=3))
    bc = broadcast_index(spark, build_interval_index(rings, cover_level=9))
    imgs = images_df(spark, 800, partitions=4).cache()

    fused = validate_and_assign(imgs, bc).cache()

    # validity matches validate_payload per image
    v_f = {
        r.image_id: (r.psnr_db, r.caption_ok)
        for r in fused.select("image_id", "psnr_db", "caption_ok").distinct().collect()
    }
    v_s = {
        r.image_id: (r.psnr_db, r.caption_ok)
        for r in validate_payload(imgs).collect()
    }
    assert v_f == v_s

    # assignments match pip_join exactly
    a_f = {
        (r.image_id, r.polygon_id, r.ring_index)
        for r in fused.where(F.col("polygon_id").isNotNull()).collect()
    }
    a_s = {
        (r.image_id, r.polygon_id, r.ring_index) for r in pip_join(imgs, bc).collect()
    }
    assert a_f == a_s

    # unassigned images survive with NULL ring columns (no silent drops)
    assert fused.select("image_id").distinct().count() == 800
    fused.unpersist()
    imgs.unpersist()
