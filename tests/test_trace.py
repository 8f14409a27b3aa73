"""S5 debug trace sink: per-stage metrics ride the job's own pass."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from simplepolygon_spark.operators.decompose import decompose_polygons
from simplepolygon_spark.operators.tiling import broadcast_index, build_interval_index, pip_join
from simplepolygon_spark.plans.trace import TraceLog
from simplepolygon_spark.sources.footprints import footprints_df
from simplepolygon_spark.sources.images import images_df


def test_trace_counts_match_actual_counts(spark):
    rings = decompose_polygons(footprints_df(spark, grid=2))
    bc = broadcast_index(spark, build_interval_index(rings.collect(), cover_level=8))
    imgs = images_df(spark, 400, partitions=4, with_bytes=False)

    tl = TraceLog()
    staged_in = tl.trace(imgs, "images_in")
    asg = pip_join(staged_in, bc)
    staged_out = tl.trace(
        asg, "assignments", n_rows=F.count(F.lit(1)),
        # DISTINCT aggregates are not allowed in observed metrics —
        # a sketch stands in for cardinality
        n_rings=F.approx_count_distinct("polygon_id"),
    )
    n_out = staged_out.count()  # ONE action evaluates both trace points

    rep = tl.report()
    assert rep["images_in"]["n_rows"] == 400
    assert rep["assignments"]["n_rows"] == n_out
    assert rep["assignments"]["n_rings"] > 0


def test_trace_duplicate_name_rejected(spark):
    tl = TraceLog()
    df = spark.range(3)
    tl.trace(df, "x")
    with pytest.raises(ValueError):
        tl.trace(df, "x")
