"""PIP-join parity vs a brute-force numpy oracle over all (point, ring)
pairs (join output rows must match exactly — BASELINE.json:6)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from simplepolygon_spark.geom import point_in_ring_batch
from simplepolygon_spark.operators.decompose import decompose_polygons
from simplepolygon_spark.operators.tiling import (
    broadcast_index,
    build_interval_index,
    pip_join,
)
from simplepolygon_spark.sources.footprints import WINDOW, footprints_df


def _points(n=3000, seed=11):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(WINDOW[0] - 5, WINDOW[2] + 5, n)
    lat = rng.uniform(WINDOW[1] - 5, WINDOW[3] + 5, n)
    ids = np.array([f"img{i:09d}" for i in range(n)])
    return ids, lon, lat


def test_pip_join_matches_bruteforce_oracle(spark):
    fp = footprints_df(spark, grid=3)
    rings_out = decompose_polygons(fp)
    rows = rings_out.collect()
    index = build_interval_index(rows, cover_level=9)
    assert index.stats["n_intervals"] > 0
    bc = broadcast_index(spark, index)

    ids, lon, lat = _points()
    pts = spark.createDataFrame(
        pd.DataFrame({"image_id": ids, "lon": lon, "lat": lat})
    ).repartition(8)
    got = {
        (r.image_id, r.polygon_id, r.ring_index)
        for r in pip_join(pts, bc).collect()
    }

    expected = set()
    for row in rows:
        ring = np.asarray([list(c) for c in row["coords"]])
        inside = point_in_ring_batch(lon, lat, ring)
        for i in np.nonzero(inside)[0]:
            expected.add((ids[i], row["polygon_id"], row["ring_index"]))

    missing = expected - got
    extra = got - expected
    assert not missing, f"{len(missing)} missing, e.g. {sorted(missing)[:3]}"
    assert not extra, f"{len(extra)} extra, e.g. {sorted(extra)[:3]}"
    assert len(expected) > 50  # the oracle actually exercised fan-out


def test_pip_join_plan_has_no_shuffle(spark):
    fp = footprints_df(spark, grid=2)
    index = build_interval_index(decompose_polygons(fp).collect(), cover_level=8)
    bc = broadcast_index(spark, index)
    ids, lon, lat = _points(100)
    pts = spark.createDataFrame(pd.DataFrame({"image_id": ids, "lon": lon, "lat": lat}))
    plan = pip_join(pts, bc)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_full_cells_reduce_refine_work(spark):
    # index stats expose the Raster-Intervals shortcut: FULL intervals exist
    fp = footprints_df(spark, grid=2)
    index = build_interval_index(decompose_polygons(fp).collect(), cover_level=10)
    assert index.stats["n_full"] > 0


def test_pip_join_relational_equals_broadcast(spark):
    """The no-broadcast PIP fallback (bucket equi-join + FULL shortcut
    + grouped exact refine) must equal the broadcast pip_join exactly,
    with an equi-join plan (no cartesian)."""
    import numpy as np
    import pandas as pd

    from simplepolygon_spark.operators.decompose import decompose_polygons
    from simplepolygon_spark.operators.tiling import (
        broadcast_index,
        build_interval_index,
        pip_join,
        pip_join_relational,
    )
    from simplepolygon_spark.sources.footprints import WINDOW, footprints_df

    rings = decompose_polygons(footprints_df(spark, grid=3))
    bc = broadcast_index(spark, build_interval_index(rings.collect(), cover_level=9))
    rng = np.random.default_rng(77)
    n = 2000
    pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": [f"p{i:05d}" for i in range(n)],
                "lon": rng.uniform(WINDOW[0], WINDOW[2], n),
                "lat": rng.uniform(WINDOW[1], WINDOW[3], n),
            }
        )
    ).repartition(4)

    a = {
        (r.image_id, r.polygon_id, r.ring_index)
        for r in pip_join(pts, bc).collect()
    }
    rel = pip_join_relational(pts, rings, cover_level=9, bucket_level=6)
    b = {(r.image_id, r.polygon_id, r.ring_index) for r in rel.collect()}
    assert a == b
    assert len(a) > 0
    plan = rel._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_invalid_coordinates_never_match(spark):
    """Out-of-window (lon=190) and NaN points must produce ZERO
    assignments in BOTH pip paths: the cell math clips onto boundary
    cells, so without explicit rejection such a point could land in a
    FULL cell and be accepted with no geometry check — while the same
    point in a PARTIAL cell is rejected (inconsistent accept/reject on
    bad data)."""
    import math

    from simplepolygon_spark.operators.decompose import decompose_polygons
    from simplepolygon_spark.operators.tiling import (
        broadcast_index,
        build_interval_index,
        pip_join,
        pip_join_relational,
    )
    from simplepolygon_spark.sources.footprints import footprints_df

    rings = decompose_polygons(footprints_df(spark, grid=3))
    bc = broadcast_index(spark, build_interval_index(rings, cover_level=8))
    # a valid in-ring point (grid cell centers carry footprints) plus
    # invalid ones
    valid_hits = pip_join(
        spark.createDataFrame(
            [("ok", -113.3, -53.3)], "image_id string, lon double, lat double"
        ),
        bc,
    ).count()
    bad = spark.createDataFrame(
        [
            ("lon_hi", 190.0, -53.3),
            ("lon_lo", -190.0, -53.3),
            ("lat_hi", -113.3, 95.0),
            ("nan", math.nan, -53.3),
        ],
        "image_id string, lon double, lat double",
    )
    assert pip_join(bad, bc).count() == 0
    assert pip_join_relational(bad, rings, cover_level=8).count() == 0
    assert valid_hits >= 1  # the rejection is not just dropping everything


def test_pip_join_relational_output_names_with_custom_cols(spark):
    """Custom lon_col/lat_col input names must not leak into the output:
    both paths emit lon/lat (drop-in replacements for each other)."""
    from simplepolygon_spark.operators.decompose import decompose_polygons
    from simplepolygon_spark.operators.tiling import pip_join_relational
    from simplepolygon_spark.sources.footprints import footprints_df

    rings = decompose_polygons(footprints_df(spark, grid=3))
    pts = spark.createDataFrame(
        [("a", -113.3, -53.3)], "image_id string, x double, y double"
    )
    out = pip_join_relational(pts, rings, cover_level=8, lon_col="x", lat_col="y")
    assert out.columns == ["image_id", "lon", "lat", "polygon_id", "ring_index"]
