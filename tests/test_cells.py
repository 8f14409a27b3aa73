"""Quadkey cell index properties + three-way (numpy / Spark SQL / DuckDB)
equality of the cell id expression."""

from __future__ import annotations

import duckdb
import numpy as np

from simplepolygon_spark.cells import (
    MAX_LEVEL,
    cell_bounds,
    cell_of_point,
    cell_range_at_max,
    cover_ring,
    parent_cell,
)
from simplepolygon_spark.functions.cells_sql import cell_sql_expr
from simplepolygon_spark.geom import point_in_ring


def _grid_points(n=200, seed=7):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-180, 180, n)
    lat = rng.uniform(-90, 90, n)
    return lon, lat


def test_point_in_own_cell_bounds():
    lon, lat = _grid_points()
    for lvl in (4, 9, MAX_LEVEL):
        cells = cell_of_point(lon, lat, lvl)
        for i in range(0, len(lon), 17):
            b = cell_bounds(int(cells[i]), lvl)
            assert b[0] <= lon[i] <= b[2] + 1e-9
            assert b[1] <= lat[i] <= b[3] + 1e-9


def test_parent_child_prefix_relation():
    lon, lat = _grid_points()
    fine = cell_of_point(lon, lat, MAX_LEVEL)
    for lvl in (3, 8, 12):
        coarse = cell_of_point(lon, lat, lvl)
        assert np.array_equal(parent_cell(fine, MAX_LEVEL, lvl), coarse)
        lo, hi = cell_range_at_max(coarse, lvl, MAX_LEVEL)
        assert np.all((lo <= fine) & (fine <= hi))


def test_cell_sql_matches_numpy_in_duckdb():
    lon, lat = _grid_points(500)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": lon, "lat": lat}))
    for lvl in (6, 12, MAX_LEVEL):
        sql_cells = con.execute(
            f"SELECT {cell_sql_expr('lon', 'lat', lvl)} AS c FROM pts"
        ).fetchnumpy()["c"]
        np_cells = cell_of_point(lon, lat, lvl)
        assert np.array_equal(sql_cells.astype(np.int64), np_cells)


def test_cell_sql_matches_numpy_in_spark(spark):
    lon, lat = _grid_points(300)
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    got = (
        df.selectExpr(f"{cell_sql_expr('lon', 'lat', 12)} AS c")
        .toPandas()["c"]
        .to_numpy()
    )
    assert np.array_equal(got.astype(np.int64), cell_of_point(lon, lat, 12))


def test_cover_ring_classifies_full_and_partial():
    # a big axis-aligned square: FULL cells inside, PARTIAL on the border
    ring = np.array([[0, 0], [40, 0], [40, 40], [0, 40], [0, 0]], dtype=np.float64)
    cov = cover_ring(ring, max_level=8)
    assert len(cov) > 0
    assert (cov[:, 2] == 1).any(), "big square must have FULL cells"
    assert (cov[:, 2] == 0).any(), "boundary cells must be PARTIAL"
    # ranges sorted and non-overlapping
    assert np.all(cov[1:, 0] > cov[:-1, 1])


def test_cover_contains_interior_points_and_excludes_far():
    ring = np.array(
        [[10, 10], [30, 12], [28, 35], [12, 30], [10, 10]], dtype=np.float64
    )
    cov = cover_ring(ring, max_level=9)
    rng = np.random.default_rng(3)
    lon = rng.uniform(0, 45, 800)
    lat = rng.uniform(0, 45, 800)
    cells = cell_of_point(lon, lat, MAX_LEVEL)
    in_cover = np.zeros(len(lon), dtype=bool)
    for lo, hi, _fl in cov:
        in_cover |= (cells >= lo) & (cells <= hi)
    for i in range(len(lon)):
        inside = point_in_ring((lon[i], lat[i]), ring, True)
        if inside:
            assert in_cover[i], f"interior point {lon[i]},{lat[i]} not covered"
    # FULL cells must contain only interior points
    for lo, hi, fl in cov:
        if fl == 1:
            m = (cells >= lo) & (cells <= hi)
            for i in np.nonzero(m)[0]:
                assert point_in_ring((lon[i], lat[i]), ring, True)
