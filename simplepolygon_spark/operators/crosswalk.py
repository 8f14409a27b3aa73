"""Raster↔vector crosswalk: tile bounds → covering cells → rings
(SURVEY.md §2.3 J7; BASELINE.json:6).

Each image tile (its ±0.05° bbox) is rasterized to the quadkey cells it
overlaps at ``level``; each such cell is an interval [lo, hi] at max
level, pushed through the broadcast interval index's overlap query
(contiguous CSR slice + unique — no per-interval scan).  Output links
every tile to the cells it covers and the rings whose cover those cells
overlap.  All inside mapInArrow: no shuffle, no driver loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from ..cells import cell_range_at_max, spread_bits


def _bbox_cells(lon0, lat0, lon1, lat1, level: int):
    """All Morton cells at ``level`` overlapping one bbox (vectorized)."""
    n = 1 << level
    ix0 = int(np.clip(np.floor((lon0 + 180.0) / 360.0 * n), 0, n - 1))
    ix1 = int(np.clip(np.floor((lon1 + 180.0) / 360.0 * n), 0, n - 1))
    iy0 = int(np.clip(np.floor((lat0 + 90.0) / 180.0 * n), 0, n - 1))
    iy1 = int(np.clip(np.floor((lat1 + 90.0) / 180.0 * n), 0, n - 1))
    ix = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iy = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx = np.repeat(ix, len(iy))
    gy = np.tile(iy, len(ix))
    return (spread_bits(gx) | (spread_bits(gy) << np.uint64(1))).astype(np.int64)


def crosswalk(
    images: DataFrame,
    index_bc,
    level: int = 12,
    id_col: str = "image_id",
) -> DataFrame:
    """images(id, lon_min, lat_min, lon_max, lat_max) →
    (id, cell_id, polygon_id nullable, ring_index nullable).

    One row per (tile, covering cell, overlapping ring); cells that
    overlap no ring emit a single row with NULL ring columns so the
    raster side of the crosswalk is complete.
    """
    schema = f"{id_col} string, cell_id long, polygon_id string, ring_index int"

    def run(batches):
        idx = index_bc.value
        for batch in batches:
            ids = batch.column(id_col).to_pylist()
            b0 = batch.column("lon_min").to_numpy(zero_copy_only=False)
            b1 = batch.column("lat_min").to_numpy(zero_copy_only=False)
            b2 = batch.column("lon_max").to_numpy(zero_copy_only=False)
            b3 = batch.column("lat_max").to_numpy(zero_copy_only=False)
            o_id, o_cell, o_pid, o_ri = [], [], [], []
            for t in range(len(ids)):
                cells = _bbox_cells(b0[t], b1[t], b2[t], b3[t], level)
                lo, hi = cell_range_at_max(cells, level, idx.max_level)
                qi, rid = idx.overlap(lo, hi)
                hit = set(qi.tolist())
                for q, r in zip(qi, rid):
                    pid, ri = idx.ring_keys[r]
                    o_id.append(ids[t])
                    o_cell.append(int(cells[q]))
                    o_pid.append(pid)
                    o_ri.append(ri)
                for q in range(len(cells)):
                    if q not in hit:
                        o_id.append(ids[t])
                        o_cell.append(int(cells[q]))
                        o_pid.append(None)
                        o_ri.append(None)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, pa.string()),
                    pa.array(o_cell, pa.int64()),
                    pa.array(o_pid, pa.string()),
                    pa.array(o_ri, pa.int32()),
                ],
                names=[id_col, "cell_id", "polygon_id", "ring_index"],
            )

    return images.select(
        id_col, "lon_min", "lat_min", "lon_max", "lat_max"
    ).mapInArrow(run, schema)
