"""Raster↔vector crosswalk: tile bounds → covering cells → rings
(SURVEY.md §2.3 J7; BASELINE.json:6).

Each image tile (its bbox) is rasterized to the quadkey cells it
overlaps at ``level``; each cell is an interval [lo, hi] at max level,
pushed through the broadcast interval index's batched overlap query.
The whole batch is processed with numpy — tile→cell expansion via
repeat/arange arithmetic, overlap via one CSR gather + unique — no
Python loop over tiles or cells.  Output links every tile to its cells
and the rings whose cover those cells overlap; cells overlapping no
ring emit one NULL-ring row so the raster side stays complete.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

from ..cells import cell_range_at_max, spread_bits


def _bbox_cells(lon0, lat0, lon1, lat1, level: int):
    """All Morton cells at ``level`` overlapping one bbox (test oracle +
    small-scale helper)."""
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


def _bbox_cells_batch(b0, b1, b2, b3, level: int):
    """(tile_idx, cell_id) for every cell of every tile bbox — vectorized
    variable-length expansion with repeat/arange arithmetic."""
    n = np.int64(1 << level)
    ix0 = np.clip(np.floor((b0 + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    ix1 = np.clip(np.floor((b2 + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy0 = np.clip(np.floor((b1 + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    iy1 = np.clip(np.floor((b3 + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    per_tile = nx * ny
    total = int(per_tile.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    tile_idx = np.repeat(np.arange(len(b0), dtype=np.int64), per_tile)
    # flat position within each tile's nx×ny block (x-major like
    # _bbox_cells: gx varies slowest)
    flat = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(per_tile) - per_tile, per_tile
    )
    ny_rep = np.repeat(ny, per_tile)
    gx = np.repeat(ix0, per_tile) + flat // ny_rep
    gy = np.repeat(iy0, per_tile) + flat % ny_rep
    cells = (spread_bits(gx) | (spread_bits(gy) << np.uint64(1))).astype(np.int64)
    return tile_idx, cells


def crosswalk(
    images: DataFrame,
    index_bc,
    level: int = 12,
    id_col: str = "image_id",
) -> DataFrame:
    """images(id, lon_min, lat_min, lon_max, lat_max) →
    (id, cell_id, polygon_id nullable, ring_index nullable)."""
    schema = f"{id_col} string, cell_id long, polygon_id string, ring_index int"

    def run(batches):
        idx = index_bc.value
        for batch in batches:
            ids = np.asarray(batch.column(id_col).to_pylist(), dtype=object)
            b0 = batch.column("lon_min").to_numpy(zero_copy_only=False)
            b1 = batch.column("lat_min").to_numpy(zero_copy_only=False)
            b2 = batch.column("lon_max").to_numpy(zero_copy_only=False)
            b3 = batch.column("lat_max").to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            tile_idx, cells = _bbox_cells_batch(b0, b1, b2, b3, level)
            lo, hi = cell_range_at_max(cells, level, idx.max_level)
            qi, rid = idx.overlap_batch(lo, hi)
            # hit rows
            hit_tiles = tile_idx[qi]
            hit_cells = cells[qi]
            # miss rows: (tile, cell) pairs with no overlapping ring
            miss = np.ones(len(cells), dtype=bool)
            miss[qi] = False
            mi = np.nonzero(miss)[0]
            out_tile = np.concatenate([hit_tiles, tile_idx[mi]])
            out_cell = np.concatenate([hit_cells, cells[mi]])
            pids = np.concatenate(
                [idx.ring_pid[rid], np.full(len(mi), None, dtype=object)]
            )
            ridx = pa.concat_arrays(
                [
                    pa.array(idx.ring_ridx[rid], pa.int32()),
                    pa.nulls(len(mi), pa.int32()),
                ]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids[out_tile], pa.string()),
                    pa.array(out_cell, pa.int64()),
                    pa.array(pids, pa.string()),
                    ridx,
                ],
                names=[id_col, "cell_id", "polygon_id", "ring_index"],
            )

    return images.select(
        id_col, "lon_min", "lat_min", "lon_max", "lat_max"
    ).mapInArrow(run, schema)
