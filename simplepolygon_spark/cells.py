"""From-scratch 64-bit quadkey (Morton) cell index — numpy side.

H3/S2-style hierarchical cells demanded by the north rule
(BASELINE.json:6,14), built from public bit-interleaving math (no h3/s2
libraries exist in the sandbox; SURVEY.md §7.0):

* A cell at level L is the Morton interleave of the L-bit x/y indices of
  a point on the [-180,180]×[-90,90] lon/lat window.
* Hierarchy is prefix arithmetic: ``parent = cell >> 2Δ``; the children
  of a cell occupy the contiguous Morton range
  ``[cell << 2Δ, ((cell+1) << 2Δ) - 1]`` — which is what makes the
  compressed cell→ring *interval* index (Raster-Intervals style,
  PAPERS.md) a set of [lo, hi] ranges at max level.

The same encoding exists as Spark column expressions in
``simplepolygon_spark.functions.cells_sql`` (JVM-side, codegen-friendly)
and as ANSI SQL for the DuckDB oracle — all three are tested equal.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 16  # 65536 × 65536 grid; 32 bits of Morton code

_MASKS = (
    0x0000FFFF0000FFFF,
    0x00FF00FF00FF00FF,
    0x0F0F0F0F0F0F0F0F,
    0x3333333333333333,
    0x5555555555555555,
)


def spread_bits(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 32 bits of v (Morton spread)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(_MASKS[0])
    v = (v | (v << np.uint64(8))) & np.uint64(_MASKS[1])
    v = (v | (v << np.uint64(4))) & np.uint64(_MASKS[2])
    v = (v | (v << np.uint64(2))) & np.uint64(_MASKS[3])
    v = (v | (v << np.uint64(1))) & np.uint64(_MASKS[4])
    return v


def xy_indices(lon: np.ndarray, lat: np.ndarray, level: int = MAX_LEVEL):
    """Integer grid indices of lon/lat at ``level`` (clipped to the window)."""
    n = np.int64(1) << np.int64(level)
    ix = np.clip(np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * n), 0, n - 1).astype(np.int64)
    iy = np.clip(np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * n), 0, n - 1).astype(np.int64)
    return ix, iy


def cell_of_point(lon, lat, level: int = MAX_LEVEL) -> np.ndarray:
    """Morton cell id(s) of point(s) at ``level`` (vectorized)."""
    ix, iy = xy_indices(np.atleast_1d(lon), np.atleast_1d(lat), level)
    return (spread_bits(ix) | (spread_bits(iy) << np.uint64(1))).astype(np.int64)


def parent_cell(cell: np.ndarray, from_level: int, to_level: int) -> np.ndarray:
    """Ancestor of ``cell`` (at from_level) at coarser ``to_level``."""
    return np.asarray(cell, np.int64) >> np.int64(2 * (from_level - to_level))


def cell_range_at_max(cell: np.ndarray, level: int, max_level: int = MAX_LEVEL):
    """[lo, hi] Morton range at ``max_level`` covered by ``cell`` at ``level``."""
    shift = np.int64(2 * (max_level - level))
    c = np.asarray(cell, np.int64)
    return c << shift, ((c + 1) << shift) - 1


def cell_bounds(cell: int, level: int):
    """(lon_min, lat_min, lon_max, lat_max) of a cell."""
    c = np.uint64(cell)
    ix = _compact_bits(c)
    iy = _compact_bits(c >> np.uint64(1))
    n = float(1 << level)
    return (
        float(ix) / n * 360.0 - 180.0,
        float(iy) / n * 180.0 - 90.0,
        float(ix + 1) / n * 360.0 - 180.0,
        float(iy + 1) / n * 180.0 - 90.0,
    )


def _compact_bits(v: np.uint64) -> np.uint64:
    v = np.uint64(v) & np.uint64(_MASKS[4])
    v = (v | (v >> np.uint64(1))) & np.uint64(_MASKS[3])
    v = (v | (v >> np.uint64(2))) & np.uint64(_MASKS[2])
    v = (v | (v >> np.uint64(4))) & np.uint64(_MASKS[1])
    v = (v | (v >> np.uint64(8))) & np.uint64(_MASKS[0])
    v = (v | (v >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return v


# ---------------------------------------------------------------------------
# cell cover of a ring: recursive FULL/PARTIAL descent
# ---------------------------------------------------------------------------

FULL = 1
PARTIAL = 0


def _segments_intersect_box(ring: np.ndarray, lon0, lat0, lon1, lat1) -> bool:
    """Does any ring edge intersect / touch the box? Conservative bbox +
    separating-axis check per edge, vectorized."""
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    # quick reject on edge bboxes
    m = (
        (np.minimum(x1, x2) <= lon1)
        & (np.maximum(x1, x2) >= lon0)
        & (np.minimum(y1, y2) <= lat1)
        & (np.maximum(y1, y2) >= lat0)
    )
    if not m.any():
        return False
    x1, y1, x2, y2 = x1[m], y1[m], x2[m], y2[m]
    # exact segment-box test: the segment's line must leave all four box
    # corners strictly on one side, else it crosses/touches the box.  A
    # corner exactly ON the line (cross product 0) makes both all>0 and
    # all<0 false, so the touch case needs no separate accumulator.
    dx, dy = x2 - x1, y2 - y1
    sides = np.stack(
        [
            dx * (cy - y1) - dy * (cx - x1)
            for cx, cy in ((lon0, lat0), (lon0, lat1), (lon1, lat0), (lon1, lat1))
        ]
    )
    crosses = ~(np.all(sides > 0, axis=0) | np.all(sides < 0, axis=0))
    return bool(np.any(crosses))


def cover_ring(
    ring, max_level: int = 12, start_level: int = 4, abs_max: int = MAX_LEVEL
):
    """FULL/PARTIAL cell cover of one simple ring by recursive descent.

    Returns an int64 array of [lo, hi, full] rows: Morton ranges at
    ``abs_max`` level, ``full``=1 when the cell lies entirely inside the
    ring (PIP refine can be skipped — the Raster-Intervals shortcut).

    Descent: classify each candidate cell against the ring — OUT (center
    outside and no edge crosses), FULL (center inside and no edge
    crosses), else PARTIAL → subdivide until ``max_level``.
    """
    ring = np.asarray(ring, dtype=np.float64)
    from .geom import point_in_ring

    lon_min, lat_min = ring[:, 0].min(), ring[:, 1].min()
    lon_max, lat_max = ring[:, 0].max(), ring[:, 1].max()

    # seed: cells at start_level overlapping the bbox
    n0 = 1 << start_level
    ix0 = int(np.clip(np.floor((lon_min + 180.0) / 360.0 * n0), 0, n0 - 1))
    ix1 = int(np.clip(np.floor((lon_max + 180.0) / 360.0 * n0), 0, n0 - 1))
    iy0 = int(np.clip(np.floor((lat_min + 90.0) / 180.0 * n0), 0, n0 - 1))
    iy1 = int(np.clip(np.floor((lat_max + 90.0) / 180.0 * n0), 0, n0 - 1))
    stack = [
        (start_level, int(spread_bits(np.array([ix]))[0] | (spread_bits(np.array([iy]))[0] << np.uint64(1))))
        for ix in range(ix0, ix1 + 1)
        for iy in range(iy0, iy1 + 1)
    ]

    out = []
    while stack:
        level, cell = stack.pop()
        b = cell_bounds(cell, level)
        # disjoint from ring bbox?
        if b[2] < lon_min or b[0] > lon_max or b[3] < lat_min or b[1] > lat_max:
            continue
        crossed = _segments_intersect_box(ring, *b)
        if not crossed:
            cx, cy = (b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0
            if point_in_ring((cx, cy), ring, True):
                lo, hi = cell_range_at_max(cell, level, abs_max)
                out.append((int(lo), int(hi), FULL))
            # else fully outside: drop
            continue
        if level >= max_level:
            lo, hi = cell_range_at_max(cell, level, abs_max)
            out.append((int(lo), int(hi), PARTIAL))
            continue
        base = cell << 2
        stack.extend((level + 1, base + k) for k in range(4))

    if not out:
        return np.zeros((0, 3), dtype=np.int64)
    arr = np.array(sorted(out), dtype=np.int64)
    # merge adjacent ranges with the same full-flag
    merged = [arr[0].tolist()]
    for lo, hi, fl in arr[1:]:
        if lo == merged[-1][1] + 1 and fl == merged[-1][2]:
            merged[-1][1] = hi
        else:
            merged.append([lo, hi, fl])
    return np.array(merged, dtype=np.int64)
