"""Degenerate-intersection corpus (round-1 verdict item 4): pin the
kernel's behavior on the inputs where the reference's contract is only
implicit.

Reference contract notes (/root/reference/README.md:71-72):
- duplicate vertices (within OR across rings) are rejected;
- "spikes or cuts" — a vertex lying ON another edge, or collinear
  overlapping edges — are "currently allowed and treated correctly,
  but make the output non-simple": gpsi reports only proper
  transversal crossings (t, u strictly inside both segments), so these
  contribute no intersection and flow through untouched;
- coincident crossing points (two distinct edge pairs through one
  coordinate) make the reference's RBush point lookup ambiguous — its
  behavior there is undefined.  ENGINE DEVIATION: we reject these
  explicitly (DecomposeError) rather than hang or emit garbage, plus a
  hard walk-step bound as defense in depth.
"""

from __future__ import annotations

import numpy as np
import pytest

from simplepolygon_spark.decompose import DecomposeError, decompose
from simplepolygon_spark.geom import signed_area


def test_readme_spike_cut_polygon():
    """The reference README's own spike/cut example: one proper
    crossing at (1,1) decomposes it into two rings; the collinear
    overlapping edges along y=2 contribute no intersection (strict
    transversal crossings only, matching gpsi)."""
    out = decompose([[[0, 0], [2, 0], [0, 2], [4, 2], [2, 2], [0, 0]]])
    assert len(out) == 2
    assert [f["index"] for f in out] == [0, 1]
    assert sorted(f["winding"] for f in out) == [-1, 1]
    # edge conservation: output edges = input edges split at (1,1)
    n_in_edges = 5
    n_out_edges = sum(len(f["coords"]) - 1 for f in out)
    assert n_out_edges == n_in_edges + 2  # two edges split once each
    for f in out:
        assert (1.0, 1.0) in {(c[0], c[1]) for c in f["coords"]}


def test_vertex_on_edge_touch_takes_fast_path():
    """An inner ring whose vertices lie ON the outer ring's edge: no
    proper crossing ⇒ zero intersections ⇒ fast path (quirk Q3: no
    index property), both rings pass through verbatim."""
    sq = [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]
    tri = [[3, 0], [5, 4], [7, 0], [3, 0]]  # base vertices on sq's bottom edge
    out = decompose([sq, tri])
    assert len(out) == 2
    assert all(f["index"] is None for f in out)  # fast path
    assert out[0]["coords"] == sq
    assert out[1]["coords"] == tri
    assert out[0]["winding"] == 1
    assert out[1]["winding"] == int(np.sign(signed_area(np.asarray(tri))))


def test_rings_sharing_a_vertex_rejected_like_reference():
    """Two rings sharing one coordinate: the reference's duplicate-
    vertex check spans ALL rings (src/index.ts:51-63), so this raises
    with the reference's exact message — parity, not deviation."""
    a = [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]]
    b = [[4, 4], [6, 4], [6, 6], [4, 4]]
    with pytest.raises(DecomposeError, match="duplicate vertices"):
        decompose([a, b])


def test_coincident_crossing_points_rejected_not_hung():
    """Three edge pairs crossing at exactly (1,1): the reference's
    behavior is undefined (ambiguous point lookup); the engine must
    fail fast — this input previously hung the walk forever."""
    coin = [[0, 0], [2, 2], [2, 0], [0, 2], [1, 3], [1, -1], [0, -1], [0, 0]]
    with pytest.raises(DecomposeError, match="[Cc]oincident"):
        decompose([coin])


def test_crossing_landing_on_unrelated_vertex_rejected():
    """A proper crossing whose coordinate equals a ring vertex
    elsewhere in the polygon: same ambiguous-lookup class, same
    explicit rejection."""
    # bowtie crossing at (1,1) + a second ring with a vertex at (1,1)
    bow = [[0, 0], [2, 2], [2, 0], [0, 2], [0, 0]]
    other = [[1, 1], [5, 1], [5, 2], [1, 1]]
    with pytest.raises(DecomposeError, match="[Cc]oincident"):
        decompose([bow, other])


def test_sub3_vertex_ring_rejected_frozen_contract():
    """FROZEN DEVIATION (round-3 decision): the reference performs no
    ring-arity validation — a 2-point ring [A,B] closes to [A,B,A]
    (src/index.ts:54-58), its two collinear overlapping edges yield no
    transversal crossing in gpsi, and the fast path emits a degenerate
    zero-area "ring" as output; a 1-point ring reaches turf with no
    edges at all.  Both are invalid GeoJSON (RFC 7946 §3.1.6 requires
    4+ positions) and poisoned inputs at scale — the engine rejects
    them with a dedicated message instead of reproducing undefined,
    library-version-dependent output.  The reference cannot be executed
    in this environment (no node_modules/dist, installs unavailable),
    so the contract is frozen from source analysis, per class, here."""
    for rings in (
        [[[0, 0], [2, 0]]],               # 2-point ring
        [[[0, 0]]],                       # 1-point ring
        [[[0, 0], [1, 0], [0, 1], [0, 0]], [[5, 5], [6, 5]]],  # mixed
    ):
        with pytest.raises(DecomposeError, match="at least 3 vertices"):
            decompose(rings)


def test_degenerate_rejects_surface_through_spark_skip_mode(spark):
    """on_error='skip' must drop BOTH frozen-deviation classes without
    failing the job — the scale contract for dirty data (a rejected
    polygon costs one row, not a stage retry storm)."""
    from simplepolygon_spark.operators.decompose import (
        POLYGONS_SCHEMA,
        decompose_polygons,
    )
    rows = [
        ("ok", [[[0.0, 0.0], [2.0, 0.0], [0.0, 2.0], [2.0, 2.0], [0.0, 0.0]]]),
        ("short", [[[0.0, 0.0], [2.0, 0.0]]]),
        ("coincident", [[[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0],
                         [1.0, 3.0], [1.0, -1.0], [0.0, -1.0], [0.0, 0.0]]]),
    ]
    df = spark.createDataFrame(rows, POLYGONS_SCHEMA)
    got = decompose_polygons(df, on_error="skip").collect()
    assert {r.polygon_id for r in got} == {"ok"}
    assert len(got) == 2  # the 8-shape's two simple rings
