"""Vertex-for-vertex parity of the decomposition kernel vs the reference
goldens (/root/reference/test/out/*.json) and the documented north-star
fixtures (FIXTURES.md §1.2-1.3, BASELINE.json:6)."""

from __future__ import annotations

import pytest

from simplepolygon_spark.decompose import DecomposeError, decompose
from simplepolygon_spark.sources.fixtures import (
    EIGHT_SHAPE_GOLDEN,
    NORTH_STAR_FIXTURES,
    load_reference_fixture,
    reference_fixture_names,
)


def assert_matches_golden(feats, gold):
    gf = gold["features"]
    assert len(feats) == len(gf)
    for i, (f, g) in enumerate(zip(feats, gf)):
        gp = g["properties"]
        # float64-exact coordinate parity
        assert f["coords"] == g["geometry"]["coordinates"][0], f"ring {i} coords"
        assert f["parent"] == gp["parent"], f"ring {i} parent"
        assert f["winding"] == gp["winding"], f"ring {i} winding"
        assert f["net_winding"] == gp["netWinding"], f"ring {i} netWinding"
        # quirk Q3: fast-path features carry no `index` property
        assert (f["index"] is not None) == ("index" in gp), f"ring {i} index presence"
        if "index" in gp:
            assert f["index"] == gp["index"], f"ring {i} index"


@pytest.mark.parametrize("name", reference_fixture_names())
def test_reference_fixture_parity(name):
    rings, gold = load_reference_fixture(name)
    assert_matches_golden(decompose(rings), gold)


def test_8_shape_docstring_golden():
    feats = decompose(NORTH_STAR_FIXTURES["8-shape"])
    assert len(feats) == 2
    for f, g in zip(feats, EIGHT_SHAPE_GOLDEN):
        assert f["coords"] == [[float(x), float(y)] for x, y in g["coords"]]
        assert f["parent"] == g["parent"]
        assert f["winding"] == g["winding"]
        assert f["net_winding"] == g["net_winding"]


def test_unclosed_ring_auto_closes_like_8_shape():
    open_input = [[[0, 0], [2, 0], [0, 2], [2, 2]]]
    assert decompose(open_input) == decompose(NORTH_STAR_FIXTURES["8-shape"])
    # purity: the caller's list was not mutated (the reference mutates,
    # src/index.ts:55-57 — we deliberately do not)
    assert open_input == [[[0, 0], [2, 0], [0, 2], [2, 2]]]


def test_double_8():
    feats = decompose(NORTH_STAR_FIXTURES["double-8"])
    assert len(feats) == 4
    # crossings documented in FIXTURES.md §1.2 must appear as vertices
    all_coords = {tuple(c) for f in feats for c in f["coords"]}
    assert (1.0, 2.0) in all_coords
    for f in feats:
        assert f["winding"] in (1, -1)
    # edge coverage: input edges' corner vertices all survive
    for v in [(0, 0), (2, 0), (0, 2), (2, 2), (0, 4), (2, 4)]:
        assert (float(v[0]), float(v[1])) in all_coords


def test_banana_child_ring():
    feats = decompose(NORTH_STAR_FIXTURES["banana"])
    assert len(feats) == 2
    # inner lobe is a child with doubled net winding (FIXTURES.md §1.2)
    parents = sorted(f["parent"] for f in feats)
    assert parents == [-1, 0]
    child = next(f for f in feats if f["parent"] == 0)
    assert child["net_winding"] == 2


def test_crossing_rings():
    feats = decompose(NORTH_STAR_FIXTURES["crossing-rings"])
    assert len(feats) == 2
    lens = next(f for f in feats if f["parent"] == 0)
    assert lens["net_winding"] == 2
    outline = next(f for f in feats if f["parent"] == -1)
    coords = {tuple(c) for c in outline["coords"]}
    assert (10.0, 4.0) in coords and (10.0, 6.0) in coords
    assert (12.0, 4.0) in coords and (12.0, 6.0) in coords


def test_spike_decomposes():
    feats = decompose(NORTH_STAR_FIXTURES["spike"])
    assert len(feats) >= 1


def test_duplicate_vertex_error():
    dup = [[[0, 0], [2, 0], [1, 1], [0, 2], [1, 3], [2, 2], [1, 1], [0, 0]]]
    with pytest.raises(DecomposeError, match="duplicate vertices"):
        decompose(dup)


def test_empty_coordinates_returns_empty():
    # parity: the reference's fast path returns an empty FeatureCollection
    # for coordinates=[] — the non-empty-geometry error fires only for a
    # null geometry (src/index.ts:45-46, 116-134)
    assert decompose([]) == []
    with pytest.raises(DecomposeError, match="non-empty geometry"):
        decompose(None)


def test_nan_duplicate_vertices_rejected_numpy_path():
    # the dedup key is the JS coordinate string, so NaN,NaN == NaN,NaN —
    # numeric tuple keys would let numpy-NaN rings (the exact form rows
    # take on the Arrow path) through validation and emit garbage rings
    import numpy as np

    nan = float("nan")
    ring = np.array([[0.0, 0.0], [2.0, 0.0], [nan, nan], [2.0, 2.0], [nan, nan]])
    with pytest.raises(DecomposeError, match="duplicate vertices"):
        decompose([ring.tolist()])
    with pytest.raises(DecomposeError, match="duplicate vertices"):
        decompose([[list(p) for p in ring]])  # numpy scalars, Arrow-style


def test_degenerate_ring_error():
    with pytest.raises(DecomposeError):
        decompose([[[0, 0], [1, 1]]])


def test_simplepolygon_drop_in_equals_goldens():
    """The pure-Python drop-in API reproduces the reference's own test
    assertion: colorize(simplepolygon(fixture)) == golden JSON, for all
    three reference fixtures (/root/reference/test/index.test.ts)."""
    import json
    import os

    from simplepolygon_spark.decompose import simplepolygon
    from simplepolygon_spark.sources.fixtures import REFERENCE_TEST_DIR

    def colorize(fc, colors=("#F00", "#00F", "#0F0", "#F0F", "#FFF"), width=6):
        for i, f in enumerate(fc["features"]):
            c = colors[i % len(colors)]
            f["properties"].update(
                {"stroke": c, "fill": c, "stroke-width": width, "fill-opacity": 0.1}
            )
        return fc

    for name in ("simple", "complex", "with-hole"):
        with open(os.path.join(REFERENCE_TEST_DIR, "in", f"{name}.json")) as fh:
            feature = json.load(fh)
        with open(os.path.join(REFERENCE_TEST_DIR, "out", f"{name}.json")) as fh:
            golden = json.load(fh)
        assert colorize(simplepolygon(feature)) == golden, name


def test_simplepolygon_drop_in_error_parity():
    import pytest as _pytest

    from simplepolygon_spark.decompose import DecomposeError, simplepolygon

    with _pytest.raises(DecomposeError, match="type Feature"):
        simplepolygon({"type": "FeatureCollection"})
    with _pytest.raises(DecomposeError, match="non-empty geometry"):
        simplepolygon({"type": "Feature", "geometry": None})
    with _pytest.raises(DecomposeError, match="geojson Polygon"):
        simplepolygon(
            {"type": "Feature", "geometry": {"type": "Point", "coordinates": [0, 0]}}
        )
    # non-dict geometry: the reference's `.type` access yields undefined
    # and throws the same Polygon error — ours must stay a typed
    # DecomposeError, never an AttributeError
    with _pytest.raises(DecomposeError, match="geojson Polygon"):
        simplepolygon({"type": "Feature", "geometry": "Polygon"})
    # missing coordinates: typed error, not a KeyError
    with _pytest.raises(DecomposeError):
        simplepolygon({"type": "Feature", "geometry": {"type": "Polygon"}})
    # coordinates=[] is VALID per the reference fast path: empty output
    fc = simplepolygon(
        {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": []}}
    )
    assert fc == {"type": "FeatureCollection", "features": []}


def test_null_ring_and_null_position_typed_errors():
    # NULL elements INSIDE the coordinates array must raise the typed
    # error (skip-mode droppable), never a raw TypeError
    with pytest.raises(DecomposeError, match="non-null array"):
        decompose([None])
    with pytest.raises(DecomposeError, match="at least 2 coordinates"):
        decompose([[[0.0, 0.0], None, [1.0, 1.0], [0.0, 0.0]]])
