"""Property-based invariants of the decomposition kernel (hypothesis).

Beyond fixture parity, any random polygon must satisfy:
  P1 output rings are simple (no proper self-intersections)
  P2 ring windings are ±1 and match the shoelace sign of the ring
  P3 edge conservation: the directed output edges are exactly the input
     edges split at their crossing points (multiset equality)
  P4 net winding telescopes: net(ring) = winding(ring) + net(parent)
  P5 simple inputs pass through verbatim (fast path)
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from simplepolygon_spark.decompose import decompose
from simplepolygon_spark.geom import segment_intersections, signed_area


def _coords(n, seed):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 10, (n, 2)).round(3)  # rounding provokes reuse
    # reject duplicate vertices (reference rejects them)
    if len({(x, y) for x, y in pts}) != n:
        return None
    ring = pts.tolist() + [pts[0].tolist()]
    return ring


@settings(max_examples=60, deadline=None)
@given(n=st.integers(4, 9), seed=st.integers(0, 10_000))
def test_random_polygon_invariants(n, seed):
    ring = _coords(n, seed)
    if ring is None:
        return
    feats = decompose([ring])
    assert len(feats) >= 1

    # P1 + P2
    for f in feats:
        arr = np.asarray(f["coords"])
        edges = np.hstack([arr[:-1], arr[1:]])
        ii, _jj, _px, _py, _t, _u = segment_intersections(edges)
        assert len(ii) == 0, "output ring self-intersects"
        assert f["winding"] in (1, -1)
        area = signed_area(arr)
        if abs(area) > 1e-12:
            assert (1 if area > 0 else -1) == f["winding"]

    # P3: edge conservation
    arr_in = np.asarray(ring)
    in_edges = np.hstack([arr_in[:-1], arr_in[1:]])
    ii, jj, px, py, ti, tj = segment_intersections(in_edges)
    cuts: dict[int, list] = {k: [] for k in range(len(in_edges))}
    for a, b, x, y, t, u in zip(ii, jj, px, py, ti, tj):
        cuts[int(a)].append((t, x, y))
        cuts[int(b)].append((u, x, y))
    expected = []
    for k, e in enumerate(in_edges):
        pts = [(0.0, e[0], e[1])] + sorted(cuts[k]) + [(1.0, e[2], e[3])]
        for (t0, x0, y0), (t1, x1, y1) in zip(pts[:-1], pts[1:]):
            expected.append((x0, y0, x1, y1))
    got = []
    for f in feats:
        for p, q in zip(f["coords"][:-1], f["coords"][1:]):
            got.append((p[0], p[1], q[0], q[1]))
    assert sorted(got) == sorted(expected), "edge multiset mismatch"

    # P4
    for f in feats:
        p = f["parent"]
        if p == -1:
            assert f["net_winding"] == f["winding"]
        else:
            assert f["net_winding"] == f["winding"] + feats[p]["net_winding"]


@settings(max_examples=40, deadline=None)
@given(n=st.integers(4, 10), seed=st.integers(0, 10_000))
def test_simple_polygon_fast_path(n, seed):
    rng = np.random.default_rng(seed)
    # star-shaped (sorted by angle around centroid) → always simple
    pts = rng.uniform(0, 10, (n, 2))
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    pts = pts[np.argsort(ang)]
    if len({(x, y) for x, y in pts}) != n:
        return
    ring = pts.tolist() + [pts[0].tolist()]
    feats = decompose([ring])
    assert len(feats) == 1
    assert feats[0]["coords"] == ring  # verbatim pass-through
    assert feats[0]["index"] is None  # quirk Q3
    assert feats[0]["winding"] == (1 if signed_area(pts[np.r_[0 : len(pts), 0]]) > 0 else -1)


def test_js_number_string_matches_ecma262():
    """Quirk Q1's sort key uses JS String(number) formatting.  Known
    String() outputs (incl. the tiny-magnitude exponent forms that
    Python repr pads differently — round-1 advice) must match."""
    from simplepolygon_spark.geom import js_number_string as js

    cases = {
        0.0: "0", -0.0: "0", 1.0: "1", -3.0: "-3", 12.5: "12.5",
        123.456: "123.456", 0.1: "0.1", 1 / 3: "0.3333333333333333",
        1e-7: "1e-7", -1e-7: "-1e-7", 2.5e-8: "2.5e-8",
        1e-6: "0.000001", 1e-5: "0.00001", 1e-4: "0.0001",
        0.00012345: "0.00012345",
        1e16: "10000000000000000", 1e20: "100000000000000000000",
        1e21: "1e+21", 1.5e21: "1.5e+21", 1e22: "1e+22",
        -170.0: "-170", 179.99999999999997: "179.99999999999997",
    }
    for v, want in cases.items():
        assert js(v) == want, (v, js(v), want)


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
@settings(max_examples=300, deadline=None)
def test_js_number_string_roundtrips(v):
    """The JS formatting must stay shortest-round-trip: parsing the
    string recovers the exact float64 (String() is round-trip exact)."""
    from simplepolygon_spark.geom import js_number_string as js

    s = js(v)
    assert float(s) == v or (v == 0 and s == "0")
