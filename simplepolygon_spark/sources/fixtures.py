"""Polygon fixtures.

North-star fixture coordinates per /root/repo/FIXTURES.md §1.2-1.3 (the
8-shape golden is documented in the reference docstring,
/root/reference/src/index.ts:26-37); the three reference fixture
in/out JSON pairs are loaded from /root/reference/test/{in,out} when that
read-only checkout is present (tests), never copied into this repo.
"""

from __future__ import annotations

import json
import os

REFERENCE_TEST_DIR = os.environ.get("SIMPLEPOLYGON_REFERENCE_TESTS", "/root/reference/test")

# FIXTURES.md §1.2 — exact coordinates
NORTH_STAR_FIXTURES: dict[str, list] = {
    "8-shape": [[[0, 0], [2, 0], [0, 2], [2, 2], [0, 0]]],
    "double-8": [[[0, 0], [2, 0], [0, 2], [2, 2], [0, 4], [2, 4], [0, 0]]],
    "banana": [[[0, 0], [6, 0], [6, 6], [0, 6], [3, 2], [3, 4], [0, 0]]],
    "crossing-rings": [
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]],
        [[8, 4], [12, 4], [12, 6], [8, 6], [8, 4]],
    ],
    # FIXTURES.md §1.3 edge fixtures
    "spike": [[[0, 0], [2, 0], [0, 2], [4, 2], [2, 2], [0, 0]]],
    "unclosed": [[[0, 0], [2, 0], [0, 2], [2, 2]]],
}

# docstring golden for 8-shape (/root/reference/src/index.ts:36-37)
EIGHT_SHAPE_GOLDEN = [
    {"coords": [[0, 0], [2, 0], [1, 1], [0, 0]], "parent": -1, "winding": 1, "net_winding": 1},
    {"coords": [[1, 1], [0, 2], [2, 2], [1, 1]], "parent": -1, "winding": -1, "net_winding": -1},
]


def reference_fixture_names() -> list[str]:
    return ["simple", "complex", "with-hole"]


def load_reference_fixture(name: str) -> tuple[list, dict]:
    """(input rings, golden FeatureCollection dict) from the reference checkout."""
    with open(os.path.join(REFERENCE_TEST_DIR, "in", f"{name}.json")) as f:
        inp = json.load(f)
    with open(os.path.join(REFERENCE_TEST_DIR, "out", f"{name}.json")) as f:
        gold = json.load(f)
    return inp["geometry"]["coordinates"], gold


def all_decomposable_fixtures() -> dict[str, list]:
    """name → rings, for every fixture that decomposes without error."""
    out = {
        k: v
        for k, v in NORTH_STAR_FIXTURES.items()
        if k not in ("unclosed",)  # same output as 8-shape; keep ids unique
    }
    if os.path.isdir(REFERENCE_TEST_DIR):
        for name in reference_fixture_names():
            rings, _ = load_reference_fixture(name)
            out[name] = rings
    return out
