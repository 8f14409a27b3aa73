"""End-to-end GeoJSON string API: reference input JSON strings in,
FeatureCollection strings out, equal to the reference goldens
(geometry coordinates float64-exact, properties exact)."""

from __future__ import annotations

import json

import pytest

from simplepolygon_spark.operators.geojson import decompose_geojson
from simplepolygon_spark.sources.fixtures import (
    load_reference_fixture,
    reference_fixture_names,
)


def _strip_style(feature):
    """Golden files embed test-harness style props (colorize(),
    /root/reference/test/index.test.ts:34-51) — engine parity covers the
    algorithmic properties."""
    keep = {"index", "parent", "winding", "netWinding"}
    return {
        "type": feature["type"],
        "properties": {k: v for k, v in feature["properties"].items() if k in keep},
        "geometry": feature["geometry"],
    }


def test_geojson_string_roundtrip_matches_goldens(spark):
    rows = []
    goldens = {}
    for name in reference_fixture_names():
        rings, gold = load_reference_fixture(name)
        feature = {
            "type": "Feature",
            "properties": {},
            "geometry": {"type": "Polygon", "coordinates": rings},
        }
        rows.append((name, json.dumps(feature)))
        goldens[name] = gold

    df = spark.createDataFrame(rows, "polygon_id string, geojson string")
    got = {r.polygon_id: json.loads(r.feature_collection)
           for r in decompose_geojson(df).collect()}

    for name, gold in goldens.items():
        mine = got[name]
        assert mine["type"] == "FeatureCollection"
        expect = [_strip_style(f) for f in gold["features"]]
        assert mine["features"] == expect, f"{name} mismatch"


def test_polygon_rings_straddle_arrow_batches(spark):
    """Regression: with mapInPandas assembly, a polygon whose rings
    straddled an Arrow batch boundary was emitted as TWO partial
    FeatureCollections.  Force 1-row batches so every multi-ring
    polygon straddles, and assert exactly one complete row each."""
    rows, expected_feats = [], {}
    for name in reference_fixture_names():
        rings, gold = load_reference_fixture(name)
        feature = {
            "type": "Feature",
            "properties": {},
            "geometry": {"type": "Polygon", "coordinates": rings},
        }
        rows.append((name, json.dumps(feature)))
        expected_feats[name] = len(gold["features"])

    df = spark.createDataFrame(rows, "polygon_id string, geojson string")
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "1")
    try:
        out = decompose_geojson(df).collect()
    finally:
        spark.conf.set(key, old)

    assert len(out) == len(rows)  # one row per polygon, no splits
    for r in out:
        fc = json.loads(r.feature_collection)
        assert len(fc["features"]) == expected_feats[r.polygon_id]


def test_geojson_validation_errors(spark):
    bad = [
        ("not-feature", json.dumps({"type": "Point", "geometry": None})),
    ]
    df = spark.createDataFrame(bad, "polygon_id string, geojson string")
    from simplepolygon_spark.operators.geojson import parse_geojson_features

    with pytest.raises(Exception, match="type Feature"):
        parse_geojson_features(df).collect()


def test_integral_id_round_trips_and_bad_id_type_rejected(spark):
    """The Arrow kernel pins polygon_id to string; an integral id must
    be cast around the kernel and come back in the CALLER'S type, and a
    non-round-trippable id type must fail loudly at plan time, not as a
    worker-side ArrowTypeError."""
    import pytest

    feature = {
        "type": "Feature",
        "properties": {},
        "geometry": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]],
        },
    }
    df = spark.createDataFrame(
        [(7, json.dumps(feature))], "polygon_id long, geojson string"
    )
    out = decompose_geojson(df)
    assert out.schema["polygon_id"].dataType.simpleString() == "bigint"
    rows = out.collect()
    assert len(rows) == 1 and rows[0].polygon_id == 7
    fc = json.loads(rows[0].feature_collection)
    assert len(fc["features"]) == 1

    bad = spark.createDataFrame(
        [(1.5, json.dumps(feature))], "polygon_id double, geojson string"
    )
    with pytest.raises(TypeError, match="must be string or integral"):
        decompose_geojson(bad)
