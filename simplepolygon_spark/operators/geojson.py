"""GeoJSON string API — the reference's exact interface, columnar.

A user of the reference calls ``simplepolygon(feature)`` with a GeoJSON
``Feature<Polygon>`` and gets a ``FeatureCollection<Polygon>`` back
(/root/reference/src/index.ts:39-41).  These operators give the same
contract over DataFrame columns:

  parse_geojson_features  — geojson string column → (polygon_id, rings)
                            via JVM ``from_json`` (schema-checked; bad
                            rows surface with NULL rings, error parity
                            applied downstream)
  decompose_geojson       — geojson strings in → one FeatureCollection
                            JSON string per input feature, with the
                            reference's property contract: index/parent/
                            winding/netWinding, and NO ``index`` key on
                            the zero-intersection fast path (quirk Q3).

The FeatureCollection assembly runs as groupBy(polygon_id).applyInPandas
— one shuffle of the (small) ring layer buys the guarantee that a
polygon's rings can never straddle Arrow batch boundaries (which the
earlier mapInPandas assembly silently got wrong for >batch-size
polygons); the decomposition kernel itself is the other Arrow stage.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decompose import decompose_polygons

GEOJSON_GEOM_SCHEMA = (
    "STRUCT<type: STRING, geometry: STRUCT<type: STRING, "
    "coordinates: ARRAY<ARRAY<ARRAY<DOUBLE>>>>>"
)


def parse_geojson_features(
    df: DataFrame, geojson_col: str = "geojson", id_col: str = "polygon_id"
) -> DataFrame:
    """geojson string column → (polygon_id, rings) for decompose_polygons.

    Validation parity with /root/reference/src/index.ts:42-48: non-Feature,
    missing geometry, and non-Polygon rows raise with the reference's
    error messages.
    """
    parsed = df.select(
        F.col(id_col),
        F.from_json(F.col(geojson_col), GEOJSON_GEOM_SCHEMA).alias("f"),
    )
    # the checks live INSIDE the rings column — a separate error column
    # would be pruned away by Catalyst and never evaluated
    rings = (
        F.when(
            (F.col("f.type").isNull()) | (F.col("f.type") != "Feature"),
            F.raise_error(F.lit("The input must a geojson object of type Feature")).cast(
                "array<array<array<double>>>"
            ),
        )
        .when(
            F.col("f.geometry").isNull(),
            F.raise_error(
                F.lit("The input must a geojson object with a non-empty geometry")
            ).cast("array<array<array<double>>>"),
        )
        .when(
            F.col("f.geometry.type") != "Polygon",
            F.raise_error(F.lit("The input must be a geojson Polygon")).cast(
                "array<array<array<double>>>"
            ),
        )
        .otherwise(F.col("f.geometry.coordinates"))
    )
    return parsed.select(id_col, rings.alias("rings"))


def decompose_geojson(
    df: DataFrame, geojson_col: str = "geojson", id_col: str = "polygon_id"
) -> DataFrame:
    """(id, geojson Feature string) → (id, feature_collection string).

    Output JSON matches the reference's shape: a FeatureCollection of
    one-ring Polygons with properties {index?, parent, winding,
    netWinding} — ``index`` omitted on the fast path (Q3).

    DUPLICATE-ID CONTRACT: ``id_col`` is treated as a key — output has
    ONE row per distinct id.  The reference API has no notion of row
    ids at all (one Feature per call, /root/reference/src/index.ts:39),
    so duplicate ids are a caller-side aliasing decision this operator
    resolves deterministically: N same-id rows with ``coordinates: []``
    collapse to one empty-FeatureCollection row, and a same-id mix of
    empty and real geometry keeps the real rings (the empty sentinel
    drops).  Callers needing per-input-row outputs must supply unique
    ids — exactly what a per-row uuid column gives for free.
    """
    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    # the Arrow kernel's schema pins polygon_id to string
    # (POLYGONS_SCHEMA); a non-string id would otherwise surface as an
    # opaque worker-side ArrowTypeError.  Integral/boolean ids
    # round-trip a string cast exactly, so convert around the kernel
    # and restore the caller's type on output; anything else (float,
    # struct, ...) is rejected loudly here instead of deep in a task.
    id_type = df.schema[id_col].dataType
    restore_type = None
    if not isinstance(id_type, StringType):
        if not isinstance(
            id_type, (ByteType, ShortType, IntegerType, LongType, BooleanType)
        ):
            raise TypeError(
                f"decompose_geojson: id column {id_col!r} must be string or "
                f"integral (kernel id type is string; a "
                f"{id_type.simpleString()} id does not round-trip the cast)"
            )
        restore_type = id_type
        df = df.withColumn(id_col, F.col(id_col).cast("string"))

    parsed = parse_geojson_features(df, geojson_col, id_col)
    # decompose_polygons' kernel schema fixes the id column name to
    # polygon_id — rename around it so any id_col works
    if id_col != "polygon_id":
        parsed = parsed.withColumnRenamed(id_col, "polygon_id")
    # include_empty: coordinates=[] rows ride the SAME scan as sentinel
    # rows (ring_index=-1) instead of a second filter over `parsed` —
    # which would re-execute the from_json parse over the whole corpus
    # to recover a rare edge case
    rings_out = decompose_polygons(parsed, include_empty=True)
    if id_col != "polygon_id":
        rings_out = rings_out.withColumnRenamed("polygon_id", id_col)

    schema = f"{id_col} string, feature_collection string"

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        # one call per polygon_id group — Spark guarantees the whole
        # group arrives in this single DataFrame, so a polygon whose
        # rings straddle Arrow batch boundaries can never be split into
        # two partial FeatureCollections (it was with mapInPandas, whose
        # input is re-chunked at arrow.maxRecordsPerBatch)
        pdf = pdf.sort_values("ring_index")
        pid = pdf[id_col].iloc[0]
        # ring_index=-1 rows are include_empty sentinels (coordinates
        # was []): a group of only sentinels is the reference fast
        # path's empty FeatureCollection; a mixed group (duplicate id,
        # one empty + one real) keeps the real rings
        real = pdf[pdf["ring_index"] >= 0]
        if len(real) == 0:
            return pd.DataFrame(
                {
                    id_col: [pid],
                    "feature_collection": [
                        json.dumps({"type": "FeatureCollection", "features": []})
                    ],
                }
            )
        pdf = real
        feats = []
        for row in pdf.itertuples():
            props = {}
            if row.is_indexed:
                props["index"] = int(row.ring_index)
            props.update(
                parent=int(row.parent),
                winding=int(row.winding),
                netWinding=int(row.net_winding),
            )
            feats.append(
                {
                    "type": "Feature",
                    "properties": props,
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [[list(c) for c in row.coords]],
                    },
                }
            )
        return pd.DataFrame(
            {
                id_col: [pid],
                "feature_collection": [
                    json.dumps({"type": "FeatureCollection", "features": feats})
                ],
            }
        )

    # groupBy shuffles only the (small) ring layer; the alternative —
    # buffering across mapInPandas batches — would silently break on a
    # >maxRecordsPerBatch polygon, so correctness wins the shuffle here
    out = rings_out.groupBy(id_col).applyInPandas(assemble, schema)
    if restore_type is not None:
        out = out.withColumn(id_col, F.col(id_col).cast(restore_type))
    return out
