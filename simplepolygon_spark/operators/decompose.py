"""Distributed ring decomposition operator.

Runs the per-polygon kernel (simplepolygon_spark.decompose — reference
parity with /root/reference/src/index.ts:39-533) over a DataFrame of
polygons via ``mapInPandas``: decomposition needs *no shuffle at all*
because each row already holds a whole polygon — each Arrow batch is
processed where it sits.  Parallelism = input partitions; use
``repartition`` upstream only if the source produced few/skewed splits.

Schemas
-------
input:  polygon_id string, rings array<array<array<double>>>
        (GeoJSON coordinate nesting: rings → positions → [x, y])
output: polygon_id string, ring_index int, parent int, winding int,
        net_winding int, is_indexed boolean, coords array<array<double>>
        (is_indexed=False marks the zero-intersection fast path, whose
        output carries no `index` property in the reference — quirk Q3)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

RINGS_TYPE = ArrayType(ArrayType(ArrayType(DoubleType())))

POLYGONS_SCHEMA = StructType(
    [
        StructField("polygon_id", StringType()),
        StructField("rings", RINGS_TYPE),
    ]
)

RINGS_OUT_SCHEMA = StructType(
    [
        StructField("polygon_id", StringType()),
        StructField("ring_index", IntegerType()),
        StructField("parent", IntegerType()),
        StructField("winding", IntegerType()),
        StructField("net_winding", IntegerType()),
        StructField("is_indexed", BooleanType()),
        StructField("coords", ArrayType(ArrayType(DoubleType()))),
    ]
)


def _decompose_batches(
    batches: Iterator[pd.DataFrame], on_error: str
) -> Iterator[pd.DataFrame]:
    # imported lazily so the worker imports the kernel, not the operator
    from simplepolygon_spark.decompose import DecomposeError, decompose

    for pdf in batches:
        out: dict[str, list] = {
            "polygon_id": [],
            "ring_index": [],
            "parent": [],
            "winding": [],
            "net_winding": [],
            "is_indexed": [],
            "coords": [],
        }
        for pid, rings in zip(pdf["polygon_id"], pdf["rings"]):
            try:
                # rings arrive as numpy object arrays; decompose()'s own
                # normalization ([[float(x), float(y)] ...]) consumes the
                # per-ring arrays directly — only the outer container is
                # (shallow-)listed; a deep listify here would be a
                # redundant full copy of every coordinate.  A NULL rings
                # cell (e.g. from_json nulled mis-shaped coordinates) is
                # a typed DecomposeError, not a TypeError — on_error=
                # 'skip' must be able to drop it
                feats = decompose(None if rings is None else list(rings))
            except DecomposeError:
                if on_error == "raise":
                    raise
                continue
            for k, f in enumerate(feats):
                out["polygon_id"].append(pid)
                out["ring_index"].append(k)
                out["parent"].append(f["parent"])
                out["winding"].append(f["winding"])
                out["net_winding"].append(f["net_winding"])
                out["is_indexed"].append(f["index"] is not None)
                out["coords"].append(f["coords"])
        if not out["polygon_id"]:
            continue  # an all-skipped batch has no inferable dtypes
        pdf_out = pd.DataFrame(out)
        for col in ("ring_index", "parent", "winding", "net_winding"):
            pdf_out[col] = pdf_out[col].astype("int32")
        yield pdf_out


def decompose_polygons(polygons: DataFrame, on_error: str = "raise") -> DataFrame:
    """polygons(polygon_id, rings) → rings_out (one row per simple ring).

    ``on_error='skip'`` drops invalid polygons (duplicate vertices, etc.)
    instead of failing the job — the scale-friendly default for dirty
    data is to route rejects through ``validate_polygons`` first.
    """
    from pyspark.sql import functions as F

    # NULL rings must be resolved SQL-SIDE: pyspark's arrow_to_pandas
    # segfaults the worker converting a NULL cell of this nested type,
    # so a NULL reaching the kernel is unrecoverable regardless of
    # on_error.  skip → filter; raise → typed message via raise_error.
    src = polygons.select("polygon_id", "rings")
    if on_error == "skip":
        src = src.filter(F.col("rings").isNotNull())
    else:
        src = src.select(
            "polygon_id",
            F.when(
                F.col("rings").isNull(),
                F.raise_error(
                    F.lit("The input must a geojson object with a non-empty geometry")
                ).cast(RINGS_TYPE),
            )
            .otherwise(F.col("rings"))
            .alias("rings"),
        )
    return src.mapInPandas(
        lambda it: _decompose_batches(it, on_error), RINGS_OUT_SCHEMA
    )


VALIDATE_SCHEMA = StructType(
    [
        StructField("polygon_id", StringType()),
        StructField("ok", BooleanType()),
        StructField("error", StringType()),
    ]
)


def validate_polygons(polygons: DataFrame) -> DataFrame:
    """Dry-run validation: (polygon_id, ok, error) — one row per input
    polygon, never failing the job.  ``error`` carries the
    reference-parity message (duplicate vertices, degenerate ring,
    coincident crossings, ...) or NULL when the polygon decomposes
    cleanly.  Use it to ROUTE dirty data — rejects to a quarantine
    sink, the rest through ``decompose_polygons(on_error='raise')``.

    Validity is defined as "the decompose kernel accepts it", so this
    runs the full kernel and discards the rings — the only definition
    that cannot drift from the real pipeline (walk-time rejections like
    coincident crossings are undetectable by cheap static checks).
    """
    from pyspark.sql import functions as F

    def run(batches):
        from simplepolygon_spark.decompose import DecomposeError, decompose

        for pdf in batches:
            ids, oks, errs = [], [], []
            for pid, rings in zip(pdf["polygon_id"], pdf["rings"]):
                try:
                    decompose(None if rings is None else list(rings))
                    oks.append(True)
                    errs.append(None)
                except DecomposeError as e:
                    oks.append(False)
                    errs.append(str(e))
                ids.append(pid)
            yield pd.DataFrame({"polygon_id": ids, "ok": oks, "error": errs})

    src = polygons.select("polygon_id", "rings")
    # NULL rings cannot cross the Arrow boundary (see decompose_polygons)
    # — classify them SQL-side and union with the kernel verdicts
    nulls = src.filter(F.col("rings").isNull()).select(
        "polygon_id",
        F.lit(False).alias("ok"),
        F.lit("The input must a geojson object with a non-empty geometry").alias(
            "error"
        ),
    )
    rest = src.filter(F.col("rings").isNotNull()).mapInPandas(run, VALIDATE_SCHEMA)
    return rest.unionByName(nulls)
