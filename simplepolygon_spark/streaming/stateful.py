"""Custom stateful streaming operator: per-cell running ingest stats.

``running_cell_stats`` keys the image feed by quadkey cell (computed
JVM-side from lon/lat) and keeps per-cell running state
(count, byte volume) across micro-batches with
``applyInPandasWithState`` — the engine's example of a custom stateful
operator beyond built-in windowed aggregation.  Emits one updated row
per cell per micro-batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.cells_sql import cell_sql_expr

OUTPUT_SCHEMA = StructType(
    [
        StructField("cell", LongType()),
        StructField("n_images", LongType()),
        StructField("n_bytes", LongType()),
        StructField("n_batches", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_images", LongType()),
        StructField("n_bytes", LongType()),
        StructField("n_batches", IntegerType()),
    ]
)


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n_images, n_bytes, n_batches = (
        state.get if state.exists else (0, 0, 0)
    )
    for pdf in pdfs:
        n_images += len(pdf)
        n_bytes += int(pdf["nb"].sum())
    n_batches += 1
    state.update((int(n_images), int(n_bytes), int(n_batches)))
    yield pd.DataFrame(
        {
            "cell": pd.Series([key[0]], dtype="int64"),
            "n_images": pd.Series([n_images], dtype="int64"),
            "n_bytes": pd.Series([n_bytes], dtype="int64"),
            "n_batches": pd.Series([n_batches], dtype="int32"),
        }
    )


def running_cell_stats(feed: DataFrame, level: int = 6) -> DataFrame:
    """Streaming DataFrame of running per-cell stats (update semantics)."""
    keyed = feed.selectExpr(
        f"{cell_sql_expr('lon', 'lat', level)} AS cell",
        "CAST(length(bytes) AS LONG) AS nb",
    )
    return keyed.groupBy("cell").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
