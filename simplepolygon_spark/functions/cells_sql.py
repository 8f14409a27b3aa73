"""Quadkey cell id as a SQL expression — one source of truth for three
engines.

``cell_sql_expr`` emits ANSI SQL (bit ops ``<< & |``, floor, least/
greatest) that parses identically in Spark SQL and DuckDB, so the Spark
column (JVM-side, inside WholeStageCodegen — the hot path never touches
Python) and the DuckDB oracle compute byte-identical cell ids; the numpy
implementation (simplepolygon_spark.cells) is tested equal to both.

X2 in SURVEY.md §2.8: interleaved lon/lat bits at level L.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..cells import MAX_LEVEL, _MASKS


def _spread_sql(v: str) -> str:
    """SQL for Morton bit-spreading of expression ``v`` (≤32-bit value)."""
    s = v
    for shift, mask in zip((16, 8, 4, 2, 1), _MASKS):
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


def _axis_index_sql(coord: str, offset: float, extent: float, level: int) -> str:
    n = 1 << level
    return (
        f"greatest(0, least({n - 1}, "
        f"CAST(floor((({coord}) + {offset}) / {extent} * {n}) AS BIGINT)))"
    )


def cell_sql_expr(lon: str, lat: str, level: int = MAX_LEVEL) -> str:
    """SQL expression for the Morton cell id of (lon, lat) at ``level``.

    Valid in both Spark SQL and DuckDB — used verbatim by the engine and
    by the correctness oracle.
    """
    ix = _axis_index_sql(lon, 180.0, 360.0, level)
    iy = _axis_index_sql(lat, 90.0, 180.0, level)
    return f"({_spread_sql(ix)} | ({_spread_sql(iy)} << 1))"


def cell_col(lon: str, lat: str, level: int = MAX_LEVEL) -> Column:
    """Spark Column computing the cell id JVM-side (no Python UDF)."""
    return F.expr(cell_sql_expr(lon, lat, level))


def parent_cell_col(cell: str, from_level: int, to_level: int) -> Column:
    return F.expr(f"({cell} >> {2 * (from_level - to_level)})")
