"""Bucketed co-located joins for the assignment tables.

At 100 TB the tile-assignment table is joined repeatedly (with ring
stats, payload features, dedup verdicts) on the same keys.  Writing it
**bucketed** by the join key makes every later equi-join on that key
shuffle-free: both sides' bucket files are co-located, so Catalyst
plans a SortMergeJoin with no Exchange.

``write_bucketed`` / ``read_bucketed`` wrap ``bucketBy`` +
``saveAsTable`` (bucketing metadata requires the session catalog — a
plain parquet path cannot carry it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """``path`` makes the table external (explicit location) — needed
    when the session's warehouse dir is not writable/desired."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two identically-bucketed tables — planned without Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
