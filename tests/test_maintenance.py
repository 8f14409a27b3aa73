"""compact_table: small-file compaction with staged, verified,
two-rename publish."""

import os

import pytest
from pyspark.sql import functions as F

from simplepolygon_spark.operators.maintenance import _parquet_bytes, compact_table


def _write_fragmented(spark, path, n_rows=1000, n_files=50):
    spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 5).cast("string").alias("lang")
    ).repartition(n_files).write.parquet(path)


def test_compacts_to_one_file_and_preserves_rows(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _write_fragmented(spark, t, n_files=50)
    before = spark.read.parquet(t).orderBy("id").collect()
    stats = compact_table(spark, t, target_file_bytes=1 << 30)
    assert stats["files_before"] >= 50
    assert stats["files_after"] == 1
    assert stats["rows"] == 1000
    after = spark.read.parquet(t).orderBy("id").collect()
    assert after == before
    # no staging/backup residue
    assert not os.path.exists(t + ".__compact_tmp")
    assert not os.path.exists(t + ".__compact_old")


def test_target_size_yields_multiple_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _write_fragmented(spark, t, n_rows=20000, n_files=40)
    total, _ = _parquet_bytes(t)
    stats = compact_table(spark, t, target_file_bytes=max(1, total // 4))
    assert 2 <= stats["files_after"] < 40


def test_partitioned_one_file_per_partition(spark, tmp_path):
    t = str(tmp_path / "tbl")
    spark.range(500).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("lang")
    ).repartition(30).write.partitionBy("lang").parquet(t)
    before = spark.read.parquet(t).orderBy("id").collect()
    compact_table(spark, t, partition_cols=("lang",))
    for v in ("0", "1", "2"):
        d = os.path.join(t, f"lang={v}")
        parts = [f for f in os.listdir(d) if not f.startswith(("_", "."))]
        assert len(parts) == 1, f"lang={v} has {len(parts)} files"
    after = spark.read.parquet(t).orderBy("id").collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))


def test_leftover_staging_dir_is_cleared(spark, tmp_path):
    t = str(tmp_path / "tbl")
    _write_fragmented(spark, t, n_files=5)
    os.makedirs(t + ".__compact_tmp/junk")
    stats = compact_table(spark, t, target_file_bytes=1 << 30)
    assert stats["files_after"] == 1
    assert not os.path.exists(t + ".__compact_tmp")


def test_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="no such table"):
        compact_table(spark, str(tmp_path / "missing"))
    t = str(tmp_path / "tbl")
    _write_fragmented(spark, t, n_files=2)
    with pytest.raises(ValueError, match="partition column"):
        compact_table(spark, t, partition_cols=("nope",))
    with pytest.raises(ValueError, match="target_file_bytes"):
        compact_table(spark, t, target_file_bytes=0)


# ------------------------------------------------------------ cluster_table


def _scattered(spark, path, n_rows=20000, n_files=10):
    # key scattered across every file: hash-shuffled writes
    spark.range(n_rows).select(
        F.col("id"), F.pmod(F.col("id") * 2654435761, F.lit(n_rows)).alias("cell")
    ).repartition(n_files).write.parquet(path)


def test_cluster_table_makes_footer_stats_prune(spark, tmp_path):
    from simplepolygon_spark.operators.maintenance import (
        cluster_table,
        key_range_overlap_fraction,
    )

    t = str(tmp_path / "tbl")
    _scattered(spark, t)
    total, _ = _parquet_bytes(t)
    # before: a narrow cell range overlaps (nearly) every row group
    before = key_range_overlap_fraction(t, "cell", 100, 300)
    assert before > 0.9
    rows_before = spark.read.parquet(t).orderBy("id").collect()

    stats = cluster_table(spark, t, ("cell",), target_file_bytes=max(1, total // 8))
    assert stats["files_after"] >= 4
    after = key_range_overlap_fraction(t, "cell", 100, 300)
    assert after <= 0.5, f"clustered table still {after:.0%} overlapped"
    # data unchanged
    assert spark.read.parquet(t).orderBy("id").collect() == rows_before
    assert not os.path.exists(t + ".__cluster_tmp")
    assert not os.path.exists(t + ".__cluster_old")


def test_cluster_table_guards(spark, tmp_path):
    from simplepolygon_spark.operators.maintenance import cluster_table

    with pytest.raises(ValueError, match="no such table"):
        cluster_table(spark, str(tmp_path / "missing"), ("cell",))
    t = str(tmp_path / "tbl")
    _scattered(spark, t, n_rows=100, n_files=2)
    with pytest.raises(ValueError, match="order_cols"):
        cluster_table(spark, t, ())
    with pytest.raises(ValueError, match="no order column"):
        cluster_table(spark, t, ("nope",))
