"""Scan-shape evidence for the image table at scale (VERDICT item 8):
partition pruning, filter pushdown, and column pruning must all reach
the parquet scan — the claims in PLANS.md/COVERAGE.md, backed by the
live physical plan here.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from simplepolygon_spark.functions.cells_sql import cell_col
from simplepolygon_spark.sources.images import images_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cell_partitioned_scan_prunes_partitions(spark, tmp_path):
    """images written partitionBy(coarse cell): a cell-equality filter
    must appear as a PartitionFilter (metadata-only pruning — pruned
    partitions' files are never opened), not a post-scan Filter."""
    imgs = images_df(spark, 2000, partitions=8, with_bytes=False)
    tbl = imgs.withColumn("cell3", cell_col("lon", "lat", 3))
    out = str(tmp_path / "img_by_cell")
    tbl.write.partitionBy("cell3").parquet(out)

    df = spark.read.parquet(out)
    n_parts = df.select("cell3").distinct().count()
    assert n_parts > 8  # the layout actually spreads across many cells

    one_cell = int(df.select("cell3").first().cell3)
    q = df.where(F.col("cell3") == one_cell)
    plan = _plan(q)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and f"= {one_cell}" in m.group(1), plan[:800]

    # behavioral proof: corrupt a parquet file in a DIFFERENT partition;
    # the pruned query must still succeed because pruning means that
    # file is never opened, while an unpruned full scan fails on it
    import os

    other = next(
        d for d in os.listdir(out)
        if d.startswith("cell3=") and d != f"cell3={one_cell}"
    )
    victim_dir = os.path.join(out, other)
    victim = os.path.join(
        victim_dir, next(f for f in os.listdir(victim_dir) if f.endswith(".parquet"))
    )
    with open(victim, "wb") as fh:
        fh.write(b"not a parquet file")
    df2 = spark.read.parquet(out)
    n = df2.where(F.col("cell3") == one_cell).count()  # pruned: survives
    assert n > 0
    try:
        df2.count()  # full scan must hit the corrupted file
        full_scan_failed = False
    except Exception:
        full_scan_failed = True
    assert full_scan_failed


def test_data_filter_and_projection_reach_the_scan(spark, tmp_path):
    """A phash predicate must land in PushedFilters and a 2-column
    projection in ReadSchema — the scan never reads the byte column."""
    imgs = images_df(spark, 1000, partitions=4, with_bytes=True)
    out = str(tmp_path / "img_flat")
    imgs.write.parquet(out)

    df = spark.read.parquet(out)
    q = df.where(F.col("phash") > 0).select("image_id", "caption")
    plan = _plan(q)
    assert re.search(r"PushedFilters: \[.*GreaterThan\(phash,0\)", plan), plan[:800]
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:800]
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"image_id", "caption", "phash"}
    assert "bytes" not in cols  # 100 TB byte column untouched


def test_ivf_probe_pruning_on_centroid_partitioned_corpus(spark, tmp_path):
    """SCALE.md claim made concrete: with the embedding corpus stored
    partitioned by centroid_id, an IVF probe filter is a
    PartitionFilter — non-probed centroid partitions are never opened
    (same corrupted-file proof as the cell test)."""
    import os

    import numpy as np

    from simplepolygon_spark.operators.similarity import ivf_assign

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pdf = emb.limit(8).toPandas()
    C = np.stack([np.asarray(e, np.float64) for e in pdf.embedding])
    assign = ivf_assign(emb, C)
    out = str(tmp_path / "emb_by_centroid")
    emb.join(assign, "vec_id").write.partitionBy("centroid_id").parquet(out)

    df = spark.read.parquet(out)
    probes = [0, 1, 2]
    q = df.where(F.col("centroid_id").isin(probes))
    plan = _plan(q)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan[:800]

    # corrupt a file in a non-probed partition: probed query survives
    other = next(
        d for d in os.listdir(out)
        if d.startswith("centroid_id=") and int(d.split("=")[1]) not in probes
    )
    vdir = os.path.join(out, other)
    victim = os.path.join(
        vdir, next(f for f in os.listdir(vdir) if f.endswith(".parquet"))
    )
    with open(victim, "wb") as fh:
        fh.write(b"garbage")
    df2 = spark.read.parquet(out)
    assert df2.where(F.col("centroid_id").isin(probes)).count() > 0
    try:
        df2.count()
        failed = False
    except Exception:
        failed = True
    assert failed
