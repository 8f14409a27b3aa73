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


def test_ivf_topk_uses_at_rest_assignment_and_prunes(spark, tmp_path):
    """VERDICT r2 item 5 end-to-end: ivf_topk(centroid_col=...) must
    (a) produce exactly the recompute-path result, (b) never open
    non-probed centroid partitions (corrupted-file proof), and (c) take
    the assignment from the column, not a per-batch distance matrix —
    proven by poisoning the stored assignment of one row: the column
    path must reflect the poisoned value where recompute would not."""
    import os

    import numpy as np

    from simplepolygon_spark.operators.similarity import ivf_assign, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pdf = emb.limit(8).toPandas()
    C = np.stack([np.asarray(e, np.float64) for e in pdf.embedding])
    assign = ivf_assign(emb, C)
    out = str(tmp_path / "emb_ivf")
    emb.join(assign, "vec_id").write.partitionBy("centroid_id").parquet(out)
    at_rest = spark.read.parquet(out)

    qn = {int(r.vec_id): np.asarray(r.embedding, np.float64) for r in pdf.itertuples()}
    queries = {k: qn[k] for k in list(qn)[:3]}

    base = ivf_topk(emb, queries, C, k=5, probes=3)
    fast = ivf_topk(at_rest, queries, C, k=5, probes=3, centroid_col="centroid_id")
    key = lambda r: (r.query_id, r.rank)
    brows = sorted(((r.query_id, r.rank, r.vec_id, r.cosine) for r in base.collect()))
    frows = sorted(((r.query_id, r.rank, r.vec_id, r.cosine) for r in fast.collect()))
    assert frows == brows and len(frows) == 15

    # which centroids does this query set probe?
    dq = ((np.stack([queries[q] for q in sorted(queries)])[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probed = set()
    for row in dq:
        probed.update(np.argsort(row, kind="stable")[:3].tolist())
    non_probed = [c for c in range(len(C)) if c not in probed]
    assert non_probed, "test needs at least one non-probed centroid"

    # corrupt every file of one non-probed partition: the column path
    # must still run (pruning = those files never opened)
    vdir = os.path.join(out, f"centroid_id={non_probed[0]}")
    for f in os.listdir(vdir):
        if f.endswith(".parquet"):
            with open(os.path.join(vdir, f), "wb") as fh:
                fh.write(b"garbage")
    at_rest2 = spark.read.parquet(out)
    fast2 = ivf_topk(at_rest2, queries, C, k=5, probes=3, centroid_col="centroid_id")
    assert sorted(((r.query_id, r.rank, r.vec_id, r.cosine) for r in fast2.collect())) == brows

    # (c) the column is authoritative — no per-batch reassignment:
    # overriding every stored assignment to a single non-probed centroid
    # must yield ZERO rows (recompute would still find the true ones)
    poisoned = at_rest.withColumn(
        "centroid_id", F.lit(non_probed[0]).cast("int")
    )
    empty = ivf_topk(poisoned, queries, C, k=5, probes=3, centroid_col="centroid_id")
    assert empty.count() == 0
