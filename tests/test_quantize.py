"""int8 embedding quantization: exact reconstruction bound, zero-vector
contract, and end-to-end fidelity of the dequantized vectors."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from simplepolygon_spark.operators.similarity import (
    dequantize_embeddings,
    quantize_embeddings,
)


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_quantize_reconstruction_bound(spark):
    """|x - q*qscale| <= qscale/2 elementwise, and q fits int8 — the
    exact guarantees of floor(x/scale + 0.5) with scale = max|x|/127."""
    emb = _emb(spark).limit(200)
    joined = (
        quantize_embeddings(emb)
        .join(emb, "vec_id")
        .select("vec_id", "qvec", "qscale", "embedding")
        .collect()
    )
    assert len(joined) == 200
    for r in joined:
        x = np.asarray(r.embedding, dtype=np.float64)
        q = np.asarray(r.qvec, dtype=np.int64)
        assert q.min() >= -127 and q.max() <= 127
        assert np.all(np.abs(x - q * r.qscale) <= r.qscale / 2 + 1e-15)
        assert abs(r.qscale - np.max(np.abs(x)) / 127.0) < 1e-15


def test_quantize_zero_vector(spark):
    z = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [0.0, 3.0, -4.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(z).collect()}
    assert rows[1].qscale == 0.0 and list(rows[1].qvec) == [0, 0, 0]
    assert rows[2].qscale > 0 and list(rows[2].qvec) == [0, 95, -127]


def test_dequantize_roundtrip_cosine(spark):
    """Dequantized vectors stay within ~0.5% cosine of the originals —
    int8 is enough for the ANN bucket/probe stages."""
    emb = _emb(spark).limit(100)
    deq = dequantize_embeddings(quantize_embeddings(emb)).withColumnRenamed(
        "embedding", "deq"
    )
    rows = emb.join(deq, "vec_id").collect()
    for r in rows:
        x = np.asarray(r.embedding, dtype=np.float64)
        y = np.asarray(r.deq, dtype=np.float64)
        nx, ny = np.linalg.norm(x), np.linalg.norm(y)
        if nx == 0:
            assert ny == 0
            continue
        cos = float(x @ y / (nx * ny))
        assert cos > 0.995


def test_quantize_plan_is_expression_only(spark):
    """No Exchange, no Python eval — quantization is codegen-side."""
    plan = (
        quantize_embeddings(_emb(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF/eval stages


def test_quantized_topk_matches_float_topk(spark):
    """Probing the int8 store agrees with the float store: identical
    rank-1 neighbor per query and high top-k overlap (quantization can
    only flip near-ties)."""
    from simplepolygon_spark.operators.similarity import (
        cosine_topk_arrow,
        cosine_topk_quantized,
    )

    emb = _emb(spark)
    queries = {
        r.vec_id: np.asarray(r.embedding, np.float64)
        for r in emb.where(F.col("vec_id") < 4).collect()
    }
    k = 5
    f = cosine_topk_arrow(emb, queries, k=k).collect()
    q = cosine_topk_quantized(quantize_embeddings(emb), queries, k=k).collect()
    ftop = {(r.query_id, r.rank): r.vec_id for r in f}
    qtop = {(r.query_id, r.rank): r.vec_id for r in q}
    for qid in queries:
        # rank 1 (the query itself at cosine 1) must agree exactly
        assert ftop[(qid, 1)] == qtop[(qid, 1)]
        fset = {ftop[(qid, r)] for r in range(1, k + 1)}
        qset = {qtop[(qid, r)] for r in range(1, k + 1)}
        assert len(fset & qset) >= k - 1  # at most one near-tie flip


def test_quantized_probe_prunes_qscale(spark, tmp_path):
    """Over the at-rest parquet store, the probe's scan reads vec_id +
    qvec ONLY — cosine is scale-invariant, so qscale is column-pruned
    away (the 4x-compression read path is real, not just smaller
    numbers in a wider scan)."""
    from simplepolygon_spark.operators.similarity import cosine_topk_quantized

    emb = _emb(spark).limit(100)
    store = str(tmp_path / "qstore")
    quantize_embeddings(emb).write.parquet(store)
    queries = {
        r.vec_id: np.asarray(r.embedding, np.float64)
        for r in emb.where(F.col("vec_id") < 2).collect()
    }
    probe = cosine_topk_quantized(spark.read.parquet(store), queries, k=3)
    scan_lines = [
        ln
        for ln in probe._jdf.queryExecution().executedPlan().toString().splitlines()
        if "ReadSchema" in ln
    ]
    assert scan_lines and all("qscale" not in ln for ln in scan_lines)
    assert probe.count() == 2 * 3


def test_ivf_quantized_store(spark):
    """The full compressed-ANN at-rest layout: ivf_assign on the FLOAT
    vectors → quantize → probe via ivf_topk_quantized.  At probes =
    n_centroids (exact search) the result agrees with the float IVF on
    rank-1 per query and ≥k−1 of top-k; and the guard refuses a
    quantized store without an assignment column."""
    from simplepolygon_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
        ivf_topk_quantized,
        kmeans_centroids,
    )

    emb = _emb(spark).limit(300)
    X = np.stack(
        [np.asarray(r.embedding, np.float64) for r in emb.collect()]
    )
    C = kmeans_centroids(X, n_centroids=8, iters=4)
    cid = ivf_assign(emb, C)  # (vec_id, centroid_id) — float-space argmin
    assigned = emb.join(cid, "vec_id")
    qstore = quantize_embeddings(emb).join(cid, "vec_id")
    queries = {
        r.vec_id: np.asarray(r.embedding, np.float64)
        for r in emb.where(F.col("vec_id") < 3).collect()
    }
    k = 5
    f = ivf_topk(assigned, queries, C, k=k, probes=8, centroid_col="centroid_id")
    q = ivf_topk_quantized(qstore, queries, C, k=k, probes=8)
    ftop = {(r.query_id, r.rank): r.vec_id for r in f.collect()}
    qtop = {(r.query_id, r.rank): r.vec_id for r in q.collect()}
    for qid in queries:
        assert ftop[(qid, 1)] == qtop[(qid, 1)]
        fset = {v for (qq, _), v in ftop.items() if qq == qid}
        qset = {v for (qq, _), v in qtop.items() if qq == qid}
        assert len(fset & qset) >= k - 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="centroid_col"):
        ivf_topk(
            quantize_embeddings(emb), queries, C, k=k, probes=8, vec_col="qvec"
        )


def test_quantize_long_equals_exploded_array_form(spark):
    """The flattened scalar-codegen form (quantize_embeddings_long, the
    q:quantize gate shape) is row-for-row BIT-identical to exploding
    the array form — same IEEE rule, different evaluation order; the
    zero-vector branch is exercised explicitly."""
    from simplepolygon_spark.operators.similarity import (
        quantize_embeddings,
        quantize_embeddings_long,
    )

    emb = _emb(spark).select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [(10**6, [0.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
        )
    )
    via_array = (
        quantize_embeddings(emb)
        .select("vec_id", F.posexplode("qvec").alias("i", "q8"), "qscale")
        .selectExpr("vec_id", "CAST(i AS INT) i", "CAST(q8 AS INT) q", "qscale")
    )
    long_form = quantize_embeddings_long(emb)
    a = sorted(map(tuple, via_array.collect()))
    b = sorted(map(tuple, long_form.collect()))
    assert a == b
    # long form stays JVM-only as well (no Python eval anywhere)
    plan = long_form._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
