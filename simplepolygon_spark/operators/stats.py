"""Distributed second-moment statistics over embedding columns —
covariance, PCA, and whitening: the preprocessing step embedding
pipelines run before cosine dedup / ANN (decorrelated, equal-variance
dimensions make cosine thresholds meaningful corpus-wide).

Scale shape (the same partial-sum pattern as the distributed k-means in
similarity.py): ONE corpus scan emits per-batch partial sums — a d
vector and a d×d matrix per Arrow batch, independent of batch row
count — reduced map-side to k·d² tiny rows; the corpus itself never
shuffles, and only d² doubles ever reach the driver.  The
eigendecomposition of a d×d matrix is driver-side numpy by design
(d ≤ a few thousand; the CORPUS-sized work is the moment
accumulation).  Projection/whitening is a per-batch matmul in
mapInArrow — no shuffle, no state.

q:covariance gates the distributed moment accumulation against a DuckDB
relational oracle (double unnest → pairwise products → group-by); the
eigen step is verified against single-node numpy on the same data plus
a partitioning-invariance test (accumulation order differences are
~1e-13 relative, asserted with allclose).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _emb_matrix


def _moment_partials(vec_col: str):
    """mapInArrow kernel: per batch emit (n, sum_vec, sum_outer) — the
    sufficient statistics for mean and covariance."""

    def run(batches):
        for batch in batches:
            arr = batch.column(vec_col)
            if len(arr) == 0:
                continue
            X = _emb_matrix(arr)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([len(arr)], pa.int64()),
                    pa.array([X.sum(axis=0).tolist()], pa.list_(pa.float64())),
                    pa.array(
                        [(X.T @ X).reshape(-1).tolist()], pa.list_(pa.float64())
                    ),
                ],
                names=["n", "s", "ss"],
            )

    return run


def moment_sums(emb: DataFrame, vec_col: str = "embedding"):
    """(count, sum vector, raw second-moment matrix) of the corpus —
    one scan, one map-side-combined exchange of (index, partial) rows,
    d + d² doubles to the driver."""
    src = emb.select(F.col(vec_col).cast("array<double>").alias("_v"))
    partials = src.mapInArrow(_moment_partials("_v"), "n long, s array<double>, ss array<double>")
    rows = (
        partials.select(
            "n",
            F.posexplode(F.concat("s", "ss")).alias("i", "val"),
        )
        .groupBy("i")
        .agg(F.sum("val").alias("v"), F.sum("n").alias("cnt"))
        .collect()
    )
    if not rows:
        raise ValueError("moment_sums: empty corpus")
    # every index must have seen EVERY row: a corpus mixing embedding
    # dimensions (each batch internally rectangular, so _emb_matrix
    # cannot catch it) produces short batches that skip the tail
    # indices — the counts disagree, and summing such moments would
    # silently conflate s[i] of one dimension with ss[j] of another
    counts = {r.cnt for r in rows}
    if len(counts) != 1:
        raise ValueError(
            "moment_sums: mixed embedding dimensions in the corpus "
            f"(per-index row counts disagree: {sorted(counts)}); split "
            "the corpus by dimension first"
        )
    total = counts.pop()
    vals = np.zeros(len(rows))
    for r in rows:
        vals[r.i] = r.v
    # infer d from d + d² = len(vals)
    d = int((-1 + np.sqrt(1 + 4 * len(vals))) / 2)
    if d + d * d != len(vals):
        raise ValueError(f"moment_sums: inconsistent moment length {len(vals)}")
    s = vals[:d]
    ss = vals[d:].reshape(d, d)
    return int(total), s, ss


def covariance_matrix(emb: DataFrame, vec_col: str = "embedding") -> np.ndarray:
    """Population covariance (divide by n) of the embedding corpus,
    computed distributed; returns the d×d numpy matrix."""
    n, s, ss = moment_sums(emb, vec_col)
    mean = s / n
    return ss / n - np.outer(mean, mean)


def covariance_df(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, cov) rows of the population covariance — the oracle-
    comparable relational form of ``covariance_matrix`` (values rounded
    to 6 dp: engines sum in different orders, and ~1e-11 absolute
    jitter must stay far from the rounding boundary).  The d×d result
    is dim-sized by definition — materializing it driver-side is the
    design, not a shortcut."""
    C = covariance_matrix(emb, vec_col)
    spark = emb.sparkSession
    d = C.shape[0]
    rows = [(i, j, float(C[i, j])) for i in range(d) for j in range(d)]
    # round in Spark SQL (HALF_UP — the same mode DuckDB's round uses),
    # not Python round() (banker's half-even): across d² gated entries
    # a half-boundary value would otherwise flip the hash.  + 0.0
    # flushes IEEE negative zero: a tiny negative covariance rounds to
    # -0.0 in one engine and +0.0 in the other depending on summation
    # order, and string-keyed hash compares treat them as different.
    return spark.createDataFrame(rows, "i int, j int, cov double").select(
        "i", "j", (F.round("cov", 6) + F.lit(0.0)).alias("cov")
    )


def pca_fit(
    emb: DataFrame, k: int | None, vec_col: str = "embedding"
) -> dict:
    """Fit a PCA/whitening model on the cluster: distributed moment
    accumulation (one scan), driver-side eigendecomposition of the d×d
    covariance.  Returns {mean (d), components (k×d), eigvals (k)} —
    components are the top-k eigenvectors, sign-canonicalized (largest-
    |coordinate| entry positive) so results are partitioning- and
    library-stable.  ``k=None`` keeps every component (a pure rotation
    — the whitening-without-reduction case)."""
    n, s, ss = moment_sums(emb, vec_col)
    mean = s / n
    C = ss / n - np.outer(mean, mean)
    if k is None:
        k = C.shape[0]
    if not (1 <= k <= C.shape[0]):
        raise ValueError(f"pca_fit: k ({k}) must be in [1, d={C.shape[0]}]")
    w, V = np.linalg.eigh(C)  # ascending eigenvalues
    # a rank-deficient corpus (n < d, collinear dims) yields numerically
    # NEGATIVE null-space eigenvalues (~||C||·d·ulp); clamp to 0 so a
    # later whitening sqrt cannot go NaN-silent
    w = np.maximum(w, 0.0)
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order].T  # k × d
    for r in range(comps.shape[0]):
        j = int(np.abs(comps[r]).argmax())
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return {"mean": mean, "components": comps, "eigvals": w[order]}


def pca_project(
    emb: DataFrame,
    model: dict,
    whiten: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-12,
) -> DataFrame:
    """(id, projected array<double>): center on the model mean and
    project onto its components — one matmul per Arrow batch, no
    shuffle.  ``whiten=True`` additionally scales each component by
    1/sqrt(eigval + eps), giving unit variance per dimension (the
    pre-conditioning step before cosine dedup thresholds)."""
    mean = np.asarray(model["mean"], np.float64)
    comps = np.asarray(model["components"], np.float64)
    if whiten:
        # clamp defensively even though pca_fit already clamps — a
        # hand-built model with a negative eigenvalue must not produce
        # silent all-NaN projections
        ev = np.maximum(np.asarray(model["eigvals"], np.float64), 0.0)
        comps = comps / np.sqrt(ev + eps)[:, None]
    # the id column passes through the kernel untouched, so its output
    # type is its INPUT type — hardcoding long broke string/int32 ids
    # with an Arrow schema mismatch at runtime (round-4 advice)
    id_type = emb.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, projected array<double>"

    def run(batches):
        for batch in batches:
            ids = batch.column(id_col)
            if len(ids) == 0:
                continue
            X = _emb_matrix(batch.column(vec_col))
            P = (X - mean) @ comps.T
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(list(P), pa.list_(pa.float64()))],
                names=[id_col, "projected"],
            )

    return emb.select(id_col, vec_col).mapInArrow(run, schema)
