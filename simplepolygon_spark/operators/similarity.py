"""Similarity search over an embedding column (array<float>).

Two paths with identical results contract:

  cosine_topk_window — relational: broadcast the (small) query set,
      JVM zip_with/aggregate dot products, row_number window per query.
      Fully SQL-expressible → serves as the DuckDB oracle shape.
  cosine_topk_arrow  — scale path: queries broadcast as a numpy matrix,
      each corpus Arrow batch does one matmul + argpartition per query
      — no shuffle, no window sort; the 100 TB plan.

  ivf_topk           — IVF approximate path: deterministic k-means
      (seeded, driver-side on a sample) → corpus partitioned by nearest
      centroid → queries probe the P nearest centroid lists only.
      Trades recall for a candidate-set bound; recall measured in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _emb_matrix(arr) -> np.ndarray:
    """list<float> Arrow column → (n, d) float64 matrix WITHOUT a
    to_pylist() detour: flatten() honors list offsets and fixed-dim
    embeddings make the reshape valid.  to_pylist() materializes n·d
    Python float objects per batch — an order-of-magnitude slowdown on
    the hot paths this module documents as the 100 TB plan.

    NULL or ragged entries are rejected loudly: flatten() silently
    SKIPS a null list, so an unguarded reshape would either misalign
    every row after the null (when the sizes happen to divide) or die
    with an unattributed reshape error."""
    if arr.null_count:
        raise ValueError(
            f"{arr.null_count} NULL embedding(s) in batch — filter or "
            "impute upstream; a NULL would silently misalign the matrix"
        )
    offs = getattr(arr, "offsets", None)
    if offs is not None:
        # per-row lengths from the list offsets: catches ragged batches
        # whose TOTAL happens to divide n (e.g. lengths 127+129 reshaped
        # as 2×128 — every row silently wrong)
        lens = np.diff(offs.to_numpy(zero_copy_only=False))
        if lens.size and (lens != lens[0]).any():
            raise ValueError(
                f"ragged embeddings in batch: lengths "
                f"{int(lens.min())}..{int(lens.max())}"
            )
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    if flat.size % n != 0:
        raise ValueError(
            f"ragged embeddings in batch: {flat.size} values across {n} rows"
        )
    return flat.reshape(n, -1)


def _norm_expr(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
    )


def cosine_topk_window(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """(query_id, vec_id, cosine, rank) — relational formulation.

    corpus: (vec_id, embedding); queries: (query_id, embedding).
    """
    c = corpus.select("vec_id", F.col("embedding").alias("cv"), _norm_expr(F.col("embedding")).alias("cn"))
    q = queries.select("query_id", F.col("embedding").alias("qv"), _norm_expr(F.col("embedding")).alias("qn"))
    j = c.crossJoin(F.broadcast(q))
    dot = F.aggregate(
        F.zip_with("cv", "qv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    cos = dot / (F.col("cn") * F.col("qn"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        j.select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def cosine_topk_arrow(
    corpus: DataFrame,
    queries_np: dict[int, np.ndarray],
    k: int = 5,
    vec_col: str = "embedding",
) -> DataFrame:
    """Scale path: per-batch matmul top-k, then a single tiny global
    top-k per query (tree-reduced by Spark's sort of B·Q·k rows).

    ``queries_np``: query_id → float64 vector (already on the driver —
    the query set is small by definition of top-k search).
    ``vec_col`` may be any fixed-dim numeric list column — rows are
    normalized in the kernel, so an int8 ``qvec`` works directly
    (see ``cosine_topk_quantized``).
    """
    qids = sorted(queries_np)
    Q = np.stack([np.asarray(queries_np[q], np.float64) for q in qids])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    schema = "query_id long, vec_id long, cosine double"

    def run(batches):
        for batch in batches:
            vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            if len(vids) == 0:
                continue
            emb = _emb_matrix(batch.column(vec_col))
            En = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = En @ Qn.T  # B × Q
            kk = min(k, len(vids))
            o_q, o_v, o_c = [], [], []
            for qi, qid in enumerate(qids):
                # per-batch selection under the SAME total order as the
                # global window (rounded cosine desc, vec_id asc) — an
                # argpartition on unrounded values could drop a row that
                # ties at the boundary after rounding, making output
                # depend on Arrow batch boundaries
                rounded = np.round(sims[:, qi], 6)
                sel = np.lexsort((vids, -rounded))[:kk]
                o_q.extend([qid] * kk)
                o_v.extend(vids[sel].tolist())
                o_c.extend(rounded[sel].tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_q, pa.int64()),
                    pa.array(o_v, pa.int64()),
                    pa.array(o_c, pa.float64()),
                ],
                names=["query_id", "vec_id", "cosine"],
            )

    partial = corpus.select("vec_id", vec_col).mapInArrow(run, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def kmeans_centroids(
    vectors: np.ndarray, n_centroids: int = 16, iters: int = 8, seed: int = 3
) -> np.ndarray:
    """Deterministic plain k-means (numpy, driver-side on a sample).
    Small-scale / oracle shape; the cluster path is
    ``kmeans_fit_distributed``."""
    rng = np.random.default_rng(seed)
    X = np.asarray(vectors, np.float64)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(len(C)):
            m = a == c
            if m.any():
                C[c] = X[m].mean(axis=0)
    return C


def kmeans_fit_distributed(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 8,
    init: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-9,
    return_iters: bool = False,
):
    """K-means fitted ON THE CLUSTER — the IVF index-build path when the
    corpus (or even a fair sample) no longer fits the driver.

    Per iteration: ONE corpus scan (an Arrow kernel assigns each batch
    to the broadcast centroids and emits per-centroid PARTIAL sums — at
    most n_centroids rows per batch, each carrying a d-vector and a
    count) and one tiny exchange (posexplode to (cid, dim, partial) →
    map-side-combined SUM → k·d rows to the driver).  Data moved per
    iteration is O(tasks · k · d), independent of corpus size; the
    corpus itself never shuffles.  The narrow (id, vector) projection
    is persisted for the duration of the fit (each iteration re-reads
    it) and unpersisted on return; iteration stops early when the max
    centroid movement (L∞ over all coordinates) drops below ``tol`` —
    ``iters`` is the upper bound, not a fixed scan count.
    ``return_iters=True`` returns ``(centroids, iterations_used)``.

    ``init``: explicit initial centroids (driver-chosen or from
    ``kmeans_centroids`` on a sample).  Default: the ``n_centroids``
    corpus vectors with the smallest md5(id) — deterministic across
    runs, partitionings, and cluster sizes.

    Results match single-node k-means from the same init to float
    accumulation order (partial sums combine in task order; differences
    are ~1e-13 relative — asserted with allclose in tests)."""
    d0 = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    ).persist()
    # everything after the persist — including the default-init collect,
    # which can fail on malformed vectors — sits under the unpersist
    # finally, or an init-time failure would leak the cached projection
    try:
        if init is None:
            first = (
                d0.withColumn("_o", F.md5(F.col("_id").cast("string")))
                .orderBy("_o", "_id")
                .limit(n_centroids)
                .collect()
            )
            C = np.asarray([r._v for r in first], np.float64)
        else:
            C = np.asarray(init, np.float64).copy()
        k = len(C)

        schema = "cid int, cnt long, sums array<double>"

        def make_run(C_now: np.ndarray):
            def run(batches):
                for batch in batches:
                    arr = batch.column("_v")
                    n = len(arr)
                    if n == 0:
                        continue
                    X = _emb_matrix(arr)
                    dist = ((X[:, None, :] - C_now[None, :, :]) ** 2).sum(axis=2)
                    a = dist.argmin(axis=1)
                    cids, cnts, sums = [], [], []
                    for c in np.unique(a):
                        m = a == c
                        cids.append(int(c))
                        cnts.append(int(m.sum()))
                        sums.append(X[m].sum(axis=0).tolist())
                    yield pa.RecordBatch.from_arrays(
                        [
                            pa.array(cids, pa.int32()),
                            pa.array(cnts, pa.int64()),
                            pa.array(sums, pa.list_(pa.float64())),
                        ],
                        names=["cid", "cnt", "sums"],
                    )

            return run

        used = 0
        for _ in range(iters):
            used += 1
            partials = d0.select("_v").mapInArrow(make_run(C), schema)
            rows = (
                partials.select(
                    "cid", "cnt", F.posexplode("sums").alias("dim", "val")
                )
                .groupBy("cid", "dim")
                .agg(F.sum("val").alias("s"), F.sum("cnt").alias("n"))
                .collect()
            )
            sums = np.zeros_like(C)
            counts = np.zeros(k, np.int64)
            for r in rows:
                sums[r.cid, r.dim] = r.s
                if r.dim == 0:  # cnt is replicated across dims; read it once
                    counts[r.cid] = r.n
            newC = C.copy()  # empty clusters keep their centroid
            nz = counts > 0
            newC[nz] = sums[nz] / counts[nz, None]
            moved = float(np.abs(newC - C).max()) if k else 0.0
            C = newC
            if moved < tol:
                break  # converged: skip the remaining scans
    finally:
        d0.unpersist()
    return (C, used) if return_iters else C


def ivf_assign(corpus: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Add ``centroid_id`` = nearest centroid per corpus vector."""
    schema = "vec_id long, centroid_id int"

    def run(batches):
        C = np.asarray(centroids, np.float64)
        for batch in batches:
            vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            if len(vids) == 0:
                continue
            emb = _emb_matrix(batch.column("embedding"))
            # assign on sqrt(d2), the EMITTED metric of SQL oracles
            # (list_distance): sqrt collapses some adjacent doubles, and
            # on a collapsed tie argmin's first-min rule picks the lowest
            # centroid id — exactly the oracle's ORDER BY dist, cid.
            # Ordering on raw d2 would keep the true nearer centroid on
            # such ties and diverge (same hazard knn.py documents).
            d = np.sqrt(((emb[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vids.astype(np.int64), pa.int64()),
                    pa.array(d.argmin(axis=1).astype(np.int32), pa.int32()),
                ],
                names=["vec_id", "centroid_id"],
            )

    return corpus.select("vec_id", "embedding").mapInArrow(run, schema)


# Measured recall anchors for ivf_topk (BENCH/IVF_RECALL.md: sf0.01
# embeddings, 16 centroids, 32 queries, k=10): (probes/n_centroids,
# recall@10).  The fraction-of-lists axis is what transfers across
# centroid counts; the endpoint (1.0, 1.0) is exact by construction
# (all lists probed == brute force), the rest are measured, not modeled.
IVF_RECALL_ANCHORS = (
    (1 / 16, 0.306),
    (2 / 16, 0.412),
    (4 / 16, 0.591),
    (8 / 16, 0.794),
    (1.0, 1.0),
)


def ivf_probes_for_recall(n_centroids: int, target_recall: float) -> int:
    """Smallest probe count whose expected recall (linear interpolation
    over the MEASURED ``IVF_RECALL_ANCHORS`` curve, by fraction of lists
    probed) meets ``target_recall`` — the supported way to pick
    ``ivf_topk``'s ``probes`` from a quality target instead of guessing.
    Conservative below the first anchor (interpolates from (0, 0));
    ``target_recall >= 1`` returns ``n_centroids`` (exact search).  The
    curve was measured on one corpus (see BENCH/IVF_RECALL.md) — treat
    the result as a starting point and re-measure on corpora with very
    different cluster structure."""
    if not (1 <= n_centroids):
        raise ValueError(f"n_centroids ({n_centroids}) must be >= 1")
    if target_recall >= 1.0:
        return n_centroids
    anchors = ((0.0, 0.0),) + IVF_RECALL_ANCHORS
    for p in range(1, n_centroids + 1):
        f = p / n_centroids
        rec = 1.0
        for (f0, r0), (f1, r1) in zip(anchors, anchors[1:]):
            if f <= f1:
                rec = r0 + (r1 - r0) * (f - f0) / (f1 - f0)
                break
        if rec >= target_recall:
            return p
    return n_centroids


def ivf_topk(
    corpus: DataFrame,
    queries_np: dict[int, np.ndarray],
    centroids: np.ndarray,
    k: int = 5,
    probes: int | None = None,
    centroid_col: str | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k in ONE corpus pass: every query's probe
    list (its ``probes`` nearest centroids) is broadcast with the query
    matrix; each Arrow batch assigns its vectors to centroids (argmin
    L2, ties to the lowest centroid id), masks per query to probed
    centroids, computes cosines vectorized, and emits per-batch top-k;
    a single tiny window reduce yields the global top-k.  No join, no
    per-query plan branch (round-1 advice: the old form built Q filtered
    scans + a corpus↔assign shuffle).

    ``probes`` is REQUIRED — there is no safe default: recall falls off
    a cliff at low probe counts (measured, BENCH/IVF_RECALL.md: 0.31@1
    probe, 0.59@4, 0.79@8, 1.00@16 of 16 centroids) and a silent
    default would hand naive callers a 30%-recall search that looks
    fine on planted-duplicate tests.  Pick it explicitly, or derive it
    from a quality target with ``ivf_probes_for_recall(n_centroids,
    target_recall)``; ``probes = n_centroids`` is exact (every list
    searched).

    ``centroid_col``: name of a pre-assigned centroid id column (the
    at-rest layout ``ivf_assign`` + ``partitionBy(centroid_id)``
    produces).  When given, (a) the corpus is FILTERED to the union of
    all probe lists — on a centroid-partitioned table that filter is a
    PartitionFilter, so non-probed partitions are never opened
    (tests/test_partition_pruning.py proves this behaviorally) — and
    (b) the kernel reads the assignment from the column instead of
    recomputing the per-batch B×C distance matrix.  The assignment must
    come from the SAME centroids (``ivf_assign``'s argmin, ties to the
    lowest id) or probe masks won't line up."""
    C = np.asarray(centroids, np.float64)
    if probes is None:
        raise ValueError(
            "ivf_topk: probes is required — recall degrades steeply at "
            "low probe counts (measured: 0.31 recall@10 at 1 of 16 "
            "probes, 1.00 at 16; BENCH/IVF_RECALL.md).  Pass probes "
            "explicitly, derive it with ivf_probes_for_recall("
            f"n_centroids={len(C)}, target_recall), or use "
            f"probes={len(C)} for exact search."
        )
    if not (1 <= probes <= len(C)):
        raise ValueError(
            f"ivf_topk: probes ({probes}) must be in [1, n_centroids={len(C)}]"
        )
    if vec_col != "embedding" and centroid_col is None:
        # cosine is scale-invariant but the L2 centroid ASSIGNMENT is
        # not: argmin over int8-space rows against float centroids
        # misassigns silently.  A non-float store must carry the
        # assignment made on the float vectors (the at-rest layout).
        raise ValueError(
            f"ivf_topk: vec_col={vec_col!r} (a non-float store) requires "
            "centroid_col — in-kernel L2 assignment on rescaled vectors "
            "against float centroids would silently misassign; assign "
            "with ivf_assign BEFORE quantizing (the at-rest layout)"
        )
    qids = sorted(queries_np)
    Q = np.stack([np.asarray(queries_np[q], np.float64) for q in qids])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    # sqrt for oracle tie parity (see ivf_assign) — probe ranking must
    # match ORDER BY list_distance, cid when sqrt collapses two d2
    dq = np.sqrt(((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))  # Q × C
    probe_mask = np.zeros((len(qids), len(C)), dtype=bool)
    for qi in range(len(qids)):
        probe_mask[qi, np.argsort(dq[qi], kind="stable")[:probes]] = True

    schema = "query_id long, vec_id long, cosine double"
    probed_union = sorted(int(c) for c in np.nonzero(probe_mask.any(axis=0))[0])

    def run(batches):
        for batch in batches:
            vids = batch.column("vec_id").to_numpy(zero_copy_only=False)
            if len(vids) == 0:
                continue
            emb = _emb_matrix(batch.column(vec_col))
            if centroid_col is not None:
                cid = batch.column(centroid_col).to_numpy(zero_copy_only=False)
                cid = cid.astype(np.int64)
            else:
                # sqrt for oracle tie parity (see ivf_assign)
                d = np.sqrt(((emb[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
                cid = d.argmin(axis=1)  # first min == lowest centroid id
            En = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            sims = En @ Qn.T  # B × Q
            o_q, o_v, o_c = [], [], []
            for qi, qid in enumerate(qids):
                m = probe_mask[qi, cid]
                if not m.any():
                    continue
                # tie-safe selection: same total order as the global
                # window (rounded cosine desc, vec_id asc)
                rounded = np.round(sims[m, qi], 6)
                mv = vids[m]
                kk = min(k, len(rounded))
                top = np.lexsort((mv, -rounded))[:kk]
                o_q.extend([qid] * kk)
                o_v.extend(mv[top].tolist())
                o_c.extend(rounded[top].tolist())
            if not o_q:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_q, pa.int64()),
                    pa.array(o_v, pa.int64()),
                    pa.array(o_c, pa.float64()),
                ],
                names=["query_id", "vec_id", "cosine"],
            )

    if centroid_col is not None:
        src = corpus.where(F.col(centroid_col).isin(probed_union)).select(
            "vec_id", vec_col, centroid_col
        )
    else:
        src = corpus.select("vec_id", vec_col)
    partial = src.mapInArrow(run, schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "vec_id")
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, qvec array<tinyint>, qscale double): symmetric per-vector
    int8 quantization — the 4× (vs float32) storage/bandwidth
    compression an ANN store runs at 100 TB scale.  ``qscale`` =
    max|x|/127; ``q_i = floor(x_i/qscale + 0.5)`` (explicit
    floor(+0.5) instead of round() so the rule is ONE deterministic
    IEEE expression in every engine — Spark's round is HALF_UP,
    DuckDB's HALF_EVEN).  All-zero vectors keep qscale 0 and an
    all-zero qvec.  Reconstruction ``q_i·qscale`` is within
    qscale/2 of x_i elementwise — the exact bound test_quantize pins.

    Scale: pure JVM column expressions (transform/array_max — no
    Python, no shuffle); quantize on write, keep qvec+qscale as the
    at-rest ANN representation, dequantize (or score directly in
    int8) inside the probe kernel.  q:quantize gates the full rule
    cross-engine against DuckDB bit-for-bit — including qscale,
    because every step is shared-IEEE arithmetic on exact casts."""
    # two projections, NOT one: the max|x| reduction is aliased in an
    # inner projection and only REFERENCED (3x, non-cheaply) by the
    # outer one, so CollapseProject keeps it a per-row column instead of
    # inlining the whole array_max tree into the transform lambda —
    # which the interpreted HOF evaluator would then re-run PER ELEMENT,
    # making each row O(d^2) (measured 2x on the full flattened gate)
    v = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col), v.alias("__v")).withColumn(
        "__mx", F.array_max(F.transform("__v", lambda x: F.abs(x)))
    )
    mx = F.col("__mx")
    qscale = mx / F.lit(127.0)
    zero = F.transform("__v", lambda x: F.lit(0).cast("tinyint"))
    q = F.when(mx == F.lit(0.0), zero).otherwise(
        F.transform("__v", lambda x: F.floor(x / qscale + F.lit(0.5)).cast("tinyint"))
    )
    return base.select(
        F.col(id_col),
        q.alias("qvec"),
        F.when(mx == F.lit(0.0), F.lit(0.0)).otherwise(qscale).alias("qscale"),
    )


def quantize_embeddings_long(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, i, q int, qscale): the FLATTENED row form of
    ``quantize_embeddings`` — one row per vector element, the shape the
    bit-for-bit cross-engine gate (q:quantize) compares.

    Same IEEE rule, different evaluation order: the DOUBLE vector is
    exploded FIRST and each element quantized as a scalar expression —
    floor/divide run inside WholeStageCodegen at one eval per output
    row, where the array form pays an interpreted higher-order-function
    eval per element and a per-row array allocation before the explode
    (measured 2x end-to-end on the sf1.0 gate).  Every arithmetic step
    (float→double cast, abs/max, /127, floor(x/scale + 0.5)) is the
    identical correctly-rounded IEEE expression, so the emitted rows
    equal ``posexplode(quantize_embeddings(...).qvec)`` bit-for-bit
    (pinned by test)."""
    v = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col), v.alias("__v")).withColumn(
        "__mx", F.array_max(F.transform("__v", lambda x: F.abs(x)))
    )
    mx = F.col("__mx")
    qscale = mx / F.lit(127.0)
    ex = base.select(id_col, "__mx", F.posexplode("__v").alias("i", "__x"))
    q = F.when(mx == F.lit(0.0), F.lit(0)).otherwise(
        # floor→tinyint→int equals floor→int for values in [-127, 127],
        # which |x| <= max|x| guarantees; keep the direct int cast
        F.floor(F.col("__x") / qscale + F.lit(0.5)).cast("int")
    )
    return ex.select(
        F.col(id_col),
        F.col("i").cast("int").alias("i"),
        q.alias("q"),
        F.when(mx == F.lit(0.0), F.lit(0.0)).otherwise(qscale).alias("qscale"),
    )


def dequantize_embeddings(
    qdf: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(id, embedding array<double>): reconstruct ``q_i·qscale`` from
    ``quantize_embeddings`` output — each element within qscale/2 of
    the original.  Pure column expressions; use where a consumer needs
    float vectors back (the probe kernels can equally score int8
    directly against a quantized query)."""
    return qdf.select(
        F.col(id_col),
        F.transform(
            F.col("qvec"), lambda q: q.cast("double") * F.col("qscale")
        ).alias("embedding"),
    )


def cosine_topk_quantized(
    qcorpus: DataFrame, queries_np: dict[int, np.ndarray], k: int = 5
) -> DataFrame:
    """Top-k cosine search directly over the AT-REST int8 store
    (``quantize_embeddings`` output) — the probe path that realizes the
    4× compression: the scan reads qvec only (cosine is
    scale-invariant, so ``qscale`` is never read — column pruning drops
    it) and the kernel normalizes the raw int8 rows; nothing is
    dequantized to a float column first, so 4× fewer bytes cross disk,
    scan, AND the Arrow boundary.  Results approximate the float-store
    ``cosine_topk_arrow`` within quantization error (~qscale/2 per
    element); test_quantize pins rank-1 agreement and top-k recall on
    the test corpus."""
    return cosine_topk_arrow(
        qcorpus.select("vec_id", "qvec"), queries_np, k, vec_col="qvec"
    )


def ivf_topk_quantized(
    qcorpus: DataFrame,
    queries_np: dict[int, np.ndarray],
    centroids: np.ndarray,
    k: int = 5,
    probes: int | None = None,
    centroid_col: str = "centroid_id",
) -> DataFrame:
    """IVF approximate top-k over the AT-REST int8 store: the full
    compressed-ANN layout — ``ivf_assign`` on the float vectors, then
    ``quantize_embeddings``, landed partitioned by centroid — probed
    with 4× less scan/Arrow traffic (qscale pruned, cosine is
    scale-invariant in the kernel).  The centroid assignment column is
    REQUIRED: int8-space L2 against float centroids would misassign
    (loud guard in ``ivf_topk``); on a centroid-partitioned table the
    probe filter stays a PartitionFilter, so non-probed partitions are
    never opened."""
    return ivf_topk(
        qcorpus,
        queries_np,
        centroids,
        k=k,
        probes=probes,
        centroid_col=centroid_col,
        vec_col="qvec",
    )
