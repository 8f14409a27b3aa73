"""Measure IVF recall@k vs the exact scan across probe counts.

Writes BENCH/IVF_RECALL.md: for probes ∈ {1, 2, 4, 8, 16} (n_centroids
= 16), recall@k of ``ivf_topk`` against ``cosine_topk_arrow`` (the
brute-force baseline) on the synthetic embeddings table — the number
that tells a user what each probe level actually buys.  At probes =
n_centroids every inverted list is searched, so recall is exactly 1 by
construction (asserted here and in tests/test_round4_hardening.py).

Usage: PYTHONPATH=. python scripts/ivf_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    from simplepolygon_spark.operators.similarity import (
        cosine_topk_arrow,
        ivf_topk,
        kmeans_fit_distributed,
    )
    from simplepolygon_spark.session import get_spark

    spark = get_spark("ivf-recall", parallelism=8)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    n_centroids, k, n_queries = 16, 10, 32

    # queries: every 7th corpus vector (deterministic, in-distribution)
    qrows = (
        emb.where((emb.vec_id % 7 == 0)).orderBy("vec_id").limit(n_queries).collect()
    )
    queries = {int(r.vec_id): np.asarray(r.embedding, np.float64) for r in qrows}

    C = kmeans_fit_distributed(emb, n_centroids, iters=8)

    exact = cosine_topk_arrow(emb, queries, k=k)
    truth: dict[int, set] = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    lines = [
        "# IVF recall vs probes",
        "",
        f"Corpus: `{sf_dir}/embeddings.parquet` ({n} vectors), "
        f"{n_centroids} centroids (`kmeans_fit_distributed`), "
        f"{len(queries)} in-distribution queries, k={k}.",
        "",
        "recall@k = |ivf_topk ∩ cosine_topk_arrow| / k, averaged over "
        "queries.  Both paths rank by (rounded cosine desc, vec_id asc), "
        "so the comparison is tie-stable.",
        "",
        "| probes | recall@10 | wall (s) |",
        "|---|---|---|",
    ]
    for probes in (1, 2, 4, 8, n_centroids):
        t0 = time.monotonic()
        got: dict[int, set] = {}
        for r in ivf_topk(emb, queries, C, k=k, probes=probes).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        dt = time.monotonic() - t0
        rec = float(
            np.mean([len(got.get(q, set()) & truth[q]) / k for q in truth])
        )
        lines.append(f"| {probes} | {rec:.3f} | {dt:.2f} |")
        print(f"probes={probes} recall@{k}={rec:.3f} ({dt:.2f}s)", flush=True)
        if probes == n_centroids and rec != 1.0:
            raise SystemExit("recall at probes=n_centroids must be exactly 1")
    lines += [
        "",
        "At probes = n_centroids every inverted list is searched, so the "
        "result equals the exact scan (recall exactly 1) — the table is "
        "anchored, not extrapolated.",
        "",
        "Note: the synthetic embeddings are near-uniform random (max "
        "organic pairwise cosine ~0.5), the WORST case for IVF — "
        "centroids carve an unclustered space, so low probe counts buy "
        "less recall here than on real, clustered embedding corpora.  "
        "The curve is the honest lower bound, and the probes knob is the "
        "recall/cost dial it is designed to be.",
        "",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/IVF_RECALL.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH/IVF_RECALL.md")
    spark.stop()


if __name__ == "__main__":
    main()
