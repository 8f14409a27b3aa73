"""Deduplication operators for the documents table.

Five dedup modalities of a large-scale training-data pipeline:

  exact_dup_groups     — hash-groupBy on md5(text); pure DataFrame agg
  ngram_jaccard_pairs  — exact character-shingle Jaccard on candidate
                         pairs; Spark higher-order array functions
                         (JVM-side), candidates blocked by a cheap key
  minhash_band_buckets — MinHash+LSH: shingle→minhash→band→bucket;
    minhash_dup_pairs    bucket equi-join → verified Jaccard pairs
  simhash_64           — 64-bit SimHash + banded Hamming candidates
  embedding_dup_pairs  — cosine near-dup over array<float> embeddings
                         via JVM zip_with/aggregate dot products

MinHash/SimHash signatures are computed in Arrow-batched numpy
(mapInArrow); everything relational around them (banding, bucket joins,
pair verification) is DataFrame ops so Catalyst plans the shuffles.

At 100 TB: bucket joins shuffle only (doc_id, band_hash) pairs — tiny
next to the corpus; signature computation is a narrow map; verified
Jaccard joins texts back only for candidate pairs (a ~1e-6 selectivity
semi-join), never all-pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(text_hash, n_docs, min_doc_id) per exact-duplicate group."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


def shingle_col(text_col: str = "text", k: int = 5):
    """Distinct k-char shingles of lowercased text, as an array column
    (higher-order functions — no UDF)."""
    lower = F.lower(F.col(text_col))
    n = F.greatest(F.length(lower) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: lower.substr(i, F.lit(k)))
    )


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = 5, threshold: float = 0.5, block_col: str = "source"
) -> DataFrame:
    """Exact shingle-Jaccard pairs ≥ threshold, blocked by ``block_col``
    to bound the self-join (classic blocking key)."""
    d = docs.select("doc_id", block_col, shingle_col("text", k).alias("sh"))
    a, b = d.alias("a"), d.alias("b")
    pairs = a.join(b, on=block_col).where(F.col("a.doc_id") < F.col("b.doc_id"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        pairs.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Vectorized polynomial hashes of all k-shingles of one text."""
    b = np.frombuffer(text.lower().encode("utf-8", "replace"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = np.power(np.uint64(257), np.arange(k, dtype=np.uint64), dtype=np.uint64)
    return np.unique((win * powers).sum(axis=1, dtype=np.uint64))


def minhash_doc_sigs(
    docs: DataFrame, num_hashes: int = 64, k: int = 5, seed: int = 7
) -> DataFrame:
    """(doc_id, sig array<long>, sh array<long>) — one Arrow pass
    computes both the MinHash signature and the (61-bit) hashed shingle
    set; everything downstream (banding, bucket join, estimate filter,
    exact verify) is JVM-side."""
    rng = np.random.default_rng(seed)
    A = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64)
    B = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)
    schema = "doc_id long, sig array<long>, sh array<long>"

    def run(batches):
        for batch in batches:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column("text").to_pylist()
            o_id, o_sig, o_sh = [], [], []
            for did, text in zip(ids, texts):
                sh = _shingle_hashes(text, k)
                sig = (
                    (A[:, None] * sh[None, :] + B[:, None]) % np.uint64(_MERSENNE)
                ).min(axis=1)
                o_id.append(int(did))
                o_sig.append(sig.astype(np.int64).tolist())
                o_sh.append(sh.astype(np.int64).tolist())
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(o_id, pa.int64()),
                    pa.array(o_sig, pa.list_(pa.int64())),
                    pa.array(o_sh, pa.list_(pa.int64())),
                ],
                names=["doc_id", "sig", "sh"],
            )

    return docs.select("doc_id", "text").mapInArrow(run, schema)


def _band_buckets_from_sigs(sigs: DataFrame, bands: int, rows_per_band: int) -> DataFrame:
    """(doc_id, band, band_hash) derived from sig with JVM expressions."""
    band_arr = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice("sig", b * rows_per_band + 1, rows_per_band),
                    lambda x: x.cast("string"),
                ),
            )
        ),
    )
    return sigs.select("doc_id", F.posexplode(band_arr).alias("band", "band_hash"))


def minhash_band_buckets(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    seed: int = 7,
) -> DataFrame:
    """(doc_id, band, band_hash) — LSH bucket keys from MinHash sigs."""
    return _band_buckets_from_sigs(
        minhash_doc_sigs(docs, num_hashes, k, seed), bands, num_hashes // bands
    )


def minhash_dup_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.5,
    est_margin: float = 0.2,
) -> DataFrame:
    """LSH candidates (bucket equi-join) → signature-estimate pre-filter
    (matching-minhash fraction ≥ threshold − est_margin) → exact Jaccard
    over the hashed shingle sets.

    The estimate filter kills the bulk of false candidates with a 64-long
    comparison before the expensive set intersection; the emitted
    ``jaccard`` is always the exact set Jaccard (61-bit shingle hashes)."""
    # sigs feed three plan branches (buckets + both join sides); persist
    # so the Arrow kernel runs once.  At 100 TB scale this intermediate
    # is written to a table instead (one narrow pass over the corpus).
    sigs = minhash_doc_sigs(docs, num_hashes, k).persist()
    bk = _band_buckets_from_sigs(sigs, bands, num_hashes // bands)
    a, b = bk.alias("a"), bk.alias("b")
    cand = (
        a.join(b, on=["band", "band_hash"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    side = sigs.select("doc_id", "sig", "sh")
    j = (
        cand.join(
            side.withColumnsRenamed({"doc_id": "doc_a", "sig": "sig_a", "sh": "sh_a"}),
            "doc_a",
        )
        .join(
            side.withColumnsRenamed({"doc_id": "doc_b", "sig": "sig_b", "sh": "sh_b"}),
            "doc_b",
        )
    )
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ) / F.lit(float(num_hashes))
    j = j.where(est >= threshold - est_margin)
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.greatest(
        F.size(F.array_union("sh_a", "sh_b")), F.lit(1)
    )
    return j.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_64(docs: DataFrame, seed: int = 11) -> DataFrame:
    """(doc_id, simhash, band0..band3): 64-bit SimHash over whitespace
    tokens + four 16-bit bands for Hamming blocking."""
    schema = "doc_id long, simhash long, band0 int, band1 int, band2 int, band3 int"

    def run(batches):
        import hashlib

        cache: dict[str, int] = {}

        def th(tok: str) -> int:
            v = cache.get(tok)
            if v is None:
                v = int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8, key=b"simhash11").digest(),
                    "little",
                )
                cache[tok] = v
            return v

        for batch in batches:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column("text").to_pylist()
            out = {f: [] for f in ("doc_id", "simhash", "band0", "band1", "band2", "band3")}
            for did, text in zip(ids, texts):
                toks = text.lower().split()
                if toks:
                    hs = np.array([th(t) for t in toks], dtype=np.uint64)
                    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
                    votes = bits.sum(axis=0) * 2 > len(toks)
                    sh = int(np.packbits(votes[::-1]).view(">u8")[0])
                else:
                    sh = 0
                out["doc_id"].append(int(did))
                out["simhash"].append(sh - (1 << 64) if sh >= (1 << 63) else sh)
                for bnd in range(4):
                    out[f"band{bnd}"].append((sh >> (16 * bnd)) & 0xFFFF)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out["doc_id"], pa.int64()),
                    pa.array(out["simhash"], pa.int64()),
                    *[pa.array(out[f"band{bnd}"], pa.int32()) for bnd in range(4)],
                ],
                names=["doc_id", "simhash", "band0", "band1", "band2", "band3"],
            )

    return docs.select("doc_id", "text").mapInArrow(run, schema)


def simhash_dup_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Candidates share ≥1 of 4 bands (pigeonhole for hamming ≤ 48, and a
    strong filter in practice); verified by exact popcount distance."""
    sh = simhash_64(docs)
    pairs = None
    for bnd in range(4):
        a = sh.select(
            F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), F.col(f"band{bnd}").alias("bk")
        )
        b = sh.select(
            F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), F.col(f"band{bnd}").alias("bk")
        )
        p = a.join(b, "bk").where(F.col("doc_a") < F.col("doc_b")).drop("bk")
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.distinct()
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, block_col: str | None = "label"
) -> DataFrame:
    """Pairs with cosine ≥ threshold; dot products via JVM higher-order
    functions (zip_with + aggregate) — no Python in the join."""
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    d = emb.select(
        "vec_id",
        *( [block_col] if block_col else [] ),
        F.col("embedding").alias("v"),
        norm.alias("nrm"),
    )
    a, b = d.alias("a"), d.alias("b")
    on = [block_col] if block_col else []
    j = (
        a.join(b, on=on) if on else a.crossJoin(b)
    ).where(F.col("a.vec_id") < F.col("b.vec_id"))
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (F.col("a.nrm") * F.col("b.nrm"))
    return j.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(cos, 6).alias("cosine"),
    ).where(F.col("cosine") >= threshold)
