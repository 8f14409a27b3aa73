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

from pyspark.sql import DataFrame, Observation
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
    """Exact shingle-Jaccard pairs ≥ threshold, blocked by ``block_col``.

    ORACLE SHAPE — small-scale only.  The self-join is quadratic in the
    block size and nothing bounds the key's coarseness: a skewed or
    coarse block (one giant ``source``) makes this an all-pairs join.
    It exists as the exhaustive-recall reference that the banded form
    is verified against; at scale use ``ngram_jaccard_pairs_lsh``
    (MinHash-banded candidates within the block, the same exact Jaccard
    re-verified on candidates only) — same output columns, recall
    governed by the LSH S-curve instead of exhaustive."""
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


def ngram_jaccard_pairs_lsh(
    docs: DataFrame,
    k: int = 5,
    threshold: float = 0.8,
    block_col: str = "source",
    num_hashes: int = 64,
    bands: int | None = None,
) -> DataFrame:
    """Scale path of ``ngram_jaccard_pairs``: (doc_a, doc_b, jaccard ≥
    threshold) for same-``block_col`` docs, candidates via MinHash
    banding (threshold-derived geometry, ``bands_for_threshold``) with
    the block key joined into the bucket key, exact distinct-k-gram
    Jaccard recomputed on candidates only.  Same output columns and the
    same exact-Jaccard pair definition as the exhaustive form; recall is
    governed by the LSH S-curve (≥63% AT the threshold, →1 above the
    knee) FURTHER reduced by ``minhash_dup_pairs``' signature-estimate
    pre-filter, which drops candidates whose matching-minhash fraction
    strays below threshold − est_margin even when their exact Jaccard
    clears the threshold (a tail event of the 64-hash estimator's
    ±margin band).  The standard trade that removes the quadratic
    within-block join; size recall expectations from both terms."""
    return minhash_dup_pairs(
        docs,
        num_hashes=num_hashes,
        bands=bands,
        k=k,
        threshold=threshold,
        block_col=block_col,
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Vectorized polynomial hashes of all k-shingles of one text
    (kept as the single-doc reference kernel for the batch form below,
    and for tests)."""
    b = np.frombuffer(text.lower().encode("utf-8", "replace"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = np.power(np.uint64(257), np.arange(k, dtype=np.uint64), dtype=np.uint64)
    return np.unique((win * powers).sum(axis=1, dtype=np.uint64))


def _batch_minhash(
    texts: list, A: np.ndarray, B: np.ndarray, k: int
) -> np.ndarray:
    """(num_hashes × n_docs) MinHash matrix for a whole batch with NO
    per-document hashing loop (round-2 advice): all docs' utf-8 bytes
    are concatenated into ONE buffer, shingle-hashed in ONE
    sliding-window pass, and reduced to per-doc minima with
    ``np.minimum.reduceat`` — windows that straddle document boundaries
    are skipped by index arithmetic, not masking.  min over all windows
    equals min over the unique shingle set, so values are identical to
    ``_shingle_hashes``-based signatures.  Memory stays a small constant
    multiple of the batch's bytes: both the window-hash pass (Horner
    over shifted 1-D views, see below) and the hash-function dimension
    (64 iterations of whole-buffer vector ops) are looped — neither a
    k-wide window matrix nor a num_hashes × total_windows matrix is
    ever materialized."""
    bufs = []
    for t in texts:
        b = np.frombuffer(t.lower().encode("utf-8", "replace"), dtype=np.uint8)
        if len(b) < k:
            b = np.pad(b, (0, k - len(b)), constant_values=32)
        bufs.append(b)
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    cat = np.concatenate(bufs)
    # Horner over k shifted views of the 1-D buffer: H[w] = sum_j
    # byte[w+j]*257^j — identical values (incl. mod-2^64 wraparound) to
    # a (window_matrix * powers).sum, WITHOUT materializing the k-wide
    # uint64 window matrix (8k bytes per input byte — a multi-GB
    # transient on a 10k-row batch of 10 KB docs); this form peaks at
    # ~24 transient bytes per input byte regardless of k.
    n_total = len(cat) - k + 1
    H = np.zeros(n_total, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k - 1, -1, -1):
            H *= np.uint64(257)
            H += cat[j : j + n_total].astype(np.uint64)
    n_win = lens - k + 1
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    starts = np.concatenate([[0], np.cumsum(n_win)[:-1]])
    # ragged arange: valid-window j of doc i maps to H[offs[i] + j]
    idx = np.arange(int(n_win.sum())) + np.repeat(offs - starts, n_win)
    Hv = H[idx]
    M = np.uint64(_MERSENNE)
    sig = np.empty((len(A), len(texts)), dtype=np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound matches the 2-D form
        for i in range(len(A)):
            sig[i] = np.minimum.reduceat((A[i] * Hv + B[i]) % M, starts)
    return sig


def minhash_doc_sigs(
    docs: DataFrame,
    num_hashes: int = 64,
    k: int = 5,
    seed: int = 7,
    carry_col: str | None = None,
) -> DataFrame:
    """(doc_id, sig array<long>[, carry_col]) — MinHash signature per
    doc in one Arrow pass, whole-batch vectorized (``_batch_minhash``).
    The signature (num_hashes longs) is the ONLY payload carried into
    the LSH join graph; the full hashed-shingle set is deliberately not
    emitted — at 100 TB it is O(text length) per row and shipping it
    through the candidate joins re-shuffles a constant factor of the
    corpus (round-1 bench: 60% of suite wall time).

    ``carry_col`` rides the kernel untouched (same Arrow column in,
    same column out, input dtype preserved) — attaching a blocking key
    HERE costs nothing, where attaching it post hoc costs a second
    corpus scan plus a doc_id join (round-4 advice on
    ngram_jaccard_lsh's constant factor)."""
    rng = np.random.default_rng(seed)
    A = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64)
    B = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)
    schema = "doc_id long, sig array<long>"
    in_cols = ["doc_id", "text"]
    if carry_col is not None:
        if carry_col in ("doc_id", "sig", "text"):
            # doc_id/sig collide with output columns; text would put a
            # duplicate field in the Arrow batch schema and crash the
            # kernel's by-name column lookup deep in an executor task
            raise ValueError(
                f"minhash_doc_sigs: carry_col ({carry_col}) collides with "
                "a kernel column"
            )
        carry_type = docs.schema[carry_col].dataType.simpleString()
        schema += f", {carry_col} {carry_type}"
        in_cols.append(carry_col)

    def run(batches):
        for batch in batches:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column("text").to_pylist()
            if len(ids) == 0:
                continue
            sig = _batch_minhash(texts, A, B, k)  # num_hashes × n_docs
            sig_rows = sig.T.astype(np.int64)
            arrays = [
                pa.array(ids.astype(np.int64), pa.int64()),
                pa.array(list(sig_rows), pa.list_(pa.int64())),
            ]
            names = ["doc_id", "sig"]
            if carry_col is not None:
                arrays.append(batch.column(carry_col))
                names.append(carry_col)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    # NULL text has no signature: exclude it SQL-side (the vectorized
    # kernel would crash on None) — NULL-text rows simply never join
    # the dedup candidate graph, consistent with the anti-join NULL
    # contract in sampling.decontaminate
    return (
        docs.select(*in_cols)
        .where(F.col("text").isNotNull())
        .mapInArrow(run, schema)
    )


def _band_hash_array(bands: int, rows_per_band: int):
    """Column expression: array of ``bands`` xxhash64 band keys over a
    ``sig`` array<long> column — the ONE banding definition, shared by
    the batch melt and the streaming store (which persists the computed
    array so later micro-batches never re-hash the store)."""
    return F.transform(
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


def _band_buckets_from_sigs(
    sigs: DataFrame, bands: int, rows_per_band: int, carry: tuple = ()
) -> DataFrame:
    """(doc_id, *carry, band, band_hash) derived from sig with JVM
    expressions; ``carry`` columns (e.g. a blocking key) ride the
    explode so they need no post-hoc join against the melted frame."""
    return sigs.select(
        "doc_id",
        *carry,
        F.posexplode(_band_hash_array(bands, rows_per_band)).alias(
            "band", "band_hash"
        ),
    )


def bands_for_threshold(num_hashes: int, threshold: float) -> int:
    """FEWEST bands whose S-curve knee ``(1/b)^(1/r)`` (r = num_hashes/b)
    sits at or below ``threshold`` — the recall-safe choice: recall at
    similarity j is ``1 - (1 - j^r)^b``, ~0.63 AT the knee and climbing
    steeply above it, so knee ≤ threshold guarantees ≥63% candidate
    recall at the threshold itself (e.g. 64 hashes at threshold 0.8 →
    8x8 banding, knee 0.771: recall 0.989 at j=0.9, 0.9998 at j=0.95).
    Fewest bands = fewest bucket collisions below the threshold, i.e.
    the cheapest banding that is still recall-correct; a fixed banding
    with a mismatched threshold silently drops pairs between the
    threshold and the knee (8x8 at threshold 0.5 has ~3% recall at
    j=0.5).  Falls back to num_hashes bands (knee minimal) for
    thresholds below every knee."""
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        knee = (1.0 / b) ** (b / num_hashes)
        if knee <= threshold:
            return b
    return num_hashes


def minhash_band_buckets(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 8,
    k: int = 5,
    seed: int = 7,
) -> DataFrame:
    """(doc_id, band, band_hash) — LSH bucket keys from MinHash sigs."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}): a "
            "remainder would silently drop the trailing hashes from the "
            "banding and shift the S-curve off every documented recall bound"
        )
    return _band_buckets_from_sigs(
        minhash_doc_sigs(docs, num_hashes, k, seed), bands, num_hashes // bands
    )


def minhash_dup_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int | None = None,
    k: int = 5,
    threshold: float = 0.8,
    est_margin: float = 0.1,
    rebalance: int | None = None,
    block_col: str | None = None,
) -> DataFrame:
    """LSH candidates (bucket equi-join) → signature-estimate pre-filter
    (matching-minhash fraction ≥ threshold − est_margin) → exact
    character-shingle Jaccard recomputed ONLY for surviving candidates.

    Scale shape: the corpus is scanned twice — once for signatures (a
    narrow Arrow map), once semi-joined down to candidate doc_ids for
    the exact verify (a ~1e-6 selectivity set, broadcast back).  The
    joins themselves move only (doc_id, band_hash) pairs and 64-long
    signatures, never text or shingle sets.  The emitted ``jaccard`` is
    the exact distinct-5-gram Jaccard of the lowercased text, identical
    to the brute-force SQL oracle's definition.

    ``bands=None`` derives the banding from the threshold via
    ``bands_for_threshold`` so recall is centered on the asked-for
    similarity — a fixed banding with a mismatched threshold silently
    drops true pairs between the threshold and the S-curve knee (e.g.
    8x8 banding at threshold 0.5 has ~3% recall at j=0.5).  The default
    threshold is 0.8 (→ 8x8 for 64 hashes, knee 0.77): natural-language
    corpora have a high background similarity floor (shared vocabulary
    puts random doc pairs at char-5-gram j~0.3), and a LOWER threshold
    necessarily bands closer to that floor — threshold 0.5 derives 16x4
    banding, which on 5000 word-salad docs emitted 183k candidates and
    dominated the whole bench.  Callers who truly need j≥0.5 recall pay
    that candidate cost knowingly.

    ``block_col`` (optional) constrains pairs to docs sharing that
    column's value — the scale-safe form of classic blocking: the block
    key simply joins the LSH bucket key, so within-block candidate
    generation stays banded (never quadratic in the block size).  Docs
    with a NULL block value never pair (NULL equi-join semantics).

    NOTE: calling this function RUNS the signature + candidate jobs
    immediately (eager localCheckpoint — the price of releasing the
    intermediate sig/candidate caches deterministically instead of
    leaking them for the session); the returned frame is then cheap."""
    # rebalance: a small single-file table arrives as one split and
    # serializes the Arrow signature kernel — spread it.  An explicit
    # count wins; the default (None) is SCALE-ADAPTIVE: repartition to
    # defaultParallelism only when the input has fewer splits than
    # cores (guide §2 — derive partitioning from the input, don't pin a
    # constant).  At warehouse scale the table already has many splits,
    # the condition never fires, and the text corpus is not shuffled;
    # pass rebalance=0/False to force the old no-repartition behavior.
    if rebalance:
        docs = docs.repartition(rebalance)
    elif rebalance is None:
        par = docs.sparkSession.sparkContext.defaultParallelism
        if docs.rdd.getNumPartitions() < par:
            docs = docs.repartition(par)
    if bands is None:
        bands = bands_for_threshold(num_hashes, threshold)
    if num_hashes % bands != 0:
        raise ValueError(
            f"bands ({bands}) must divide num_hashes ({num_hashes}): a "
            "remainder would silently drop the trailing hashes from the banding"
        )
    carry: tuple = ()
    join_keys = ["band", "band_hash"]
    if block_col is not None:
        # the block key rides the signature Arrow kernel as a
        # passthrough column (zero extra work in the pass) and then the
        # bucket key, so only same-block docs become candidates — the
        # old shape re-scanned docs for an (id, block) projection and
        # joined it back, a whole extra scan + join per call (round-4
        # advice).  Renamed to _blk so a block column named e.g. "band"
        # can't collide with the melt's own columns.
        sigs = minhash_doc_sigs(docs, num_hashes, k, carry_col=block_col)
        sigs = sigs.withColumnRenamed(block_col, "_blk")
        carry = ("_blk",)
        join_keys = ["band", "band_hash", "_blk"]
    else:
        sigs = minhash_doc_sigs(docs, num_hashes, k)
    sigs = sigs.persist()
    bk = _band_buckets_from_sigs(sigs, bands, num_hashes // bands, carry=carry)
    a, b = bk.alias("a"), bk.alias("b")
    raw_cand = (
        a.join(b, on=join_keys)
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        # raw_cand feeds the sig joins twice (a/b side); persist so the
        # bucket join runs once
        .persist()
    )
    side = sigs.select("doc_id", "sig")
    est = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    ) / F.lit(float(num_hashes))
    # materialize the surviving candidate pairs eagerly (localCheckpoint
    # truncates lineage) so the intermediate sigs/raw_cand caches can be
    # RELEASED here instead of leaking until the session ends — repeated
    # calls no longer accumulate cached blocks.  The checkpointed set is
    # ~1e-6 selectivity of the pair space; at warehouse scale a real
    # checkpoint table replaces localCheckpoint (executor-loss safety).
    cand = (
        raw_cand.join(side.withColumnsRenamed({"doc_id": "doc_a", "sig": "sig_a"}), "doc_a")
        .join(side.withColumnsRenamed({"doc_id": "doc_b", "sig": "sig_b"}), "doc_b")
        .where(est >= threshold - est_margin)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    sigs.unpersist()
    raw_cand.unpersist()
    # exact verify: pull text only for docs that appear in a candidate
    # pair (semi-join), shingle JVM-side.  No explicit broadcast hint:
    # AQE sizes the joins at runtime — it broadcasts the candidate side
    # while it is small (the normal ~1e-6-selectivity case) and degrades
    # to a shuffle join on a high-duplication corpus where the
    # O(text length) shingle sets would otherwise blow the driver
    # through a forced broadcast.  Runtime-decided is also one job
    # cheaper than a count()-gated hint.
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sub = docs.join(cand_ids, "doc_id", "left_semi").select(
        "doc_id", shingle_col("text", k).alias("sh")
    )
    j = cand.join(
        sub.withColumnsRenamed({"doc_id": "doc_a", "sh": "sh_a"}), "doc_a"
    ).join(
        sub.withColumnsRenamed({"doc_id": "doc_b", "sh": "sh_b"}), "doc_b"
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.greatest(
        F.size(F.array_union("sh_a", "sh_b")), F.lit(1)
    )
    return j.select(
        "doc_a", "doc_b", F.round(jac, 6).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_SM_C0 = 0x9E3779B97F4A7C15
_SM_C1 = 0xBF58476D1CE4E5B9
_SM_C2 = 0x94D049BB133111EB
_INV257 = pow(257, -1, 1 << 64)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants)
    — turns the poorly-mixed Horner value into 64 uniform bits."""
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
        z = z + np.uint64(_SM_C0)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(_SM_C1)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(_SM_C2)
        return z ^ (z >> np.uint64(31))


def _token_hashes(tokens: list) -> np.ndarray:
    """uint64 hash per token: Horner over UCS4 codepoints (base 257,
    mod 2^64) + splitmix64.  Fully vectorized: the numpy str_ array's
    fixed-width codepoint view is hashed column-wise; trailing NUL
    padding contributes a known 257^pad factor that is undone with the
    modular inverse of 257 (odd ⇒ invertible mod 2^64).  The identical
    function is expressed in ANSI-ish SQL by ``simhash_token_sql`` for
    the DuckDB oracle."""
    arr = np.asarray(tokens, dtype=np.str_)
    U = arr.view(np.uint32).reshape(len(arr), -1).astype(np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
        h = np.zeros(len(arr), np.uint64)
        for col in range(U.shape[1]):
            h = h * np.uint64(257) + U[:, col]
        pad = (U == 0).sum(axis=1)
        pows = np.empty(U.shape[1] + 1, np.uint64)
        pows[0] = 1
        for i in range(1, len(pows)):
            pows[i] = pows[i - 1] * np.uint64(_INV257)
        return _splitmix64(h * pows[pad])


def simhash_token_sql(tok: str) -> str:
    """DuckDB SQL computing exactly ``_token_hashes`` for one token
    expression: codepoint Horner (mod 2^64 via HUGEINT) + splitmix64,
    with each 64×64-bit multiply split into 32-bit halves so the
    128-bit intermediate never overflows HUGEINT."""
    m64 = 1 << 64
    horner = (
        f"list_reduce(list_transform(string_split({tok}, ''), "
        f"c -> CAST(ord(c) AS HUGEINT)), (a, b) -> (a * 257 + b) % {m64})"
    )

    def mulmod(z: str, c: int) -> str:
        lo, hi = c & 0xFFFFFFFF, c >> 32
        return (
            f"((({z}) * {lo}) % {m64} + (((({z}) % {1 << 32}) * {hi}) % {1 << 32})"
            f" * {1 << 32}) % {m64}"
        )

    z0 = f"(({horner}) + {_SM_C0}) % {m64}"
    z1 = mulmod(f"xor({z0}, ({z0}) >> 30)", _SM_C1)
    z2 = mulmod(f"xor({z1}, ({z1}) >> 27)", _SM_C2)
    return f"xor({z2}, ({z2}) >> 31)"


def simhash_of_texts(texts: list) -> np.ndarray:
    """uint64 SimHash per text — the shared vectorized kernel behind
    both the batch operator and the streaming near-dup suppressor."""
    shifts = np.arange(64, dtype=np.uint64)
    n = len(texts)
    toks_per_doc = [t.lower().split() for t in texts]
    counts = np.array([len(t) for t in toks_per_doc], np.int64)
    sig = np.zeros(n, np.uint64)
    nz = np.nonzero(counts > 0)[0]
    # chunk the T×64 vote matrix to a bounded footprint
    for s in range(0, len(nz), 2048):
        dz = nz[s : s + 2048]
        all_toks = [t for i in dz for t in toks_per_doc[i]]
        H = _token_hashes(all_toks)
        bits = ((H[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
        offsets = np.concatenate([[0], np.cumsum(counts[dz])[:-1]])
        sums = np.add.reduceat(bits, offsets, axis=0)
        votes = (sums * 2 > counts[dz][:, None]).astype(np.uint64)
        sig[dz] = (votes << shifts[None, :]).sum(axis=1, dtype=np.uint64)
    return sig


# The one place the SimHash banding geometry is defined: 4 bands of 16
# bits pigeonhole guaranteed recall for hamming <= 3 (= n_bands - 1).
# Batch operators AND the streaming path (streaming/feed.py) both build
# on these — change them together or bucket keys diverge between the
# stream and the landed-table batch job.
SIMHASH_N_BANDS = 4
SIMHASH_BAND_BITS = 16
SIMHASH_BAND_COLS = [f"band{b}" for b in range(SIMHASH_N_BANDS)]


def simhash_band_arrays(sig: np.ndarray) -> list[np.ndarray]:
    """int32 band keys (one array per band) from uint64 signatures."""
    mask = np.uint64((1 << SIMHASH_BAND_BITS) - 1)
    return [
        ((sig >> np.uint64(SIMHASH_BAND_BITS * b)) & mask).astype(np.int32)
        for b in range(SIMHASH_N_BANDS)
    ]


def melt_simhash_bands(df: DataFrame, cols: list[str]) -> DataFrame:
    """(cols..., band, bk): one row per (row, band) from band0..bandN."""
    return df.select(
        *cols, F.posexplode(F.array(*SIMHASH_BAND_COLS)).alias("band", "bk")
    )


def simhash_64(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash, band0..band3): 64-bit SimHash over whitespace
    tokens (occurrence-weighted majority vote per bit) + 16-bit bands
    for Hamming blocking.  The whole batch is hashed in one vectorized
    pass — no per-token Python (round-1 advice)."""
    schema = "doc_id long, simhash long, " + ", ".join(
        f"{c} int" for c in SIMHASH_BAND_COLS
    )

    def run(batches):
        for batch in batches:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            texts = batch.column("text").to_pylist()
            if len(ids) == 0:
                continue
            sig = simhash_of_texts(texts)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids.astype(np.int64), pa.int64()),
                    pa.array(sig.view(np.int64), pa.int64()),
                    *[pa.array(b, pa.int32()) for b in simhash_band_arrays(sig)],
                ],
                names=["doc_id", "simhash", *SIMHASH_BAND_COLS],
            )

    # NULL text has no signature: exclude it SQL-side (the vectorized
    # kernel would crash on None) — NULL-text rows simply never join
    # the dedup candidate graph, consistent with the anti-join NULL
    # contract in sampling.decontaminate
    return (
        docs.select("doc_id", "text")
        .where(F.col("text").isNotNull())
        .mapInArrow(run, schema)
    )


def simhash_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Candidates share ≥1 of 4 bands (pigeonhole: recall is exactly 1
    for hamming ≤ 3 — hence the default; at max_hamming > 3 the banding
    becomes a partial-recall filter and a caller wanting guaranteed
    recall needs max_hamming+1 shorter bands); verified by exact
    popcount distance.

    Plan shape: the bands are MELTED with one posexplode into
    (doc_id, simhash, band, key) rows and self-joined on (band, key) —
    ONE signature pass over the corpus and one equi-join, instead of
    the previous four union branches that each re-ran the Arrow kernel."""
    sh = melt_simhash_bands(simhash_64(docs), ["doc_id", "simhash"])
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "bk"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "bk"
    )
    pairs = (
        a.join(b, ["band", "bk"]).where(F.col("doc_a") < F.col("doc_b")).drop("band", "bk")
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.distinct()
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def banded_hamming_pairs(
    sigs: DataFrame,
    sig_col: str,
    id_col: str,
    max_hamming: int = 3,
    n_bands: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming) over ANY 64-bit signature
    column — the generic banded-Hamming join: pigeonhole over
    ``n_bands`` (default max_hamming+1, giving recall exactly 1: a pair
    differing in ≤ max_hamming bits cannot differ in every one of
    max_hamming+1 bands), candidates via one posexplode melt + one
    (band, key) equi-join, verified by exact popcount.  All JVM-side —
    band keys are shift/mask column expressions, no Arrow pass.

    ``simhash_dup_pairs`` is this join over text SimHash;
    ``phash_dup_pairs`` is this join over the image perceptual hash."""
    if n_bands is None:
        n_bands = max_hamming + 1
    if not (1 <= n_bands <= 64):
        raise ValueError(f"n_bands ({n_bands}) must be in [1, 64]")
    if n_bands <= max_hamming:
        # pigeonhole needs max_hamming+1 bands: with fewer, a pair can
        # put one differing bit in EVERY band and silently vanish from
        # the candidates — a recall<1 banding must be an explicit
        # different function, never this one's silent behavior
        raise ValueError(
            f"n_bands ({n_bands}) must exceed max_hamming ({max_hamming}) "
            "for the recall-1 pigeonhole guarantee"
        )
    w = 64 // n_bands
    keys = []
    for i in range(n_bands):
        lo = i * w
        bits = (64 - lo) if i == n_bands - 1 else w  # last band takes the
        # remainder — any partition pigeonholes.  bits=64 (n_bands=1,
        # i.e. exact-equality join) cannot be a mask literal (2^64-1
        # overflows a Spark long): the unshifted column IS the key.
        if bits >= 64:
            keys.append(F.col(sig_col).cast("long"))
            continue
        mask = (1 << bits) - 1
        keys.append(
            F.shiftrightunsigned(F.col(sig_col), lo)
            .bitwiseAND(F.lit(mask))
            .cast("long")
        )
    melted = sigs.select(
        id_col, sig_col, F.posexplode(F.array(*keys)).alias("band", "bk")
    )
    a = melted.select(
        F.col(id_col).alias("id_a"), F.col(sig_col).alias("sig_a"), "band", "bk"
    )
    b = melted.select(
        F.col(id_col).alias("id_b"), F.col(sig_col).alias("sig_b"), "band", "bk"
    )
    pairs = (
        a.join(b, ["band", "bk"])
        .where(F.col("id_a") < F.col("id_b"))
        .drop("band", "bk")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


def phash_dup_pairs(images: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance —
    the multimodal dedup modality: (image_a, image_b, hamming ≤
    max_hamming) over the images table's 64-bit ``phash`` column
    (sources/images.py).  Same banded join as q:simhash (recall 1 by
    pigeonhole, exact popcount verify), signatures-only shuffle — the
    byte column is never touched."""
    out = banded_hamming_pairs(
        images.select("image_id", "phash"), "phash", "image_id", max_hamming
    )
    return out.select(
        F.col("id_a").alias("image_a"),
        F.col("id_b").alias("image_b"),
        "hamming",
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def _pair_cosines(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise cosine between two (n × d) float64 matrices — THE ONE
    arithmetic every embedding-dedup path emits (brute force, LSH
    bucket verify, whitened): a single einsum kernel, so any two paths
    computing the same pair produce the bit-identical double and
    set-equality tests across paths can compare cosines exactly."""
    dots = np.einsum("ij,ij->i", A, B)
    na = np.sqrt(np.einsum("ij,ij->i", A, A))
    nb = np.sqrt(np.einsum("ij,ij->i", B, B))
    with np.errstate(invalid="ignore", divide="ignore"):
        return dots / (na * nb)


def _group_dup_pairs_pdf(pdf, threshold: float, id_name: str = "vec_id"):
    """All (vec_a < vec_b, cosine) pairs within ONE group of
    (vec_id, v float64-list) rows whose ROUNDED cosine clears
    ``threshold`` — the shared pandas kernel behind
    ``embedding_dup_pairs`` (group = block) and
    ``embedding_dup_pairs_lsh`` (group = LSH bucket).

    Two-phase for vectorization WITHOUT changing the emitted values:
    a normalized-matmul prescreen with 1e-6 slack (≥ the largest lift
    F.round can apply, 5e-7, plus accumulation-order noise ~1e-12)
    finds candidate index pairs, then the EXACT ``_pair_cosines``
    einsum on the raw vectors decides — emitted values and the final
    ``~(rounded < threshold)`` filter (true for NaN, matching Spark's
    NaN-is-largest comparison semantics) are pure functions of the
    einsum arithmetic, independent of the prescreen, the grouping, or
    BLAS blocking.  NULL vectors are dropped (a NULL reaches cosine
    NULL and fails the filter in the JVM formulation)."""
    import pandas as pd

    empty = pd.DataFrame({"vec_a": pdf[id_name][:0], "vec_b": pdf[id_name][:0],
                          "cosine": np.zeros(0)})
    pdf = pdf[pdf["v"].notna()]
    n = len(pdf)
    if n < 2:
        return empty
    pdf = pdf.sort_values(id_name, kind="mergesort")
    ids = pdf[id_name].to_numpy()
    X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
    norms = np.sqrt(np.einsum("ij,ij->i", X, X))
    with np.errstate(invalid="ignore", divide="ignore"):
        Xn = X / norms[:, None]
    out_a, out_b, out_c = [], [], []
    # bound the prescreen matrix to ~256 MB regardless of group size
    chunk = max(1, (1 << 25) // max(n, 1))
    for s in range(0, n, chunk):
        C = Xn[s : min(s + chunk, n)] @ Xn.T
        with np.errstate(invalid="ignore"):
            m = ~(C < threshold - 1e-6)
        ii, jj = np.nonzero(m)
        gi = ii + s
        keep = jj > gi
        gi, jj = gi[keep], jj[keep]
        if not len(gi):
            continue
        cos = np.round(_pair_cosines(X[gi], X[jj]), 6)
        with np.errstate(invalid="ignore"):
            final = ~(cos < threshold)
        # strict id inequality: duplicate-id rows never self-pair
        final &= ids[gi] != ids[jj]
        gi, jj, cos = gi[final], jj[final], cos[final]
        out_a.append(ids[gi])
        out_b.append(ids[jj])
        out_c.append(cos)
    if not out_a:
        return empty
    return pd.DataFrame(
        {
            "vec_a": np.concatenate(out_a),
            "vec_b": np.concatenate(out_b),
            "cosine": np.concatenate(out_c),
        }
    )


def embedding_dup_pairs(
    emb: DataFrame, threshold: float = 0.95, block_col: str | None = "label"
) -> DataFrame:
    """Pairs with cosine ≥ threshold; per-block vectorized numpy kernel
    (normalized-matmul prescreen + exact einsum verify,
    ``_group_dup_pairs_pdf``) — the old JVM zip_with/aggregate form
    evaluated an interpreted per-element fold for every one of the
    O(block²) pairs (28 s at sf1.0; the kernel does the same pair count
    as two BLAS calls in ~0.3 s).

    ALL-PAIRS within the caller-supplied block (one group without one)
    — quadratic in the block size, kept as the small-scale oracle shape
    against which ``embedding_dup_pairs_lsh`` (the bucketed scale path)
    is verified.  Use the LSH form on anything bigger than a dim
    table.  Rows with a NULL block value never pair (matching the
    former join-on-block semantics)."""
    id_type = emb.schema["vec_id"].dataType.simpleString()
    schema = f"vec_a {id_type}, vec_b {id_type}, cosine double"
    blk = F.col(block_col) if block_col else F.lit(0)
    d = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        blk.alias("_blk"),
    )
    if block_col:
        d = d.where(F.col("_blk").isNotNull())

    def kernel(pdf):
        return _group_dup_pairs_pdf(pdf, threshold)

    return d.groupBy("_blk").applyInPandas(kernel, schema)


def _srp_plane_matrix(d: int, num_planes: int, seed: int) -> np.ndarray:
    """The (d × planes) N(0,1) hyperplane matrix, regenerated from the
    seed wherever needed (executors, stream batches) — one definition
    so batch and stream signatures can never diverge."""
    return np.random.default_rng(seed).standard_normal((d, num_planes))


def _srp_sigs_of(X: np.ndarray, H: np.ndarray) -> np.ndarray:
    """uint64 SRP signatures of the rows of X against hyperplanes H:
    bit i = sign of the dot product with hyperplane i."""
    num_planes = H.shape[1]
    shifts = np.arange(num_planes, dtype=np.uint64)
    bits = ((X @ H) > 0.0).astype(np.uint64)
    return (bits << shifts[None, :]).sum(axis=1, dtype=np.uint64)


def srp_signatures(
    emb: DataFrame,
    num_planes: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "v",
    carry_vec: bool = False,
) -> DataFrame:
    """(id, sig): signed-random-projection LSH signature per vector —
    bit i of ``sig`` is the sign of the dot product with hyperplane i,
    hyperplanes drawn N(0,1) from a seeded generator (Charikar SimHash
    for cosine).  P[bit match] for a pair at angle θ is 1 − θ/π.

    ``num_planes`` is capped at 64: the signature is ONE 64-bit word,
    and a shift count >= 64 on uint64 aliases mod 64 (plane i and plane
    i+64 would silently collide into the same bit).

    One Arrow pass, one matmul per batch: the batch's vectors are
    viewed as an (n × d) matrix and multiplied against the (d × planes)
    hyperplane matrix.  Hyperplanes are regenerated per batch from the
    seed (cheap: d × planes doubles) so every executor, batch, and run
    agrees without shipping state.

    Mixed-dimension corpora are rejected PER TASK (on the second
    distinct dimension one task sees): signatures drawn from unrelated
    hyperplane sets share one 64-bit space and are incomparable —
    cross-dim bucket collisions would waste verify work and mask a
    data-quality problem.  The guard is best-effort, not airtight: a
    corpus whose dimensions are partition-aligned (each task sees a
    single dim — e.g. a union of two single-dim tables) passes it and
    still emits incomparable signatures.  When provenance doesn't
    already guarantee one dimension, run ``assert_uniform_dims(emb)``
    first (one cheap aggregate scan) or split the corpus by dimension
    before signing.

    ``carry_vec=True`` additionally passes ``vec_col`` through the
    kernel untouched (same Arrow column in and out) — the bucket-verify
    consumer (``embedding_dup_pairs_lsh``) gets (id, sig, vector) from
    ONE narrow pass instead of joining signatures back to vectors."""
    if not (1 <= num_planes <= 64):
        raise ValueError(
            f"num_planes ({num_planes}) must be in [1, 64]: the signature "
            "is one 64-bit word"
        )
    # the id column passes through untouched — derive its type from the
    # input schema instead of pinning long, so string ids (image_id)
    # work as well as bigint ids (same contract as stats.pca_project)
    id_type = emb.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, sig long"
    if carry_vec:
        vec_type = emb.schema[vec_col].dataType.simpleString()
        schema += f", {vec_col} {vec_type}"

    def run(batches):
        H = None
        plane_dim = None
        for batch in batches:
            ids = batch.column(id_col)
            if len(ids) == 0:
                continue
            # shared guard: NULL/ragged vectors are rejected loudly —
            # flatten() silently skips nulls and would misalign the
            # matrix (see similarity._emb_matrix)
            from .similarity import _emb_matrix

            X = _emb_matrix(batch.column(vec_col))
            d = X.shape[1]
            if H is None:
                H = _srp_plane_matrix(d, num_planes, seed)
                plane_dim = d
            elif d != plane_dim:
                # mixed-dimension corpus: signatures from unrelated
                # hyperplane sets would share one 64-bit signature
                # space, producing spurious cross-dim bucket collisions
                # that verify only wastes work on (and a data-quality
                # problem that goes unreported) — reject loudly, like
                # _emb_matrix does for ragged batches
                raise ValueError(
                    f"srp_signatures: mixed embedding dimensions in one "
                    f"corpus ({plane_dim} then {d}); signatures across "
                    f"dimensions are incomparable — split the corpus by "
                    f"dimension first"
                )
            sig = _srp_sigs_of(X, H)
            arrays = [ids, pa.array(sig.view(np.int64), pa.int64())]
            names = [id_col, "sig"]
            if carry_vec:
                arrays.append(batch.column(vec_col))
                names.append(vec_col)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return emb.select(id_col, vec_col).mapInArrow(run, schema)


def assert_uniform_dims(emb: DataFrame, vec_col: str = "embedding") -> int:
    """Loudly verify every vector in the corpus shares ONE dimension and
    return it — the global complement to ``srp_signatures``' per-task
    guard, which a partition-aligned mixed-dim corpus slips past.  One
    aggregate job over the list sizes (narrow: only the list offsets are
    decoded, never the values); distinct sizes are at most a handful of
    rows to the driver.  NULL vectors are rejected too — they would
    later crash ``_emb_matrix`` with a less attributable error."""
    # NULLs are counted EXPLICITLY (isNull), not inferred from
    # size(NULL): that returns NULL only under ANSI semantics — on a
    # legacy-config session size(NULL) is -1 and an inference-based
    # guard silently reports dimension -1 instead of raising
    row = (
        emb.select(
            F.col(vec_col).isNull().alias("_isnull"),
            F.size(F.col(vec_col)).alias("_d"),
        )
        .agg(
            F.sum(F.col("_isnull").cast("long")).alias("n_null"),
            F.collect_set(F.when(~F.col("_isnull"), F.col("_d"))).alias("dims"),
        )
        .first()
    )
    if row.n_null:
        raise ValueError(
            f"assert_uniform_dims: {row.n_null} NULL {vec_col} row(s) in "
            "corpus — filter or impute upstream"
        )
    dims = sorted(row.dims)
    if not dims:
        raise ValueError("assert_uniform_dims: empty corpus")
    if len(dims) != 1:
        raise ValueError(
            f"assert_uniform_dims: mixed embedding dimensions {dims}; "
            "signatures across dimensions are incomparable — split the "
            "corpus by dimension first"
        )
    return dims[0]


def srp_bands_for_threshold(num_planes: int, threshold: float) -> int:
    """SRP twin of ``bands_for_threshold``: for cosine threshold c, a
    sign bit matches with p = 1 − arccos(c)/π (Charikar), so the
    banding problem reduces to the minhash one at similarity p —
    fewest bands whose S-curve knee sits at or below p.  E.g. 64
    planes at c=0.95 → p≈0.899 → 8×8 banding (knee 0.771)."""
    import math

    c = min(max(threshold, -1.0), 1.0)
    p = 1.0 - math.acos(c) / math.pi
    return bands_for_threshold(num_planes, p)


def srp_band_key_array(sig_col: str, num_planes: int, bands: int):
    """array<long> Column of an SRP signature's band keys — bands
    contiguous ``num_planes/bands``-bit slices of the 64-bit word.
    ONE definition shared by the batch bucket join
    (``embedding_dup_pairs_lsh``) and the streaming store
    (``streaming.feed.srp_dedup_batch``) so their keys can never
    diverge."""
    r = num_planes // bands
    if r >= 64:
        # bands=1 over a 64-bit signature (threshold→1.0 derives this)
        # is an exact-equality join; the mask literal 2^64-1 overflows
        # a Spark long, so — mirroring banded_hamming_pairs — the
        # unshifted column IS the single band key
        return F.array(F.col(sig_col))
    mask = (1 << r) - 1
    return F.array(
        *[
            F.shiftrightunsigned(F.col(sig_col), r * i).bitwiseAND(F.lit(mask))
            for i in range(bands)
        ]
    )


def embedding_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 64,
    bands: int | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cosine): pairs with cosine ≥ threshold via
    random-hyperplane LSH — the scale path ``embedding_dup_pairs``
    lacks.  The all-pairs form is quadratic within its blocking key;
    this one buckets 64-bit SRP signatures (``srp_signatures``) into
    ``bands`` bands of 64/bands bits, equi-joins on (band, key), and
    exact-verifies the surviving candidates with the same JVM
    zip_with/aggregate cosine as the brute-force form — signatures are
    the only join payload, vectors are pulled once for candidates only.

    Recall: exact duplicates (cosine 1, e.g. rescaled copies) collide
    in every band — recall exactly 1.  Near-duplicates at cosine c
    match each bit with p = 1 − arccos(c)/π; ``bands=None`` derives the
    banding from the threshold via ``srp_bands_for_threshold`` (fewest
    bands whose knee sits at or below p — recall ≥63% AT the threshold,
    climbing steeply above), exactly the minhash ``bands_for_threshold``
    trade-off mapped through the SRP collision probability.

    VERIFY SHAPE (r6): the exact verify runs INSIDE each (band, key)
    bucket — one shuffle of (id, vector) rows × bands into a
    groupBy-applyInPandas whose kernel (``_group_dup_pairs_pdf``,
    shared with the brute-force form) matmul-prescreens and
    einsum-verifies the bucket's pairs, emitting only those at
    threshold; a tiny distinct folds the per-band duplicates (identical
    cosine bits by construction — one kernel).  The former shape
    materialized every candidate PAIR and joined both vectors onto it:
    with b-bit band keys the candidate count is Θ(n²/2^r · bands)
    (7.5M pairs from 20k vectors at sf1.0 — ~6 GB of per-pair vector
    payload through interpreted zip_with folds, 14.6 s); the bucket
    form moves each vector ``bands`` times (linear, 85 MB here) and
    does the same pair arithmetic in BLAS.  Per-bucket work is chunked
    (~256 MB prescreen bound), and a hot bucket is a groupBy key — the
    same skew story as any aggregate."""
    if bands is None:
        bands = srp_bands_for_threshold(num_planes, threshold)
    r = num_planes // bands
    if bands * r != num_planes:
        raise ValueError("bands must divide num_planes")
    vecs = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    id_type = vecs.schema["vec_id"].dataType.simpleString()
    sigs = srp_signatures(
        vecs, num_planes, seed, id_col="vec_id", vec_col="v", carry_vec=True
    )
    band_arr = srp_band_key_array("sig", num_planes, bands)
    melt = sigs.select("vec_id", "v", F.posexplode(band_arr).alias("band", "key"))

    def kernel(pdf):
        return _group_dup_pairs_pdf(pdf, threshold)

    pairs = melt.groupBy("band", "key").applyInPandas(
        kernel, f"vec_a {id_type}, vec_b {id_type}, cosine double"
    )
    # identical (vec_a, vec_b) found in several bands carry bit-identical
    # cosines (one kernel, same raw vectors) — distinct folds them
    return pairs.distinct()


def whitened_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.95,
    k_components: int | None = None,
    num_planes: int = 64,
    bands: int | None = None,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eps: float = 1e-12,
) -> DataFrame:
    """(vec_a, vec_b, cosine): near-dup pairs at cosine ≥ threshold on
    the PCA-WHITENED corpus — the composed pipeline a real embedding
    dedup runs (VERDICT r4 #4): raw cosine thresholds are dominated by
    the corpus's high-variance directions, so pipelines whiten first
    (decorrelated, unit-variance dimensions) and threshold there.

    Composition, and what each stage costs at 100 TB:
      1. ``stats.pca_fit(emb, k_components)`` — ONE corpus scan
         (d + d² map-side-combined partials), driver-side d×d eigh.
      2. ``stats.pca_project(whiten=True)`` — a per-batch matmul that
         FUSES with step 3's signature kernel: mapInArrow feeding
         mapInArrow is a narrow chain, one stage, ZERO added shuffle
         (asserted by test_whitened_plan_no_extra_exchange; PLANS.md).
      3. ``embedding_dup_pairs_lsh`` on the projected vectors — the
         audited bucketed-SRP shape (signatures-only shuffles,
         candidates-only verify).
    Total: the whitened pipeline costs exactly one extra corpus scan
    (the moment pass) over the unwhitened LSH dedup.

    The emitted ``cosine`` is measured in the WHITENED space (that is
    the point); pairs with identical raw vectors project identically —
    cosine 1, recall 1 through every band."""
    from .stats import pca_fit, pca_project

    model = pca_fit(emb, k_components, vec_col)
    proj = pca_project(
        emb, model, whiten=True, id_col=id_col, vec_col=vec_col, eps=eps
    )
    return embedding_dup_pairs_lsh(
        proj,
        threshold=threshold,
        num_planes=num_planes,
        bands=bands,
        seed=seed,
        id_col=id_col,
        vec_col="projected",
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the dup-pair graph
# ---------------------------------------------------------------------------


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free an eager localCheckpoint's storage blocks NOW.

    A checkpointed DataFrame's analyzed plan is a LogicalRDD whose
    ``rdd`` member IS the checkpointed (persisted) RDD — unpersisting
    it through py4j drops the blocks immediately instead of waiting for
    the Python reference's GC.  The frame is unusable afterwards (a
    local checkpoint cannot be recomputed), so call this only on
    SUPERSEDED frames nothing references.  Best-effort: on any internal
    API drift the blocks simply fall back to GC-time release."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _driver_min_label_components(rows) -> dict:
    """node → min reachable node over an edge list, via union-find with
    path compression — the driver-side kernel of ``dup_clusters``' small-
    graph fast path.  Deterministic: the component minimum is placement-
    independent."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    best: dict = {}
    for n in parent:
        r = find(n)
        if r not in best or n < best[r]:
            best[r] = n
    return {n: best[find(n)] for n in parent}


def dup_clusters(
    pairs: DataFrame, max_iters: int = 25, driver_edges_max: int = 1_000_000
) -> DataFrame:
    """(doc_id, cluster_id): connected components of the duplicate-pair
    graph, cluster_id = smallest doc_id reachable — the canonical-
    document selection step of a dedup pipeline (keep min, drop rest).

    SIZE-ADAPTIVE (r6): the edge list is materialized (it was anyway —
    every propagation round re-reads it) and counted; at or below
    ``driver_edges_max`` directed edges the components are solved with
    driver-side union-find in one collect — the pair graph is
    duplicate-count sized (documented throughout this module, ~1e-6 of
    the corpus for web dedup), so the common case is a few thousand
    edges for which the distributed rounds were pure job-floor overhead
    (measured 3.3 s of sub-second round jobs at sf1.0 for a 5k-edge
    graph; the driver path is ~0.3 s).  Above the bound — a
    high-duplication corpus where the collect could hurt the driver —
    the original distributed pointer-jumping rounds run unchanged.
    Both paths emit identical labels (component-minimum is placement-
    independent; pinned equal by test).

    Distributed min-label propagation WITH pointer jumping: each round
    every node takes the minimum of its own label, its neighbors'
    labels, and its label's label (label(label(v)) — the path-halving
    step of pointer-doubling / large-star contraction, PAPERS.md
    Kiveris et al.).  Neighbor propagation alone needs O(diameter)
    rounds — a 26-hop duplicate chain would exhaust max_iters — while
    the label-of-label shortcut compresses pointer chains geometrically,
    giving O(log diameter) convergence (25 iters covers ~2^25-hop
    chains).  Labels only decrease and are bounded by the component
    minimum; at the fixpoint label(v) ≤ label(u) across every
    (symmetric) edge, so labels are uniform per component.  Dup
    clusters from LSH are near-cliques (diameter 2-3) → 2-4 rounds of
    plain shuffled equi-joins Catalyst can plan — no driver-side
    union-find, no collect of the edge list.  ``max_iters`` still
    bounds the loop; hitting it raises rather than returning a
    half-converged labeling."""
    # symmetrize with ONE explode, not a self-union: the union's two
    # branches each re-evaluate the (possibly expensive, e.g. minhash
    # verify) pairs subtree, the explode scans it once
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
                F.struct(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")),
            )
        ).alias("_e")
    ).select("_e.a", "_e.b").persist()
    id_type = pairs.schema["doc_a"].dataType.simpleString()
    # ONE probe job instead of count-then-collect: collect at most
    # limit+1 rows — under the limit that IS the whole edge list (and
    # the driver is never exposed to more than limit+1 rows), over it
    # we fall back to the distributed rounds after forcing the cache
    # the rounds reuse (the short-circuited limit may have skipped
    # partitions)
    probe = edges.limit(driver_edges_max + 1).collect()
    if len(probe) <= driver_edges_max:
        labels = _driver_min_label_components((r.a, r.b) for r in probe)
        edges.unpersist()
        spark = pairs.sparkSession
        return spark.createDataFrame(
            list(labels.items()), f"doc_id {id_type}, cluster_id {id_type}"
        )
    del probe
    edges.count()  # materialize the cache fully for the rounds
    # each iteration references labels THREE times (neighbor join,
    # pointer hop, changed-check); localCheckpoint truncates lineage so
    # the logical plan stays O(1) per round instead of growing 3^k —
    # without it Catalyst itself OOMs around round 9.  At warehouse
    # scale, set a reliable checkpoint dir and use .checkpoint() for
    # executor-loss safety.  Superseded rounds' checkpoint blocks (two
    # longs per node) are released EXPLICITLY via the LogicalRDD handle
    # (_release_local_checkpoint) the moment the next round is
    # materialized — storage stays at one round's blocks regardless of
    # how many clustering calls a session makes, instead of
    # accumulating orphans until driver GC.
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label").alias("nl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("nbr_min"))
        )
        # pointer jumping: label(label(v)) — self-join of the label map
        hop = labels.select(
            F.col("node").alias("lbl_node"), F.col("label").alias("lbl2")
        )
        jumped = labels.join(
            hop, labels.label == hop.lbl_node, "left"
        ).select("node", "label", F.coalesce("lbl2", "label").alias("lbl2"))
        # ONE action per round: the changed-count rides the checkpoint
        # job as an observed metric (the new label is least(old, ...),
        # so "changed" is computable inline — no join against the old
        # label map, no second limit(1).count() job; round-4 advice).
        # Verified: eager localCheckpoint executes the CollectMetrics
        # node and delivers the Observation, so obs.get cannot block.
        obs = Observation()
        new_labels = (
            jumped.join(nbr, jumped.node == nbr.a, "left")
            .select(
                "node",
                F.col("label").alias("_old"),
                F.least(
                    F.col("label"),
                    F.col("lbl2"),
                    F.coalesce(F.col("nbr_min"), F.col("label")),
                ).alias("label"),
            )
            .observe(
                obs,
                F.sum((F.col("label") != F.col("_old")).cast("long")).alias(
                    "n_changed"
                ),
            )
            .select("node", "label")
            .localCheckpoint(eager=True)
        )
        changed = int(obs.get["n_changed"] or 0)
        # the old round has no readers left — free its blocks before
        # rebinding so storage never exceeds one round
        _release_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            edges.unpersist()
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
            )
    edges.unpersist()
    _release_local_checkpoint(labels)
    raise RuntimeError(f"dup_clusters did not converge in {max_iters} rounds")


def duplicate_losers(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id): pair-involved docs that are NOT their cluster's keeper
    — exactly the complement of ``canonicalize_duplicates``' keep=true
    set (same winner rule: highest ``score_col``, NULL lowest, ties to
    the lowest id; pinned equal by test), but as the TINY frame.

    This is the shape a corpus-scale "drop the duplicates" step wants:
    keepers are nearly the whole corpus (winners + every singleton), so
    ``semi-join docs × keepers`` shuffles the corpus against itself —
    while losers are bounded by pair-involved docs (duplicate-count
    sized, ~1e-6 of the corpus for web dedup), so
    ``docs LEFT ANTI JOIN broadcast(losers)`` never shuffles the corpus
    at all.  Every join here is inner against the cluster map, so no
    corpus-wide frame is ever built."""
    score = (
        F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf")))
        if score_col is not None
        else F.lit(0.0)
    )
    clusters = dup_clusters(pairs).withColumnRenamed("doc_id", id_col)
    scored = docs.select(F.col(id_col), score.alias("_s"))
    j = scored.join(clusters, id_col)  # inner: pair-involved docs only
    best = j.groupBy("cluster_id").agg(
        F.min_by(
            F.col(id_col),
            F.struct((-F.col("_s")).alias("ns"), F.col(id_col).alias("tid")),
        ).alias("_best")
    )
    return (
        j.join(best, "cluster_id")
        .where(F.col(id_col) != F.col("_best"))
        .select(id_col)
    )


def canonicalize_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cluster_id, keep): the decision step that turns near-dup
    PAIRS into a training-set selection — every doc gets its connected
    component (``dup_clusters`` over the pair graph; docs in no pair are
    their own singleton cluster) and exactly one doc per cluster is
    kept: the highest ``score_col`` (NULL scores sort lowest), ties to
    the lowest id.  ``score_col=None`` keeps the lowest id.

    Scale shape: a singleton's winner is itself, so the best-per-cluster
    choice only ever runs over PAIR-INVOLVED docs — an inner join of the
    (id, score) projection against the tiny cluster map (AQE broadcasts
    it; the corpus side never shuffles), then a map-side-combined
    ``max_by`` aggregate over that small set (an aggregate, not a
    row_number window: a giant boilerplate cluster partially reduces in
    every task instead of becoming one hot window partition).  The
    corpus-wide output is two broadcast-sized left joins on the pruned
    (id, score) projection — no corpus shuffle, no corpus-wide
    aggregate, text never read."""
    score = (
        F.coalesce(F.col(score_col).cast("double"), F.lit(float("-inf")))
        if score_col is not None
        else F.lit(0.0)
    )
    clusters = dup_clusters(pairs).withColumnRenamed("doc_id", id_col)
    scored = docs.select(F.col(id_col), score.alias("_s"))
    # min of (-score, id): highest score, then lowest id — the exact
    # tie order the oracle's window (score DESC, id ASC) uses.  The id
    # rides the struct ORDER (not a negation), so string ids compare
    # lexicographically instead of failing UnaryMinus under ANSI.
    best = (
        scored.join(clusters, id_col)  # inner: clustered docs only
        .groupBy("cluster_id")
        .agg(
            F.min_by(
                F.col(id_col),
                F.struct((-F.col("_s")).alias("ns"), F.col(id_col).alias("tid")),
            ).alias("_best")
        )
    )
    return (
        scored.join(clusters, id_col, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
        .join(best, "cluster_id", "left")
        .select(
            id_col,
            "cluster_id",
            # singleton clusters carry no winner row: NULL == id is
            # NULL, coalesced to True (a singleton always keeps)
            F.coalesce(F.col(id_col) == F.col("_best"), F.lit(True)).alias(
                "keep"
            ),
        )
    )
