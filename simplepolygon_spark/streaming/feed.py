"""Streaming image-feed operators.

The batch engine's pipeline is snapshot-based (resume via the lineage
log); when the image table arrives as a *feed* instead, these operators
give the streaming path:

  read_image_feed      — file-source stream with the images schema
  dedupe_feed          — drop duplicate image_ids within a watermark
                         (late re-deliveries beyond the watermark age out)
  windowed_feed_stats  — per event-time window ingest metrics
  stream_tile_assign   — PIP tile assignment on the stream: the same
                         broadcast interval index + Arrow batch kernel as
                         the batch path (stateless per row, stream-safe)
  start_banded_near_dedup — in-stream SimHash/Hamming near-dedup
                         (foreachBatch over a parquet signature store)
  start_minhash_near_dedup — in-stream MinHash/Jaccard near-dedup:
                         "drop re-crawls at j≥0.8 as they arrive";
                         same store architecture, exact-Jaccard verify
  decontaminate_feed   — drop benchmark-overlapping docs as they arrive
                         (stateless stream-static broadcast anti-join)
  decontaminate_feed_ngrams — drop docs sharing any normalized word
                         n-gram with the benchmark (stateless
                         stream-static arrays_overlap anti-join)
  start_assign_with_lineage — the full ingest→assign→commit sink:
                         foreachBatch writes each micro-batch through
                         the lineage log (exactly-once across replays;
                         read with plans.lineage.read_result)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.images import IMAGES_SCHEMA


def read_image_feed(spark: SparkSession, path: str, with_ts: bool = True) -> DataFrame:
    """File-source stream over a directory of image-table parquet files."""
    st = spark.readStream.schema(IMAGES_SCHEMA).parquet(path)
    if with_ts:
        # deterministic event time derived from the id (no wall clock):
        # one second per 1000 images starting 2026-01-01
        # substr(id, 4) with NO length bound: image_id is img{i:09d},
        # which widens past 9 digits at i >= 10^9 — a fixed-width
        # substring would silently collapse distinct rows onto the same
        # event time at the 10^12-row scale the images table simulates
        st = st.withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1767225600)
                + (F.expr("substr(image_id, 4)").cast("long") / 1000).cast("long")
            ),
        )
    return st


def dedupe_feed(feed: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once-per-image within the watermark horizon."""
    return feed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["image_id"]
    )


def windowed_feed_stats(feed: DataFrame, window: str = "1 minute") -> DataFrame:
    """Per event-time window: row count + byte volume (append mode)."""
    return (
        feed.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.length("bytes")).alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_images",
            "n_bytes",
        )
    )


def stream_tile_assign(feed: DataFrame, index_bc) -> DataFrame:
    """Streaming PIP tile assignment — same kernel as the batch join."""
    from ..operators.tiling import pip_join

    return pip_join(feed, index_bc)


def dedupe_near_feed(doc_feed: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming near-duplicate suppression for a document feed
    (doc_id, text, ts): each micro-batch computes the 64-bit SimHash
    with the SAME vectorized kernel as the batch operator (stateless
    per row — stream-safe), then drops signature-equal re-posts within
    the watermark horizon.

    Signature equality catches token-identical and near-identical
    re-posts (the dominant streaming dup mode); banded hamming>0
    matching needs multi-key LSH membership, which is not expressible
    as one dropDuplicates key — for that use
    ``start_banded_near_dedup`` below."""
    import numpy as np
    import pyarrow as pa

    from ..operators.dedup import simhash_of_texts

    schema = "doc_id long, text string, ts timestamp, simhash long"

    def run(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            sig = simhash_of_texts(batch.column("text").to_pylist())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("text"),
                    batch.column("ts"),
                    pa.array(sig.view(np.int64), pa.int64()),
                ],
                names=["doc_id", "text", "ts", "simhash"],
            )

    # NULL text has no signature — exclude SQL-side (kernel would crash)
    sigs = (
        doc_feed.select("doc_id", "text", "ts")
        .where(F.col("text").isNotNull())
        .mapInArrow(run, schema)
    )
    return sigs.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["simhash"]
    )

def _with_simhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, text, ts, simhash, band0..bandN) — the stream-side twin
    of operators.dedup.simhash_64: same hash kernel, same banding
    geometry (dedup.SIMHASH_N_BANDS/SIMHASH_BAND_BITS — the single
    source of truth, so stream and landed-table batch bucket keys can
    never diverge), plus passthrough cols."""
    import numpy as np
    import pyarrow as pa

    from ..operators.dedup import (
        SIMHASH_BAND_COLS,
        simhash_band_arrays,
        simhash_of_texts,
    )

    schema = "doc_id long, text string, ts timestamp, simhash long, " + ", ".join(
        f"{c} int" for c in SIMHASH_BAND_COLS
    )

    def run(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            sig = simhash_of_texts(batch.column("text").to_pylist())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("text"),
                    batch.column("ts"),
                    pa.array(sig.view(np.int64), pa.int64()),
                    *[pa.array(b, pa.int32()) for b in simhash_band_arrays(sig)],
                ],
                names=["doc_id", "text", "ts", "simhash", *SIMHASH_BAND_COLS],
            )

    # NULL text has no signature — exclude SQL-side (kernel would crash)
    return (
        docs.select("doc_id", "text", "ts")
        .where(F.col("text").isNotNull())
        .mapInArrow(run, schema)
    )


def banded_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    state_dir: str,
    max_hamming: int = 3,
    stream_id: str = "s0",
) -> None:
    """One micro-batch of banded near-dedup (the ``foreachBatch`` body,
    split out so tests can drive it as plain batch code).

    Greedy first-wins over (ts, then doc_id): a doc is SUPPRESSED iff a
    strictly-earlier doc — in the signature store or earlier in this
    batch — shares a SimHash band and sits within ``max_hamming``; both
    the in-batch and the cross-batch join enforce the (ts, doc_id)
    order, so a late-arriving doc is never suppressed by a LATER-ts doc
    that merely arrived first.  Pigeonhole over 4×16-bit bands makes
    band-share a lossless filter for hamming ≤ 3, and comparisons run
    against ALL prior docs (suppressed ones included — the store keeps
    every signature).  For an in-order feed the emitted set is a pure
    function of the landed table: doc b survives iff batch
    ``simhash_dup_pairs`` yields no partner earlier than b (tested).
    With out-of-order arrival the suppression DECISIONS stay
    order-correct, but an already-emitted later doc cannot be
    retracted — both members of a pair may emit, the inherent
    streaming limit (use the batch job on the landed table for exact
    retro-dedup).

    Plan shape per batch: two (band, key) equi-joins — batch×store and
    batch×batch — signatures only (16 bytes + 4 band ints per doc;
    text never joins), then one anti-join to drop suppressed ids.
    Both sinks partition by a composite ``<stream_id>x<batch_id>`` key
    and overwrite their own partition (dynamic mode), so a replayed
    micro-batch after a failure is idempotent — the foreachBatch
    exactly-once recipe.  The STREAM identity in the key matters:
    micro-batch ids restart at 0 per checkpoint, so a new stream (fresh
    checkpoint dir) pointed at an existing state_dir would, keyed on
    batch_id alone, both exclude the old stream's batch-0 signatures
    from comparison AND silently overwrite its partitions — the exact
    hazard ``stream_id_for`` guards in the lineage sink."""
    spark = batch.sparkSession
    stream_batch = f"{stream_id}x{int(batch_id)}"
    sigs = batch.persist()
    try:
        from pyspark.errors import AnalysisException

        from ..operators.dedup import SIMHASH_BAND_COLS, melt_simhash_bands

        m = melt_simhash_bands(sigs, ["doc_id", "ts", "simhash"])
        try:
            # exclude THIS (stream, batch) from the store: on a replayed
            # batch the previous attempt's own signatures are already
            # there and would suppress every doc against itself; the
            # filter is a partition prune AND keeps the replay from
            # lazily reading the very files its own overwrite is about
            # to replace.  A different stream's batch with the same
            # numeric id is NOT excluded — its signatures are real
            # prior state.
            state = spark.read.parquet(state_dir).where(
                F.col("_stream_batch") != stream_batch
            )
        except AnalysisException:
            state = None  # first batch: no store yet; other errors propagate
        ham = lambda a, b: F.bit_count(F.col(a).bitwiseXOR(F.col(b)))
        sup_cross = None
        if state is not None:
            st = melt_simhash_bands(state, ["doc_id", "ts", "simhash"]).select(
                F.col("doc_id").alias("id_prev"),
                F.col("ts").alias("ts_prev"),
                F.col("simhash").alias("sh_prev"),
                "band",
                "bk",
            )
            # the store doc must be strictly EARLIER by (ts, doc_id) —
            # without this predicate a late-arriving doc would be
            # suppressed by a later-ts doc that merely arrived first,
            # diverging from the landed-table (batch) pair order.  Note
            # the already-emitted later doc cannot be retracted: with
            # out-of-order arrival both members of a pair may emit —
            # the inherent streaming limit; for in-order feeds output
            # equals the batch survivor set exactly (tested).
            prev_earlier = (F.col("ts_prev") < F.col("ts")) | (
                (F.col("ts_prev") == F.col("ts"))
                & (F.col("id_prev") < F.col("doc_id"))
            )
            sup_cross = (
                m.join(st, ["band", "bk"])
                .where(prev_earlier & (ham("simhash", "sh_prev") <= max_hamming))
                .select("doc_id")
            )
        a = m.select(
            F.col("doc_id").alias("id_a"), F.col("ts").alias("ts_a"),
            F.col("simhash").alias("sh_a"), "band", "bk",
        )
        b = m.select(
            F.col("doc_id").alias("id_b"), F.col("ts").alias("ts_b"),
            F.col("simhash").alias("sh_b"), "band", "bk",
        )
        earlier = (F.col("ts_a") < F.col("ts_b")) | (
            (F.col("ts_a") == F.col("ts_b")) & (F.col("id_a") < F.col("id_b"))
        )
        sup_in = (
            a.join(b, ["band", "bk"])
            .where(earlier & (ham("sh_a", "sh_b") <= max_hamming))
            .select(F.col("id_b").alias("doc_id"))
        )
        suppressed = sup_in if sup_cross is None else sup_in.union(sup_cross)
        survivors = sigs.join(suppressed.distinct(), "doc_id", "left_anti")

        # state grows by EVERY doc's signature (suppressed included);
        # sinks are idempotent under micro-batch replay
        for df, path, cols in (
            (sigs, state_dir, ["doc_id", "ts", "simhash", *SIMHASH_BAND_COLS]),
            (survivors, out_dir, ["doc_id", "text", "ts", "simhash"]),
        ):
            (
                df.select(*cols)
                .withColumn("_stream_batch", F.lit(stream_batch))
                .write.partitionBy("_stream_batch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(path)
            )
    finally:
        sigs.unpersist()


def start_banded_near_dedup(
    doc_feed: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_hamming: int = 3,
    **trigger,
):
    """Streaming banded near-dedup: suppress any doc within
    ``max_hamming`` SimHash bits of ANY earlier doc — the in-stream
    equivalent of batch ``simhash_dup_pairs`` (VERDICT r2 item 4).

    Multi-key LSH membership (4 band keys per doc) is not one
    dropDuplicates key, and a second stateful operator downstream of
    applyInPandasWithState is unsupported — so the idiomatic shape is
    ``foreachBatch`` over a parquet signature store: per micro-batch,
    two signature-only (band, key) equi-joins decide suppression, both
    sinks overwrite their own batch_id partition (replay-idempotent),
    and the store IS the durable state (survives restarts with the
    checkpoint; at warehouse scale a bucketed table + periodic
    compaction).  The partition key carries the stream identity
    (``stream_id_for(checkpoint_dir)``) so a NEW stream resuming over
    an existing store can neither clobber the old stream's partitions
    nor skip its signatures.  Returns the started StreamingQuery."""
    sid = stream_id_for(checkpoint_dir)
    sigs = _with_simhash_bands(doc_feed)
    return (
        sigs.writeStream.foreachBatch(
            lambda df, bid: banded_dedup_batch(
                df, bid, out_dir, state_dir, max_hamming, stream_id=sid
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def decontaminate_feed(doc_feed: DataFrame, benchmark: DataFrame) -> DataFrame:
    """Stream-side exact-overlap decontamination: drop arriving docs
    whose normalized text fingerprint occurs in the (static) benchmark
    set — the batch operator applied to the stream.  The stream-static
    left_anti join is STATELESS (no watermark, no state store, no
    retraction concerns: membership in a fixed benchmark never changes),
    so each micro-batch runs the exact broadcast anti-join the batch
    path runs — fingerprint computed in-scan, benchmark dim broadcast,
    fact side shuffle-free.  NULL-text docs survive, matching batch
    ``decontaminate``'s anti-join NULL contract (tested stream ≡ batch
    on the landed table)."""
    from ..operators.sampling import decontaminate

    return decontaminate(doc_feed, benchmark)


def decontaminate_feed_ngrams(
    doc_feed: DataFrame, benchmark: DataFrame, n: int = 13
) -> DataFrame:
    """Stream-side n-gram-overlap decontamination: drop arriving docs
    sharing ANY normalized word ``n``-gram with the static benchmark
    set — the in-stream twin of ``operators.sampling
    .decontaminate_ngrams``, same gram definition
    (``norm_word_ngrams`` — one source of truth, so stream and batch
    match sets can never diverge).

    The batch operator's explode → semi-join → doc-level distinct →
    anti-join needs a streaming self-join (unsupported), so the
    stream-safe shape is ONE stateless stream-static left_anti join on
    an ``arrays_overlap`` condition: each arriving doc's gram array is
    tested against each benchmark row's gram array (broadcast
    nested-loop anti join).  Per-batch cost is O(|batch| × |benchmark|)
    overlap tests — fine for benchmark sets (small by definition); the
    batch operator keeps the hash-join shape for corpus-scale re-runs.
    NULL-text docs and docs shorter than ``n`` normalized tokens
    survive, matching the batch contract (tested stream ≡ batch on the
    landed table, including a planted mid-document contamination)."""
    from ..operators.sampling import norm_word_ngrams

    tg = "__decon_tg"
    if tg in doc_feed.columns:
        raise ValueError(f"decontaminate_feed_ngrams: input already has column {tg}")
    bench_g = (
        benchmark.select(norm_word_ngrams("text", n).alias("__bg"))
        .where(F.size("__bg") > 0)
        .distinct()
    )
    s = doc_feed.withColumn(tg, norm_word_ngrams("text", n))
    return s.join(
        F.broadcast(bench_g),
        F.arrays_overlap(F.col(tg), F.col("__bg")),
        "left_anti",
    ).drop(tg)


def _with_minhash_sigs(
    docs: DataFrame, num_hashes: int = 64, k: int = 5, seed: int = 7
) -> DataFrame:
    """(doc_id, text, ts, sig array<long>) — the stream-side twin of
    ``operators.dedup.minhash_doc_sigs``: the same ``_batch_minhash``
    kernel and the same seeded hash family, so stream and landed-table
    batch signatures can never diverge; text and ts pass through (the
    store needs the text for exact-Jaccard verification)."""
    import numpy as np
    import pyarrow as pa

    from ..operators.dedup import _MERSENNE, _batch_minhash

    rng = np.random.default_rng(seed)
    A = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64)
    B = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)
    schema = "doc_id long, text string, ts timestamp, sig array<long>"

    def run(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            sig = _batch_minhash(batch.column("text").to_pylist(), A, B, k)
            rows = sig.T.astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    batch.column("text"),
                    batch.column("ts"),
                    pa.array(list(rows), pa.list_(pa.int64())),
                ],
                names=["doc_id", "text", "ts", "sig"],
            )

    # NULL text has no signature — exclude SQL-side (kernel would crash)
    return (
        docs.select("doc_id", "text", "ts")
        .where(F.col("text").isNotNull())
        .mapInArrow(run, schema)
    )


def minhash_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    state_dir: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    k: int = 5,
    stream_id: str = "s0",
    log_candidates: bool = False,
) -> None:
    """One micro-batch of MinHash (Jaccard) banded near-dedup — the
    ``foreachBatch`` body of ``start_minhash_near_dedup``, split out so
    tests can drive it as plain batch code.

    Greedy first-wins over (ts, then doc_id), the same contract as
    ``banded_dedup_batch``: a doc is SUPPRESSED iff a strictly-earlier
    doc — in the signature store or earlier in this batch — shares an
    LSH band (threshold-derived geometry, ``bands_for_threshold``, the
    SAME banding as batch ``minhash_dup_pairs``) and its exact
    distinct-k-gram Jaccard is ≥ threshold.  Verification is the exact
    Jaccard (not the signature estimate), computed JVM-side for
    candidate pairs only — which is why the store keeps each doc's
    text alongside its signature (a second copy of the corpus; the
    price of exact-threshold parity with the batch operator.  Note the
    one semantic daylight vs ``minhash_dup_pairs``: the batch op also
    applies a signature-estimate pre-filter before its exact verify,
    so a pair whose estimate strays below threshold − margin while its
    exact Jaccard clears the threshold is dropped there but suppressed
    here — both only possible in the estimator's ±margin tail).

    In-batch and cross-batch suppression share ONE (band, band_hash)
    equi-join: the prior side is store ∪ batch, and the strictly-earlier
    (ts, doc_id) predicate both orders pairs and excludes self-pairs.
    Candidate ids are eagerly localCheckpointed (the bucket join runs
    once, feeding the two text joins), and the blocks are released
    before return — a long stream never accumulates them.  Sinks
    partition on the composite ``<stream_id>x<batch_id>`` key with
    dynamic overwrite: replay-idempotent, and a NEW stream over an old
    store neither clobbers nor skips the old stream's partitions.  As
    with the SimHash sink, an already-emitted later doc cannot be
    retracted under out-of-order arrival; for in-order feeds the
    emitted set is a pure function of the landed table (tested against
    batch ``minhash_dup_pairs``)."""
    spark = batch.sparkSession
    stream_batch = f"{stream_id}x{int(batch_id)}"
    from pyspark.errors import AnalysisException

    from ..operators.dedup import (
        _band_hash_array,
        _release_local_checkpoint,
        bands_for_threshold,
        shingle_col,
    )

    bands = bands_for_threshold(num_hashes, threshold)
    r = num_hashes // bands
    # band keys are computed ONCE per doc (here, on arrival) and
    # PERSISTED in the store, so every later micro-batch melts the
    # stored array instead of re-hashing the whole store's signatures —
    # without this the per-batch cost grows O(|store| · bands) forever
    sigs = batch.withColumn("band_hashes", _band_hash_array(bands, r)).persist()
    cand = None
    try:
        try:
            state = spark.read.parquet(state_dir).where(
                F.col("_stream_batch") != stream_batch
            )
            # loud banding guard: a store written under a DIFFERENT
            # threshold/num_hashes has incomparable band keys — joining
            # them would silently miss every cross-batch duplicate.
            # Parquet row-group stats satisfy the != pushdown without
            # reading data when the store is clean.
            if state.where(F.col("_bands") != bands).limit(1).count() > 0:
                raise ValueError(
                    f"minhash signature store at {state_dir} was written "
                    f"with a different banding than the current "
                    f"threshold/num_hashes derive ({bands} bands); "
                    "re-banding an existing store requires a batch "
                    "rebuild, not a silent mix"
                )
        except AnalysisException:
            state = None  # first batch: no store yet; other errors propagate
        prior = sigs.select("doc_id", "text", "ts", "band_hashes")
        if state is not None:
            prior = prior.unionByName(
                state.select("doc_id", "text", "ts", "band_hashes")
            )
        melt = lambda df: df.select(
            "doc_id",
            "ts",
            F.posexplode("band_hashes").alias("band", "band_hash"),
        )
        bm = melt(sigs)
        pm = melt(prior).select(
            F.col("doc_id").alias("id_prev"),
            F.col("ts").alias("ts_prev"),
            "band",
            "band_hash",
        )
        # the prior doc must be strictly EARLIER by (ts, doc_id) — this
        # both enforces landed-table pair order for late arrivals and
        # excludes each doc's self-pair from the unioned prior side
        prev_earlier = (F.col("ts_prev") < F.col("ts")) | (
            (F.col("ts_prev") == F.col("ts")) & (F.col("id_prev") < F.col("doc_id"))
        )
        cand = (
            bm.join(pm, ["band", "band_hash"])
            .where(prev_earlier)
            .select("doc_id", "id_prev")
            .distinct()
            # eager: the candidate set feeds two text joins and the
            # optional count — run the bucket join once
            .localCheckpoint(eager=True)
        )
        if log_candidates:
            print(
                f"[minhash_dedup] batch {stream_batch}: "
                f"{cand.count()} candidate pairs",
                flush=True,
            )
        # exact verify on candidates only: semi-join each side's text
        # down to participating ids BEFORE shingling, so shingle arrays
        # are computed for (and shuffled by) candidates, never the store
        pids = cand.select(F.col("id_prev").alias("doc_id")).distinct()
        sh_p = (
            prior.join(pids, "doc_id", "left_semi")
            .select(F.col("doc_id").alias("id_prev"), shingle_col("text", k).alias("sh_p"))
        )
        sh_b = sigs.join(
            cand.select("doc_id").distinct(), "doc_id", "left_semi"
        ).select("doc_id", shingle_col("text", k).alias("sh_b"))
        j = cand.join(sh_b, "doc_id").join(sh_p, "id_prev")
        jac = F.size(F.array_intersect("sh_b", "sh_p")) / F.greatest(
            F.size(F.array_union("sh_b", "sh_p")), F.lit(1)
        )
        suppressed = j.where(jac >= threshold).select("doc_id").distinct()
        survivors = sigs.join(suppressed, "doc_id", "left_anti")

        # state grows by EVERY doc's signature, band keys, and text
        # (suppressed included — later docs must compare against them);
        # sig rides along for provenance/offline re-banding but is
        # never read on the hot path (columnar: unread = free)
        for df, path, cols in (
            (
                sigs.withColumn("_bands", F.lit(bands)),
                state_dir,
                ["doc_id", "text", "ts", "sig", "band_hashes", "_bands"],
            ),
            (survivors, out_dir, ["doc_id", "text", "ts"]),
        ):
            (
                df.select(*cols)
                .withColumn("_stream_batch", F.lit(stream_batch))
                .write.partitionBy("_stream_batch")
                .option("partitionOverwriteMode", "dynamic")
                .mode("overwrite")
                .parquet(path)
            )
    finally:
        sigs.unpersist()
        if cand is not None:
            _release_local_checkpoint(cand)


def start_minhash_near_dedup(
    doc_feed: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    k: int = 5,
    **trigger,
):
    """Streaming MinHash near-dedup: drop any doc whose exact k-gram
    Jaccard with ANY earlier doc is ≥ threshold, as it arrives — the
    in-stream equivalent of batch ``minhash_dup_pairs`` ("drop
    re-crawls at j≥0.8 as they arrive"), completing the modality set
    next to the SimHash/Hamming sink (``start_banded_near_dedup``).
    Same architecture: ``foreachBatch`` over a parquet signature store
    (multi-key LSH membership is not one dropDuplicates key), sinks
    partitioned on the stream-carrying batch key, replay-idempotent.
    Returns the started StreamingQuery."""
    sid = stream_id_for(checkpoint_dir)
    sigs = _with_minhash_sigs(doc_feed, num_hashes, k)
    return (
        sigs.writeStream.foreachBatch(
            lambda df, bid: minhash_dedup_batch(
                df,
                bid,
                out_dir,
                state_dir,
                threshold,
                num_hashes,
                k,
                stream_id=sid,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


# per-(process, out_dir, stream_id) committed-batch cache for the
# streaming lineage sink — see assign_with_lineage_batch's docstring
_COMMITTED_BATCHES: dict[tuple, set[str]] = {}


def stream_id_for(checkpoint_dir: str) -> str:
    """Stable identity of one logical stream: micro-batch ids restart
    at 0 with every new checkpoint, so the exactly-once batch key must
    carry WHICH stream the batch id belongs to — keyed on batch_id
    alone, re-ingesting new data into an out_dir that an earlier stream
    (different checkpoint) already wrote would silently no-op its
    batches 0..N as 'replays'."""
    import hashlib
    import os

    return hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:8]


def assign_with_lineage_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_bc,
    out_dir: str,
    num_parts: int = 64,
    stream_id: str = "s0",
) -> None:
    """One micro-batch of the streaming ingest→assign→commit pipeline:
    PIP tile assignment (same broadcast index + Arrow kernel as the
    batch path) committed through the lineage log — the ``foreachBatch``
    body of ``start_assign_with_lineage``.

    Exactly-once across micro-batch REPLAYS, by the same commit-point
    argument as the batch pipeline (plans/lineage.py):

    * run_id = ``b<stream_id>x<batch_id>-<fresh attempt suffix>``
      (``stream_id`` from ``stream_id_for(checkpoint_dir)`` — batch ids
      restart at 0 per checkpoint, so the key must carry the stream
      identity or an out_dir reused by a NEW stream would treat its
      first batches as replays and silently drop them).  A replayed
      batch first checks the lineage log for ANY committed run of this
      (stream, batch) and no-ops if found.  The any-row check is sound because
      ``write_with_lineage`` publishes one run's lineage rows as a
      SINGLE file — the commit is all-or-nothing, so "any row exists"
      implies every part of the attempt committed.
    * A crash BETWEEN the data write and the lineage write leaves orphan
      files under the crashed attempt's run_id; they never get a lineage
      row, so ``read_result`` never surfaces them, and the replay
      re-processes under a FRESH attempt suffix — never appending into a
      committed (part_id, run_id) partition.
    * A batch yielding ZERO assignments commits nothing and is
      re-processed on every replay — harmless (idempotent no-op) and
      cheaper than sentinel lineage rows.

    The committed-batch set is cached per (process, out_dir): ONE
    lineage-log read at (re)start, O(1) per subsequent micro-batch —
    re-scanning the whole log per batch would make a long-lived
    stream's total replay-check cost quadratic in its batch count.
    Single-writer per out_dir, like every lineage sink here.
    """
    import os
    import uuid

    from pyspark.errors import AnalysisException

    from ..operators.tiling import pip_join
    from ..plans.lineage import LINEAGE_SUBDIR, with_part_id, write_with_lineage

    spark = batch_df.sparkSession
    bkey = f"b{stream_id}x{int(batch_id):012d}"
    done = _COMMITTED_BATCHES.get((out_dir, stream_id))
    if done is None:
        try:
            rows = (
                spark.read.parquet(os.path.join(out_dir, LINEAGE_SUBDIR))
                .select("run_id")
                .distinct()
                .collect()
            )
            done = {
                r.run_id.split("-", 1)[0]
                for r in rows
                if r.run_id.startswith("b") and "-" in r.run_id
            }
        except AnalysisException:
            done = set()  # no lineage log yet; other errors must propagate
        _COMMITTED_BATCHES[(out_dir, stream_id)] = done
    if bkey in done:
        return  # replay of an already-committed micro-batch

    asg = with_part_id(pip_join(batch_df, index_bc), "image_id", num_parts).persist()
    try:
        part_ids = [r.part_id for r in asg.select("part_id").distinct().collect()]
        # check_duplicate_run=False: the attempt suffix is a fresh uuid
        # and the done-set already gates replays — skipping the guard's
        # per-commit lineage-log read keeps a long-lived stream's cost
        # O(1) per batch instead of O(committed batches)
        write_with_lineage(
            asg,
            out_dir,
            f"{bkey}-{uuid.uuid4().hex[:8]}",
            part_ids,
            check_duplicate_run=False,
        )
        if part_ids:
            done.add(bkey)  # empty batches commit nothing — don't mark
    finally:
        asg.unpersist()


def start_assign_with_lineage(
    feed: DataFrame,
    index_bc,
    out_dir: str,
    checkpoint_dir: str,
    num_parts: int = 64,
    **trigger,
):
    """Streaming S7: the image feed lands as lineage-committed PIP
    assignments.  Read the committed result (orphans invisible) with
    ``plans.lineage.read_result`` — the SAME reader as the batch
    pipeline, so downstream consumers cannot tell which mode produced
    the table.  Returns the started StreamingQuery."""
    sid = stream_id_for(checkpoint_dir)
    return (
        feed.writeStream.foreachBatch(
            lambda df, bid: assign_with_lineage_batch(
                df, bid, index_bc, out_dir, num_parts, stream_id=sid
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
