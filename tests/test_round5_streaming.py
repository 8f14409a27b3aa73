"""Round-5 streaming-store hardening (VERDICT r4 #1 and #6).

The near-dedup signature stores are now BUCKETED by band key: each
micro-batch reads only the buckets its arrivals touch, so per-batch
scanned-store rows are bounded by touched-bucket contents, not stream
history.  The pruning proofs here are behavioral (round-2 lesson:
``df.inputFiles()`` ignores filters): corrupt every store file OUTSIDE
the buckets the next batch touches — a pruned read survives and stays
correct, a full-store scan dies on the garbage.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

TS0 = pd.Timestamp("2026-01-01 00:00:00")


def _mk_docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    )


def _corrupt_buckets(store_dir: str, key: str, keep: set[int]) -> int:
    """Overwrite every parquet file in ``{store_dir}/{key}=N/...`` for
    N not in ``keep`` with garbage bytes; returns files corrupted."""
    n = 0
    for d in sorted(os.listdir(store_dir)):
        if not d.startswith(f"{key}="):
            continue
        if int(d.split("=")[1]) in keep:
            continue
        for f in glob.glob(os.path.join(store_dir, d, "**", "*.parquet"), recursive=True):
            with open(f, "wb") as fh:
                fh.write(b"CORRUPT -- not a parquet file")
            n += 1
    return n


def _minhash_touched_buckets(spark, sigs_df, threshold=0.8, num_hashes=64, n_buckets=64):
    """The same bucket derivation the batch body uses."""
    from simplepolygon_spark.operators.dedup import (
        _band_hash_array,
        bands_for_threshold,
    )

    bands = bands_for_threshold(num_hashes, threshold)
    m = sigs_df.withColumn(
        "bh", _band_hash_array(bands, num_hashes // bands)
    ).select(F.explode("bh").alias("h"))
    return {
        r.b for r in m.select(F.pmod("h", F.lit(n_buckets)).alias("b")).distinct().collect()
    }


def test_minhash_store_scan_bounded_by_touched_buckets(spark, tmp_path):
    """VERDICT r4 #1 done-criterion: after batch 0 populates many
    buckets, batch 1 must read ONLY its touched sig buckets and the
    candidate ids' doc buckets — proven by corrupting everything else
    and watching the batch succeed with the right suppression, while a
    full-store scan dies."""
    from simplepolygon_spark.streaming.feed import (
        _MINHASH_SIG_STORE_SCHEMA,
        _with_minhash_sigs,
        minhash_dedup_batch,
    )

    base = "a sufficiently long and distinctive document body about topic"
    rows0 = [
        (i, f"{base} {i} " + " ".join(f"w{i}x{j}" for j in range(30)), TS0 + pd.Timedelta(seconds=i))
        for i in range(40)
    ]
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    s0 = _with_minhash_sigs(_mk_docs(spark, rows0))
    minhash_dedup_batch(s0, 0, out, state, threshold=0.8)

    # batch 1: an exact re-post of doc 0 (suppressed) + one fresh doc
    rows1 = [
        (100, rows0[0][1], TS0 + pd.Timedelta(seconds=100)),
        (101, "an entirely fresh document " + " ".join(f"f{j}" for j in range(30)),
         TS0 + pd.Timedelta(seconds=101)),
    ]
    s1 = _with_minhash_sigs(_mk_docs(spark, rows1))
    touched = _minhash_touched_buckets(spark, s1)
    assert 0 < len(touched) < 64, "scenario must leave untouched buckets"

    # corrupt sig buckets batch 1 does NOT touch, and doc buckets other
    # than the candidate partner's (doc 0 -> _dbkt = 0 % 64 = 0)
    n_sig = _corrupt_buckets(os.path.join(state, "sigs"), "_bkt", touched)
    n_doc = _corrupt_buckets(os.path.join(state, "docs"), "_dbkt", {0})
    assert n_sig > 0 and n_doc > 0, "nothing corrupted - proof is vacuous"

    minhash_dedup_batch(s1, 1, out, state, threshold=0.8)  # must not touch garbage
    emitted = {
        r.doc_id
        for r in spark.read.parquet(out)
        .where(F.col("_stream_batch") == "s0x1")
        .collect()
    }
    assert emitted == {101}, "re-post not suppressed or fresh doc lost"

    # control: an unpruned scan of the same store DOES hit the garbage
    with pytest.raises(Exception):
        spark.read.schema(_MINHASH_SIG_STORE_SCHEMA).parquet(
            os.path.join(state, "sigs")
        ).count()


def test_simhash_store_scan_bounded_by_touched_buckets(spark, tmp_path):
    from simplepolygon_spark.streaming.feed import (
        _SIMHASH_SIG_STORE_SCHEMA,
        _with_simhash_bands,
        banded_dedup_batch,
    )

    rows0 = [
        (i, f"document body number {i} with several distinct words {i}",
         TS0 + pd.Timedelta(seconds=i))
        for i in range(40)
    ]
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    banded_dedup_batch(_with_simhash_bands(_mk_docs(spark, rows0)), 0, out, state)

    rows1 = [(100, rows0[3][1], TS0 + pd.Timedelta(seconds=100))]
    s1 = _with_simhash_bands(_mk_docs(spark, rows1))
    # touched buckets = pmod(band key, 64) of the one arriving doc
    r1 = s1.collect()[0]
    touched = {int(r1[f"band{b}"]) % 64 for b in range(4)}
    n = _corrupt_buckets(os.path.join(state, "sigs"), "_bkt", touched)
    assert n > 0

    banded_dedup_batch(s1, 1, out, state)
    emitted = (
        spark.read.parquet(out).where(F.col("_stream_batch") == "s0x1").count()
    )
    assert emitted == 0  # the re-post was suppressed against the store

    with pytest.raises(Exception):
        spark.read.schema(_SIMHASH_SIG_STORE_SCHEMA).parquet(
            os.path.join(state, "sigs")
        ).count()


def test_store_meta_guard(spark, tmp_path):
    """A store written under a different banding fails fast; so does a
    directory with data but no meta sidecar (pre-bucketing layout /
    foreign files) — the silent-re-dedup hazard the r4 ADVICE flagged."""
    from simplepolygon_spark.streaming.feed import (
        _with_minhash_sigs,
        minhash_dedup_batch,
    )

    rows = [(i, f"meta guard document {i} body words", TS0 + pd.Timedelta(seconds=i)) for i in range(5)]
    sigs = _with_minhash_sigs(_mk_docs(spark, rows))
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    minhash_dedup_batch(sigs, 0, out, state, threshold=0.8)  # 8x8 banding
    with pytest.raises(ValueError, match="re-banding|different"):
        # threshold 0.5 derives 16x4 banding -> incompatible store
        minhash_dedup_batch(sigs, 1, out, state, threshold=0.5)

    foreign = str(tmp_path / "foreign")
    os.makedirs(foreign)
    with open(os.path.join(foreign, "stray.parquet"), "wb") as f:
        f.write(b"not ours")
    with pytest.raises(ValueError, match="no _store_meta"):
        minhash_dedup_batch(sigs, 0, str(tmp_path / "o2"), foreign, threshold=0.8)


def test_compact_signature_store_preserves_dedup(spark, tmp_path):
    """Compaction folds old batches' files into one __compacted
    partition per bucket; row counts, replay safety for the latest
    batch (keep_last=1), and subsequent suppression are unchanged."""
    from simplepolygon_spark.streaming.feed import (
        _with_minhash_sigs,
        compact_signature_store,
        minhash_dedup_batch,
    )

    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    mk = lambda rows: _with_minhash_sigs(_mk_docs(spark, rows))
    texts = [
        f"compactable document number {i} " + " ".join(f"c{i}y{j}" for j in range(25))
        for i in range(30)
    ]
    for b, sl in enumerate((slice(0, 10), slice(10, 20), slice(20, 30))):
        rows = [(i, texts[i], TS0 + pd.Timedelta(seconds=i)) for i in range(*sl.indices(30))]
        minhash_dedup_batch(mk(rows), b, out, state, threshold=0.8)

    sig_dir = os.path.join(state, "sigs")
    before_rows = spark.read.parquet(sig_dir).count()
    before_files = len(glob.glob(os.path.join(sig_dir, "**", "*.parquet"), recursive=True))
    compact_signature_store(spark, state, keep_last=1)
    after = spark.read.parquet(sig_dir)
    assert after.count() == before_rows
    after_files = len(glob.glob(os.path.join(sig_dir, "**", "*.parquet"), recursive=True))
    assert after_files < before_files
    # batches 0 and 1 folded; batch 2 (latest) kept for replay safety
    sb = {r._stream_batch for r in after.select("_stream_batch").distinct().collect()}
    assert sb == {"__compacted", "s0x2"}

    # replaying the kept latest batch is still idempotent
    rows2 = [(i, texts[i], TS0 + pd.Timedelta(seconds=i)) for i in range(20, 30)]
    minhash_dedup_batch(mk(rows2), 2, out, state, threshold=0.8)
    assert spark.read.parquet(sig_dir).count() == before_rows

    # a re-post of a COMPACTED doc is still suppressed
    rows3 = [(200, texts[0], TS0 + pd.Timedelta(seconds=200))]
    minhash_dedup_batch(mk(rows3), 3, out, state, threshold=0.8)
    emitted = (
        spark.read.parquet(out).where(F.col("_stream_batch") == "s0x3").count()
    )
    assert emitted == 0


def test_stream_keepers_equal_batch_canonicalize(spark, tmp_path):
    """VERDICT r4 #6: the stream-maintained keeper table equals batch
    canonicalize_duplicates on the landed table, restricted to
    pair-involved docs (absent docs are implicit singleton keepers)."""
    from simplepolygon_spark.operators.dedup import (
        canonicalize_duplicates,
        minhash_dup_pairs,
    )
    from simplepolygon_spark.streaming.feed import start_minhash_near_dedup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(25)
        .collect()
    )
    rows, did = [], 0

    def add(text):
        nonlocal did
        rows.append((did, text, TS0 + pd.Timedelta(seconds=did)))
        did += 1

    for r in docs:
        add(r.text)
    for r in docs[:6]:  # re-posts + near-variants -> multi-doc clusters
        add(r.text)
        add("  " + r.text)
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    feed_dir = str(tmp_path / "kfeed")
    for sl in (slice(0, 20), slice(20, 33), slice(33, None)):
        spark.createDataFrame(pdf[sl]).coalesce(1).write.mode("append").parquet(feed_dir)

    st = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    keepers_dir = str(tmp_path / "keepers")
    q = start_minhash_near_dedup(
        st,
        str(tmp_path / "kout"),
        str(tmp_path / "kstate"),
        str(tmp_path / "kckpt"),
        threshold=0.8,
        keepers_dir=keepers_dir,
    )
    q.awaitTermination(240)

    got = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in spark.read.parquet(keepers_dir).collect()
    }
    landed = spark.createDataFrame(pdf)
    pairs_b = minhash_dup_pairs(landed, threshold=0.8)
    nodes = {
        r.doc_id
        for r in pairs_b.select(F.col("doc_a").alias("doc_id"))
        .union(pairs_b.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .collect()
    }
    expect = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in canonicalize_duplicates(landed, pairs_b).collect()
        if r.doc_id in nodes
    }
    assert got == expect and len(got) >= 12
    # exactly one keeper per cluster, and it is the min id
    by_cluster = {}
    for d, c, k in got:
        by_cluster.setdefault(c, []).append((d, k))
    for c, members in by_cluster.items():
        keeps = [d for d, k in members if k]
        assert keeps == [min(d for d, _ in members)] and keeps == [c]
