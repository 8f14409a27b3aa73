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


# ---------------------------------------------------------------------------
# In-stream embedding (SRP/cosine) near-dedup — the third modality on the
# shared bucketed-store core
# ---------------------------------------------------------------------------


def _mk_emb_rows(spark, n_base=40, n_dup=8):
    """Base vectors from testdata plus planted exact re-posts (cosine 1)
    and small-angle jitters (cosine ≈ 0.995 ≥ 0.95, < 1)."""
    import numpy as np

    base = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .limit(n_base)
        .collect()
    )
    rows, vid = [], 0

    def add(vec):
        nonlocal vid
        rows.append((vid, [float(x) for x in vec], TS0 + pd.Timedelta(seconds=vid)))
        vid += 1

    for r in base:
        add(r.embedding)
    rng = np.random.default_rng(5)
    for r in base[:n_dup]:
        add(r.embedding)  # exact re-post
        v = np.asarray(r.embedding, dtype=np.float64)
        u = rng.standard_normal(v.size)
        u /= np.linalg.norm(u)
        add(v + 0.1 * np.linalg.norm(v) * u)  # cos ≈ 1/sqrt(1.01) ≈ 0.995
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "ts"])


def test_srp_stream_equals_batch_pairs(spark, tmp_path):
    """The streaming SRP near-dedup's survivor set equals what batch
    embedding_dup_pairs_lsh implies on the landed table (ts order ==
    vec_id order here), through a real 3-micro-batch stream."""
    from simplepolygon_spark.operators.dedup import embedding_dup_pairs_lsh
    from simplepolygon_spark.streaming.feed import start_srp_near_dedup

    pdf = _mk_emb_rows(spark)
    feed_dir = str(tmp_path / "efeed")
    for sl in (slice(0, 30), slice(30, 48), slice(48, None)):
        spark.createDataFrame(pdf[sl]).coalesce(1).write.mode("append").parquet(
            feed_dir
        )
    st = (
        spark.readStream.schema("vec_id long, embedding array<double>, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    out_dir = str(tmp_path / "eout")
    keepers_dir = str(tmp_path / "ekeepers")
    q = start_srp_near_dedup(
        st,
        out_dir,
        str(tmp_path / "estate"),
        str(tmp_path / "eckpt"),
        dim=64,
        threshold=0.95,
        keepers_dir=keepers_dir,
    )
    q.awaitTermination(240)
    got = {r.vec_id for r in spark.read.parquet(out_dir).select("vec_id").collect()}

    landed = spark.createDataFrame(pdf)
    pairs = embedding_dup_pairs_lsh(landed, threshold=0.95).collect()
    suppressed = {p.vec_b for p in pairs}
    expect = set(pdf.vec_id) - suppressed
    assert got == expect
    # the scenario must exercise non-exact (cos<1) suppression in-stream
    assert any(p.cosine < 1.0 for p in pairs), "no near (non-equal) pair planted"
    assert len(suppressed) >= 8
    # keeper table: one keeper per cluster, min-id, consistent with pairs
    keep = {
        (r.doc_id, r.cluster_id, r.keep)
        for r in spark.read.parquet(keepers_dir).collect()
    }
    assert keep, "keeper table empty despite planted duplicates"
    for did, cid, k in keep:
        assert k == (did == cid)  # min-id winner convention


def test_srp_batch_replay_and_dim_guard(spark, tmp_path):
    """Replaying one (batch, batch_id) leaves output and state
    unchanged; a store written under dim=64 refuses dim=32; the
    signature kernel rejects vectors that contradict the declared
    dimension in-task."""
    import pytest as _pytest

    from simplepolygon_spark.streaming.feed import (
        _with_srp_sigs,
        srp_dedup_batch,
    )

    pdf = _mk_emb_rows(spark, n_base=12, n_dup=3)
    sigs = _with_srp_sigs(spark.createDataFrame(pdf), dim=64)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    srp_dedup_batch(sigs, 0, out, state, threshold=0.95, dim=64)
    first = sorted(r.vec_id for r in spark.read.parquet(out).collect())
    assert len(first) < len(pdf)  # something was suppressed
    srp_dedup_batch(sigs, 0, out, state, threshold=0.95, dim=64)  # replay
    again = sorted(r.vec_id for r in spark.read.parquet(out).collect())
    assert first == again
    # one row per vector in the payload side table
    assert spark.read.parquet(state + "/docs").count() == len(pdf)
    # store-meta dim pin: resuming with another declared dim fails loudly
    with _pytest.raises(ValueError, match="written with config"):
        srp_dedup_batch(sigs, 1, out, state, threshold=0.95, dim=32)
    # in-task dimension guard: declared dim must match the data
    bad = _with_srp_sigs(spark.createDataFrame(pdf), dim=32)
    with _pytest.raises(Exception, match="declared"):
        bad.collect()


def test_srp_store_scan_bounded_by_touched_buckets(spark, tmp_path):
    """Behavioral pruning proof for the SRP store, same scheme as the
    MinHash one: corrupt every sig-store bucket the next batch does NOT
    touch — the pruned cross-batch read must survive and stay exact."""
    from simplepolygon_spark.operators.dedup import (
        srp_band_key_array,
        srp_bands_for_threshold,
    )
    from simplepolygon_spark.streaming.feed import (
        _with_srp_sigs,
        srp_dedup_batch,
    )

    pdf = _mk_emb_rows(spark, n_base=20, n_dup=0)
    mk = lambda frame: _with_srp_sigs(spark.createDataFrame(frame), dim=64)
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    srp_dedup_batch(mk(pdf), 0, out, state, threshold=0.95, dim=64)

    # batch 1: re-post of row 0 (must be suppressed cross-batch) plus a
    # fresh vector
    rows1 = pdf.iloc[[0]].copy()
    rows1["vec_id"] = [1000]
    rows1["ts"] = [TS0 + pd.Timedelta(seconds=1000)]
    import numpy as np

    # a fresh random direction: cosine vs anything in batch 0 is
    # O(1/sqrt(64)) — nowhere near the 0.95 threshold
    rv = np.random.default_rng(99).standard_normal(64)
    fresh = pd.DataFrame(
        [(1001, [float(x) for x in rv], TS0 + pd.Timedelta(seconds=1001))],
        columns=["vec_id", "embedding", "ts"],
    )
    frame1 = pd.concat([rows1, fresh])

    bands = srp_bands_for_threshold(64, 0.95)
    touched = {
        r.b
        for r in mk(frame1)
        .select(F.explode(srp_band_key_array("sig", 64, bands)).alias("h"))
        .select(F.pmod("h", F.lit(64)).alias("b"))
        .distinct()
        .collect()
    }
    assert len(touched) < 64, "batch touches every bucket — proof vacuous"
    n = _corrupt_buckets(state + "/sigs", "_bkt", touched)
    assert n > 0, "nothing corrupted — proof vacuous"

    srp_dedup_batch(mk(frame1), 1, out, state, threshold=0.95, dim=64)
    got = {r.vec_id for r in spark.read.parquet(out).collect()}
    assert 1000 not in got  # cross-batch suppression through pruned store
    assert 1001 in got


# ---------------------------------------------------------------------------
# In-stream token-budget admission (stream twin of token_budget_sample)
# ---------------------------------------------------------------------------


def _tb_sequential_ref(batches, budgets, default_budget=0):
    """The admission rule applied batch-by-batch in pure python:
    arrival order across batches, (md5(id), id) within one; the first
    overflowing doc closes its domain.  Returns {doc_id: cum_tokens}."""
    import hashlib

    cum, closed, out = {}, set(), {}
    for rows in batches:
        ordered = sorted(
            rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
        )
        for doc_id, lang, text in ordered:
            if lang in closed:
                continue
            n = len(text.split()) if text and text.strip() else 0
            b = budgets.get(lang, default_budget)
            c = cum.get(lang, 0) + n
            if c <= b:
                cum[lang] = c
                out[doc_id] = c
            else:
                closed.add(lang)
    return out


def test_token_budget_stream_matches_sequential_rule(spark, tmp_path):
    """Multi-batch admission equals the sequential reference, and a
    doc that would FIT a domain's remaining budget is still excluded
    once the domain has closed (first-overflow-closes contract)."""
    from simplepolygon_spark.streaming.feed import start_token_budget_admission

    budgets = {"a": 10, "b": 5}
    # batch 1: a fills to 8 of 10, b to 3 of 5, c unbudgeted (dropped)
    b1 = [(0, "a", "w w w w"), (1, "a", "w w w w"), (2, "b", "w w w"), (3, "c", "w")]
    # batch 2: a overflows (8+5 > 10) -> a CLOSES at 8
    b2 = [(4, "a", "w w w w w"), (5, "b", "w w")]
    # batch 3: one token would fit a's remaining 2 -- but a is closed
    b3 = [(6, "a", "w"), (7, "b", "w")]
    feed_dir = str(tmp_path / "tbfeed")
    for rows in (b1, b2, b3):
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
        ).coalesce(1).write.mode("append").parquet(feed_dir)

    st = (
        spark.readStream.schema("doc_id long, lang string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    out_dir = str(tmp_path / "tbout")
    q = start_token_budget_admission(
        st, out_dir, str(tmp_path / "tbstate"), str(tmp_path / "tbckpt"), budgets
    )
    q.awaitTermination(180)

    got = {
        r.doc_id: r.cum_tokens
        for r in spark.read.parquet(out_dir)
        .select("doc_id", "cum_tokens")
        .collect()
    }
    expect = _tb_sequential_ref([b1, b2, b3], budgets)
    assert got == expect
    # scenario really exercises the closed-domain rule: doc 6 fits the
    # remaining budget (8+1 <= 10) yet is excluded, doc 5 admitted (b=5)
    assert 6 not in got and expect.get(0) is not None
    assert got.get(5) == 5 and 7 not in got  # b closed by doc 7? no: 5+1>5
    assert 3 not in got  # unbudgeted domain drops


def test_token_budget_stream_single_batch_equals_batch_operator(spark, tmp_path):
    """A single-micro-batch stream is bit-for-bit the batch operator
    (same (md5(id), id) order, same token counts, same budgets)."""
    from simplepolygon_spark.operators.sampling import token_budget_sample
    from simplepolygon_spark.streaming.feed import start_token_budget_admission

    rows = [
        (i, ["a", "b", "c"][i % 3], "tok " * ((i * 7) % 11 + 1))
        for i in range(60)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    feed_dir = str(tmp_path / "t1feed")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(feed_dir)
    budgets = {"a": 50, "b": 35, "c": 9999}

    st = spark.readStream.schema("doc_id long, lang string, text string").parquet(
        feed_dir
    )
    out_dir = str(tmp_path / "t1out")
    q = start_token_budget_admission(
        st, out_dir, str(tmp_path / "t1state"), str(tmp_path / "t1ckpt"), budgets
    )
    q.awaitTermination(120)

    got = {
        (r.doc_id, r.cum_tokens)
        for r in spark.read.parquet(out_dir).select("doc_id", "cum_tokens").collect()
    }
    exp = {
        (r.doc_id, r.cum_tokens)
        for r in token_budget_sample(spark.createDataFrame(pdf), budgets).collect()
    }
    assert got == exp and len(got) > 0


def test_token_budget_batch_replay_and_meta_guard(spark, tmp_path):
    """Replaying the latest (batch, batch_id) leaves output and state
    unchanged; resuming the store under different budgets fails loudly."""
    from simplepolygon_spark.streaming.feed import token_budget_admit_batch

    out_dir = str(tmp_path / "rout")
    state_dir = str(tmp_path / "rstate")
    b1 = spark.createDataFrame(
        [(0, "a", "w w w"), (1, "b", "w w")], "doc_id long, lang string, text string"
    )
    b2 = spark.createDataFrame(
        [(2, "a", "w w"), (3, "b", "w w w w")], "doc_id long, lang string, text string"
    )
    budgets = {"a": 5, "b": 3}
    token_budget_admit_batch(b1, 0, out_dir, state_dir, budgets)
    token_budget_admit_batch(b2, 1, out_dir, state_dir, budgets)

    def snapshot():
        out = sorted(
            (r.doc_id, r.cum_tokens)
            for r in spark.read.parquet(out_dir).collect()
        )
        st = sorted(
            (r.domain, r.cum_tokens, r.closed, r.batch_seq)
            for r in spark.read.parquet(os.path.join(state_dir, "totals")).collect()
        )
        return out, st

    first = snapshot()
    token_budget_admit_batch(b2, 1, out_dir, state_dir, budgets)  # replay
    assert snapshot() == first
    out, st = first
    assert (0, 3) in out and (1, 2) in out  # batch 1: both fit
    assert (2, 5) in out  # a: 3+2 = 5 <= 5
    assert 3 not in {o[0] for o in out}  # b: 2+4 > 3 overflows, excluded
    assert ("b", 2, True, 1) in st  # ...and the state row records it closed
    with pytest.raises(ValueError, match="different config|written with config"):
        token_budget_admit_batch(b2, 2, out_dir, state_dir, {"a": 99})


def test_token_budget_state_compaction_preserves_admission(spark, tmp_path):
    """Folding the totals table to latest-per-domain changes neither the
    store's row count direction (it shrinks) nor any later admission
    decision (compacted vs uncompacted twin stores admit identically)."""
    from simplepolygon_spark.streaming.feed import (
        compact_token_budget_state,
        token_budget_admit_batch,
    )

    budgets = {"a": 12, "b": 6}
    batches = [
        [(0, "a", "w w w"), (1, "b", "w w")],
        [(2, "a", "w w w w"), (3, "b", "w w w")],
        [(4, "a", "w w"), (5, "b", "w")],
    ]
    dirs = {}
    for tag in ("c", "u"):
        out_dir = str(tmp_path / f"{tag}out")
        state_dir = str(tmp_path / f"{tag}state")
        dirs[tag] = (out_dir, state_dir)
        for bid, rows in enumerate(batches):
            df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
            token_budget_admit_batch(df, bid, out_dir, state_dir, budgets)

    c_out, c_state = dirs["c"]
    totals = os.path.join(c_state, "totals")
    before = spark.read.parquet(totals).count()
    compact_token_budget_state(spark, c_state, keep_last=1)
    after_df = spark.read.parquet(totals)
    assert after_df.count() < before
    assert "__compacted" in {r._stream_batch for r in after_df.select("_stream_batch").distinct().collect()}

    # batch 4 admits identically on both stores
    b4 = [(6, "a", "w w w"), (7, "b", "w")]
    for tag in ("c", "u"):
        out_dir, state_dir = dirs[tag]
        df = spark.createDataFrame(b4, "doc_id long, lang string, text string")
        token_budget_admit_batch(df, 3, out_dir, state_dir, budgets)
    read = lambda o: sorted(
        (r.doc_id, r.cum_tokens) for r in spark.read.parquet(o).collect()
    )
    assert read(dirs["c"][0]) == read(dirs["u"][0])
