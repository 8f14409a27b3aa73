"""Structured Streaming path: feed dedup within watermark, windowed
stats, and streaming tile assignment equal to the batch join."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from simplepolygon_spark.operators.decompose import decompose_polygons
from simplepolygon_spark.operators.tiling import broadcast_index, build_interval_index
from simplepolygon_spark.sources.footprints import footprints_df
from simplepolygon_spark.sources.images import images_df
from simplepolygon_spark.streaming.feed import (
    dedupe_feed,
    read_image_feed,
    stream_tile_assign,
    windowed_feed_stats,
)


def _write_feed(spark, tmp_path, n=400):
    feed_dir = str(tmp_path / "feed")
    batch = images_df(spark, n, partitions=2, with_bytes=True)
    batch.write.mode("overwrite").parquet(feed_dir)
    # re-deliver the first half (duplicates) as a second file drop
    images_df(spark, n // 2, partitions=1, with_bytes=True).write.mode(
        "append"
    ).parquet(feed_dir)
    return feed_dir


def _run_stream(df, tmp_path, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_dedupe_feed(spark, tmp_path):
    feed_dir = _write_feed(spark, tmp_path)
    st = read_image_feed(spark, feed_dir)
    _run_stream(dedupe_feed(st).select("image_id"), tmp_path, "dedup")
    got = spark.sql("SELECT count(*) c, count(DISTINCT image_id) d FROM dedup").first()
    assert got.c == got.d == 400  # duplicates dropped


def test_windowed_stats(spark, tmp_path):
    feed_dir = _write_feed(spark, tmp_path)
    st = read_image_feed(spark, feed_dir)
    # append mode would hold the window open until the watermark passes
    # its end — with 0.4 s of event time that never happens, so read the
    # running aggregate with complete mode instead
    _run_stream(windowed_feed_stats(st, "1 minute"), tmp_path, "winstats", mode="complete")
    rows = spark.sql("SELECT * FROM winstats").collect()
    # 600 rows over 0.4s of event time → one window, 600 rows (dups counted)
    assert sum(r.n_images for r in rows) == 600
    assert all(r.n_bytes > 0 for r in rows)


def test_stream_tile_assign_matches_batch(spark, tmp_path):
    feed_dir = _write_feed(spark, tmp_path)
    rings = decompose_polygons(footprints_df(spark, grid=3))
    bc = broadcast_index(spark, build_interval_index(rings, cover_level=9))

    st = read_image_feed(spark, feed_dir, with_ts=False)
    _run_stream(stream_tile_assign(st, bc), tmp_path, "tiles")
    stream_rows = {
        (r.image_id, r.polygon_id, r.ring_index)
        for r in spark.sql("SELECT * FROM tiles").collect()
    }

    batch = spark.read.parquet(feed_dir)
    from simplepolygon_spark.operators.tiling import pip_join

    batch_rows = {
        (r.image_id, r.polygon_id, r.ring_index)
        for r in pip_join(batch, bc).collect()
    }
    assert stream_rows == batch_rows
    assert len(stream_rows) > 0


def test_dedupe_near_feed_suppresses_reposts(spark, tmp_path):
    """Token-identical re-posts (different doc_ids, cosmetic whitespace/
    case changes) collapse to one survivor per signature within the
    watermark; genuinely distinct texts all survive."""
    import pandas as pd

    from simplepolygon_spark.operators.dedup import simhash_of_texts
    from simplepolygon_spark.streaming.feed import dedupe_near_feed

    base = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
    ]
    rows = []
    ts0 = pd.Timestamp("2026-01-01 00:00:00")
    did = 0
    for i, t in enumerate(base):
        for variant in (t, t.upper(), "  " + t + "  "):  # same tokens
            rows.append((did, variant, ts0 + pd.Timedelta(seconds=did)))
            did += 1
    rows.append((did, "a completely different document body", ts0))
    feed_dir = str(tmp_path / "docfeed")
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    ).write.mode("overwrite").parquet(feed_dir)

    st = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(
        feed_dir
    )
    out = dedupe_near_feed(st, watermark="10 minutes")
    _run_stream(out, tmp_path, "near_dedup")
    got = spark.sql("SELECT * FROM near_dedup").collect()

    # one survivor per distinct signature == 4 (3 bases + 1 distinct)
    assert len(got) == 4
    assert len({r.simhash for r in got}) == 4
    # and the signatures match the batch kernel exactly
    expect = {int(s) for s in simhash_of_texts(base + ["a completely different document body"]).view("int64")}
    assert {r.simhash for r in got} == expect


def test_banded_near_dedup_stream_equals_batch_pairs(spark, tmp_path):
    """VERDICT r2 item 4: the streaming banded near-dedup's survivor set
    must be exactly what batch simhash_dup_pairs implies on the landed
    table — doc b survives iff no pair gives it an earlier partner."""
    import pandas as pd

    from simplepolygon_spark.operators.dedup import simhash_dup_pairs
    from simplepolygon_spark.streaming.feed import start_banded_near_dedup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(60)
        .collect()
    )
    ts0 = pd.Timestamp("2026-01-01 00:00:00")
    rows, did = [], 0

    def add(text):
        nonlocal did
        rows.append((did, text, ts0 + pd.Timedelta(seconds=did)))
        did += 1

    for r in docs:
        add(r.text)
    # exact re-posts (hamming 0) and light near-variants (small hamming)
    for r in docs[:10]:
        add(r.text)
        add(r.text.replace(" the ", " thee ", 1))
        add(r.text + " extra")
    feed_dir = str(tmp_path / "bfeed")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    # three file drops -> three micro-batches (maxFilesPerTrigger=1)
    for i, sl in enumerate((slice(0, 40), slice(40, 70), slice(70, None))):
        spark.createDataFrame(pdf[sl]).coalesce(1).write.mode("append").parquet(feed_dir)

    st = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    out_dir = str(tmp_path / "bout")
    q = start_banded_near_dedup(
        st, out_dir, str(tmp_path / "bstate"), str(tmp_path / "bckpt"), max_hamming=3
    )
    q.awaitTermination(180)
    got = {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()}

    landed = spark.createDataFrame(pdf)
    pairs = simhash_dup_pairs(landed, max_hamming=3).collect()
    suppressed = {p.doc_b for p in pairs}  # ts order == doc_id order here
    expect = set(pdf.doc_id) - suppressed
    assert got == expect
    # the scenario must actually exercise hamming>0 suppression in-stream
    assert any(0 < p.hamming <= 3 for p in pairs), "no near (non-equal) pair planted"
    assert len(suppressed) >= 10


def test_minhash_near_dedup_stream_equals_batch_pairs(spark, tmp_path):
    """VERDICT r3 item 3: the streaming MinHash near-dedup's survivor
    set must be exactly what batch minhash_dup_pairs implies on the
    landed table — doc b survives iff no pair gives it an earlier
    partner (ts order == doc_id order here)."""
    import pandas as pd

    from simplepolygon_spark.operators.dedup import minhash_dup_pairs
    from simplepolygon_spark.streaming.feed import start_minhash_near_dedup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .orderBy("doc_id")
        .limit(40)
        .collect()
    )
    ts0 = pd.Timestamp("2026-01-01 00:00:00")
    rows, did = [], 0

    def add(text):
        nonlocal did
        rows.append((did, text, ts0 + pd.Timedelta(seconds=did)))
        did += 1

    for r in docs:
        add(r.text)
    # exact re-posts (j=1) and near-variants (one-word edits: j≥0.9 on
    # these ~60-word docs)
    for r in docs[:8]:
        add(r.text)
        add(r.text.replace(" ", " x ", 1))
        add("  " + r.text)
    feed_dir = str(tmp_path / "mfeed")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    # three file drops -> three micro-batches (maxFilesPerTrigger=1)
    for sl in (slice(0, 30), slice(30, 50), slice(50, None)):
        spark.createDataFrame(pdf[sl]).coalesce(1).write.mode("append").parquet(
            feed_dir
        )

    st = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(feed_dir)
    )
    out_dir = str(tmp_path / "mout")
    q = start_minhash_near_dedup(
        st, out_dir, str(tmp_path / "mstate"), str(tmp_path / "mckpt"), threshold=0.8
    )
    q.awaitTermination(240)
    got = {r.doc_id for r in spark.read.parquet(out_dir).select("doc_id").collect()}

    landed = spark.createDataFrame(pdf)
    pairs = minhash_dup_pairs(landed, threshold=0.8).collect()
    suppressed = {p.doc_b for p in pairs}
    expect = set(pdf.doc_id) - suppressed
    assert got == expect
    # the scenario must exercise non-exact (j<1) suppression in-stream
    assert any(p.jaccard < 1.0 for p in pairs), "no near (non-equal) pair planted"
    assert len(suppressed) >= 16


def test_minhash_dedup_batch_replay_and_candidate_log(spark, tmp_path, capsys):
    """Replaying the same (batch, batch_id) leaves output and state
    unchanged; log_candidates reports the per-batch candidate count."""
    import pandas as pd

    from simplepolygon_spark.streaming.feed import (
        _with_minhash_sigs,
        minhash_dedup_batch,
    )

    ts0 = pd.Timestamp("2026-01-01")
    base = "a long enough document body to shingle meaningfully number"
    pdf = pd.DataFrame(
        [(i, f"{base} {i}", ts0 + pd.Timedelta(seconds=i)) for i in range(12)]
        + [(100, f"{base} 0", ts0 + pd.Timedelta(seconds=100))],
        columns=["doc_id", "text", "ts"],
    )
    sigs = _with_minhash_sigs(spark.createDataFrame(pdf))
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    minhash_dedup_batch(sigs, 0, out, state, threshold=0.95, log_candidates=True)
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert 100 not in first  # the re-post was suppressed
    assert "candidate pairs" in capsys.readouterr().out
    minhash_dedup_batch(sigs, 0, out, state, threshold=0.95)  # replay
    again = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == again
    # round-5 store layout: one row per doc in the text side table
    assert spark.read.parquet(state + "/docs").count() == 13


def test_decontaminate_feed_stream_equals_batch(spark, tmp_path):
    """Stream-side decontamination ≡ batch decontaminate on the landed
    table: benchmark-overlapping docs dropped as they arrive, NULL-text
    docs survive (the anti-join NULL contract)."""
    import pandas as pd

    from simplepolygon_spark.operators.sampling import decontaminate
    from simplepolygon_spark.streaming.feed import decontaminate_feed

    rows = [(i, f"training document number {i}") for i in range(12)]
    rows.append((100, None))  # NULL text must survive
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    feed_dir = str(tmp_path / "dfeed")
    spark.createDataFrame(pdf).write.parquet(feed_dir)
    bench = spark.createDataFrame(
        # match by NORMALIZED fingerprint: case/whitespace variants hit
        pd.DataFrame(
            [("  Training DOCUMENT number 4  ",), ("training document number 9",)],
            columns=["text"],
        )
    )
    st = spark.readStream.schema("doc_id long, text string").parquet(feed_dir)
    q = (
        decontaminate_feed(st, bench)
        .writeStream.format("memory")
        .queryName("decon_stream")
        .option("checkpointLocation", str(tmp_path / "dck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.sql("SELECT * FROM decon_stream").collect())
    landed = spark.createDataFrame(pdf)
    expect = sorted(r.doc_id for r in decontaminate(landed, bench).collect())
    assert got == expect
    assert 100 in got and 4 not in got and 9 not in got


def test_banded_dedup_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch replays a failed micro-batch: re-running the same
    (batch, batch_id) must leave output and state unchanged."""
    import pandas as pd

    from simplepolygon_spark.streaming.feed import (
        _with_simhash_bands,
        banded_dedup_batch,
    )

    ts0 = pd.Timestamp("2026-01-01")
    pdf = pd.DataFrame(
        [(i, f"document body number {i}", ts0 + pd.Timedelta(seconds=i)) for i in range(20)]
        + [(100, "document body number 0", ts0 + pd.Timedelta(seconds=100))],
        columns=["doc_id", "text", "ts"],
    )
    sigs = _with_simhash_bands(spark.createDataFrame(pdf))
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    banded_dedup_batch(sigs, 0, out, state, max_hamming=3)
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    banded_dedup_batch(sigs, 0, out, state, max_hamming=3)  # replay
    again = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert first == again
    # round-5 store layout: melted band rows — one row per (doc, band)
    st = spark.read.parquet(state + "/sigs")
    assert st.select("doc_id").distinct().count() == 21
    assert st.count() == 21 * 4


def test_banded_dedup_late_arrival_not_suppressed_by_later_doc(spark, tmp_path):
    """A doc that arrives late but carries an EARLIER (ts, doc_id) than
    a near-identical doc already in the store must NOT be suppressed —
    cross-batch suppression respects the landed-table order, not
    arrival order."""
    import pandas as pd

    from simplepolygon_spark.streaming.feed import (
        _with_simhash_bands,
        banded_dedup_batch,
    )

    ts0 = pd.Timestamp("2026-01-01")
    text = "an entirely ordinary document body for late arrival testing"
    # batch 0: the LATER doc (ts +60s) arrives first
    b0 = pd.DataFrame([(10, text, ts0 + pd.Timedelta(seconds=60))],
                      columns=["doc_id", "text", "ts"])
    # batch 1: the EARLIER doc arrives late
    b1 = pd.DataFrame([(3, text, ts0)], columns=["doc_id", "text", "ts"])
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    banded_dedup_batch(_with_simhash_bands(spark.createDataFrame(b0)), 0, out, state)
    banded_dedup_batch(_with_simhash_bands(spark.createDataFrame(b1)), 1, out, state)
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    # both emit: doc 3 is genuinely earlier (never suppressed); doc 10
    # was already emitted before doc 3 arrived (cannot be retracted)
    assert got == [3, 10]


def test_banded_dedup_new_stream_sees_old_streams_state(spark, tmp_path):
    """A NEW stream (fresh checkpoint → batch ids restart at 0) pointed
    at an existing state_dir/out_dir must treat the old stream's
    signatures as real prior state — not exclude them as "its own
    batch 0" nor overwrite the old stream's partitions (ADVICE r3 #2:
    the partition key carries the stream identity)."""
    import pandas as pd

    from simplepolygon_spark.streaming.feed import (
        _with_simhash_bands,
        banded_dedup_batch,
    )

    ts0 = pd.Timestamp("2026-01-01")
    text = "a document body shared verbatim across two logical streams"
    out, state = str(tmp_path / "o"), str(tmp_path / "s")
    # stream A, batch 0: the original doc
    a0 = pd.DataFrame([(1, text, ts0)], columns=["doc_id", "text", "ts"])
    banded_dedup_batch(
        _with_simhash_bands(spark.createDataFrame(a0)), 0, out, state, stream_id="aaaa"
    )
    # stream B (new checkpoint → ITS batch 0): a later re-post of the
    # same text — must be suppressed against stream A's stored signature
    b0 = pd.DataFrame(
        [(2, text, ts0 + pd.Timedelta(seconds=60))], columns=["doc_id", "text", "ts"]
    )
    banded_dedup_batch(
        _with_simhash_bands(spark.createDataFrame(b0)), 0, out, state, stream_id="bbbb"
    )
    got = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert got == [1], "old stream's output clobbered or its state skipped"
    # state keeps both streams' signatures under distinct partitions
    st = spark.read.parquet(state + "/sigs")
    assert sorted(
        r.doc_id for r in st.select("doc_id").distinct().collect()
    ) == [1, 2]
    assert st.select("_stream_batch").distinct().count() == 2


def test_stream_assign_with_lineage_exactly_once(spark, tmp_path):
    """Streaming S7: feed → PIP assign → lineage commit.  The committed
    result equals the batch pipeline on the same landed table; a
    replayed micro-batch no-ops; orphan data from a crashed attempt
    (data written, lineage not) stays invisible and the replay
    re-commits cleanly."""
    import uuid

    from simplepolygon_spark.operators.tiling import pip_join
    from simplepolygon_spark.plans.lineage import (
        DATA_SUBDIR,
        read_result,
        with_part_id,
    )
    from simplepolygon_spark.streaming.feed import (
        assign_with_lineage_batch,
        start_assign_with_lineage,
        stream_id_for,
    )

    feed_dir = str(tmp_path / "lfeed")
    images_df(spark, 300, partitions=2, with_bytes=False).write.mode(
        "overwrite"
    ).parquet(feed_dir)
    rings = decompose_polygons(footprints_df(spark, grid=3))
    bc = broadcast_index(spark, build_interval_index(rings, cover_level=9))
    out_dir = str(tmp_path / "lout")

    q = start_assign_with_lineage(
        read_image_feed(spark, feed_dir, with_ts=False),
        bc,
        out_dir,
        str(tmp_path / "lckpt"),
        num_parts=8,
    )
    q.awaitTermination(120)

    def committed():
        return {
            (r.image_id, r.polygon_id, r.ring_index)
            for r in read_result(spark, out_dir).collect()
        }

    expect = {
        (r.image_id, r.polygon_id, r.ring_index)
        for r in pip_join(spark.read.parquet(feed_dir), bc).collect()
    }
    assert committed() == expect and expect

    # replay of an already-committed micro-batch: exactly-once no-op
    batch0 = spark.read.parquet(feed_dir)
    sid = stream_id_for(str(tmp_path / "lckpt"))
    assign_with_lineage_batch(batch0, 0, bc, out_dir, num_parts=8, stream_id=sid)
    assert committed() == expect

    # crashed attempt of a NEW batch: data written under an attempt
    # run_id, no lineage row → invisible; the replay commits cleanly
    nb = images_df(spark, 350, partitions=1, with_bytes=False).where(
        F.col("image_id") >= "img000000300"
    )
    orphan = (
        with_part_id(pip_join(nb, bc), "image_id", 8)
        .withColumn("run_id", F.lit(f"b{sid}x{1:012d}-{uuid.uuid4().hex[:8]}"))
    )
    orphan.write.mode("append").partitionBy("part_id", "run_id").parquet(
        os.path.join(out_dir, DATA_SUBDIR)
    )
    assert committed() == expect  # orphans never surface
    assign_with_lineage_batch(nb, 1, bc, out_dir, num_parts=8, stream_id=sid)
    expect2 = expect | {
        (r.image_id, r.polygon_id, r.ring_index) for r in pip_join(nb, bc).collect()
    }
    assert committed() == expect2
    # and a replay of batch 1 after the successful commit: no-op again
    assign_with_lineage_batch(nb, 1, bc, out_dir, num_parts=8, stream_id=sid)
    assert committed() == expect2
