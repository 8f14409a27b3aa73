"""In-stream corpus health profile (profile_batch / read_stream_profile):
incremental twin of corpus.profile_corpus, exact on the landed union —
including the duplicate-text count across micro-batch boundaries.
"""

import pandas as pd
import pytest

from simplepolygon_spark.operators.corpus import profile_corpus
from simplepolygon_spark.streaming.feed import (
    profile_batch,
    read_stream_profile,
    start_profile_stream,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]),
    ).selectExpr("CAST(doc_id AS LONG) doc_id", "text", "lang")


B1 = [
    (0, "alpha beta", "en"),
    (1, "gamma", "en"),
    (2, None, "de"),
    (3, "  ", "de"),
    (4, "alpha beta", "fr"),  # dup within batch 1
]
B2 = [
    (5, "alpha beta", "en"),  # dup ACROSS batches — the hard case
    (6, "delta epsilon zeta", "es"),
    (7, "gamma", "es"),  # dup across batches
    (8, None, "en"),
]
B3 = [
    (9, "eta", "en"),
    (10, "delta epsilon zeta", "pt"),  # dup vs batch 2
]


def _expected(spark, *batches):
    rows = [r for b in batches for r in b]
    return profile_corpus(_docs(spark, rows)).collect()[0]


def test_stream_profile_equals_batch_across_batches(spark, tmp_path):
    state = str(tmp_path / "state")
    for bid, b in enumerate((B1, B2, B3)):
        profile_batch(_docs(spark, b), bid, state, n_buckets=8)
        got = read_stream_profile(spark, state).collect()[0]
        exp = _expected(spark, *(B1, B2, B3)[: bid + 1])
        assert got.asDict() == exp.asDict(), f"after batch {bid}"


def test_stream_profile_replay_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    profile_batch(_docs(spark, B1), 0, state, n_buckets=8)
    profile_batch(_docs(spark, B2), 1, state, n_buckets=8)
    before = read_stream_profile(spark, state).collect()[0]
    # replay the last batch (post-crash foreachBatch redelivery)
    profile_batch(_docs(spark, B2), 1, state, n_buckets=8)
    after = read_stream_profile(spark, state).collect()[0]
    assert after.asDict() == before.asDict()


def test_stream_profile_bucketing_change_fails_loudly(spark, tmp_path):
    state = str(tmp_path / "state")
    profile_batch(_docs(spark, B1), 0, state, n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets|meta|store"):
        profile_batch(_docs(spark, B2), 1, state, n_buckets=16)


def test_stream_profile_real_stream(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    _docs(spark, B1 + B2).coalesce(1).write.parquet(feed_dir)
    st = spark.readStream.schema("doc_id long, text string, lang string").parquet(
        feed_dir
    )
    state = str(tmp_path / "state")
    q = start_profile_stream(
        st, state, str(tmp_path / "ckpt"), n_buckets=8
    )
    q.awaitTermination(120)
    got = read_stream_profile(spark, state).collect()[0]
    exp = _expected(spark, B1, B2)
    assert got.asDict() == exp.asDict()


# --- streaming mix report --------------------------------------------------

from simplepolygon_spark.operators.corpus import mix_report
from simplepolygon_spark.streaming.feed import (
    mix_report_batch,
    read_stream_mix,
)


def _mdocs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"]),
    ).selectExpr("CAST(doc_id AS LONG) doc_id", "text", "lang", "source")


M1 = [
    (0, "aa", "en", "web"),
    (1, "bbbb", "en", "book"),
    (2, "c", None, "web"),  # REAL NULL dim — must stay apart from subtotals
    (3, None, "de", "web"),
]
M2 = [
    (4, "dd", "en", "web"),
    (5, "ee", None, "web"),
    (6, "ffffff", "fr", "book"),
]


def _mix_set(df):
    return {
        (r.lang, r.source, r.level, r.n_docs, r.total_chars)
        for r in df.collect()
    }


def test_stream_mix_equals_batch_and_replays(spark, tmp_path):
    state = str(tmp_path / "mixstate")
    mix_report_batch(_mdocs(spark, M1), 0, state)
    assert _mix_set(read_stream_mix(spark, state)) == _mix_set(
        mix_report(_mdocs(spark, M1))
    )
    mix_report_batch(_mdocs(spark, M2), 1, state)
    want = _mix_set(mix_report(_mdocs(spark, M1 + M2)))
    assert _mix_set(read_stream_mix(spark, state)) == want
    # replay the last batch — unchanged
    mix_report_batch(_mdocs(spark, M2), 1, state)
    assert _mix_set(read_stream_mix(spark, state)) == want


def test_stream_mix_dims_change_fails_loudly(spark, tmp_path):
    state = str(tmp_path / "mixstate")
    mix_report_batch(_mdocs(spark, M1), 0, state)
    with pytest.raises(ValueError, match="dims|meta|store"):
        mix_report_batch(_mdocs(spark, M2), 1, state, dims=("lang",))
