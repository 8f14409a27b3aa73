"""redact_pii (typed-placeholder PII scrub + audit count) and
shuffle_shards (deterministic global corpus shuffle + shard export).

Both are per-row deterministic contracts: redaction must be exact on
planted PII, idempotent, and NULL-safe; shard/pos must be a pure
function of (seed, id) with contiguous 0-based positions per shard.
"""

import pytest
from pyspark.sql import functions as F

from simplepolygon_spark.operators.sampling import shuffle_shards
from simplepolygon_spark.operators.text import redact_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- redact_pii


def test_redact_planted_pii(spark):
    d = _docs(
        spark,
        [
            (1, "mail bob.smith+x@ex-ample.com today"),
            (2, "call +1-555-0042 now"),
            (3, "host 10.0.3.7 is up"),
            (4, "clean text with no pii"),
        ],
    )
    out = {r["doc_id"]: r for r in redact_pii(d).collect()}
    assert out[1]["text_redacted"] == "mail <EMAIL> today"
    assert out[2]["text_redacted"] == "call <PHONE> now"
    assert out[3]["text_redacted"] == "host <IP> is up"
    assert out[4]["text_redacted"] == "clean text with no pii"
    assert [out[i]["n_pii"] for i in (1, 2, 3, 4)] == [1, 1, 1, 0]


def test_redact_multiple_and_mixed(spark):
    d = _docs(spark, [(1, "a@b.co and c@d.io via 1.2.3.4 dial +44-123-4567")])
    r = redact_pii(d).collect()[0]
    assert r["text_redacted"] == "<EMAIL> and <EMAIL> via <IP> dial <PHONE>"
    assert r["n_pii"] == 4


def test_redact_idempotent(spark):
    d = _docs(spark, [(1, "u@v.org at 10.1.2.3 call +1-555-1111")])
    once = redact_pii(d).select("doc_id", F.col("text_redacted").alias("text"))
    twice = redact_pii(once).collect()[0]
    assert twice["text_redacted"] == "<EMAIL> at <IP> call <PHONE>"
    assert twice["n_pii"] == 0  # placeholders match nothing


def test_redact_null_text_passes_through(spark):
    r = redact_pii(_docs(spark, [(1, None)])).collect()[0]
    assert r["text_redacted"] is None
    assert r["n_pii"] == 0


def test_redact_numeric_host_falls_to_ip_rule(spark):
    # a dotted-quad host is NOT an email by the shipped rule (the TLD
    # must be alphabetic — Java and RE2 agree), so the IP rule redacts
    # the quad and the local part survives
    r = redact_pii(_docs(spark, [(1, "u@10.0.0.1 end")])).collect()[0]
    assert r["text_redacted"] == "u@<IP> end"
    assert r["n_pii"] == 1


def test_redact_column_clash_guard(spark):
    d = _docs(spark, [(1, "x")]).withColumn("n_pii", F.lit(0))
    with pytest.raises(ValueError, match="already has column"):
        redact_pii(d)


def test_redact_plan_has_no_shuffle(spark):
    d = _docs(spark, [(1, "x")])
    plan = redact_pii(d)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------ shuffle_shards


def _corpus(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )


def test_shuffle_deterministic_across_runs(spark):
    a = shuffle_shards(_corpus(spark), n_shards=8).orderBy("doc_id").collect()
    b = (
        shuffle_shards(_corpus(spark).repartition(7), n_shards=8)
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["shard"], r["pos"]) for r in a] == [(r["shard"], r["pos"]) for r in b]


def test_positions_contiguous_zero_based_per_shard(spark):
    out = shuffle_shards(_corpus(spark), n_shards=4)
    per = (
        out.groupBy("shard")
        .agg(F.min("pos").alias("lo"), F.max("pos").alias("hi"), F.count("*").alias("n"))
        .collect()
    )
    assert len(per) == 4  # 200 uniform docs hit all 4 shards
    for r in per:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_pos_follows_shuffle_key_order(spark):
    rows = shuffle_shards(_corpus(spark, 100), n_shards=2).collect()
    for s in (0, 1):
        ordered = sorted(
            [r for r in rows if r["shard"] == s],
            key=lambda r: (r["shuffle_key"], r["doc_id"]),
        )
        assert [r["pos"] for r in ordered] == list(range(len(ordered)))


def test_seed_changes_order(spark):
    a = shuffle_shards(_corpus(spark), seed="a").orderBy("doc_id").collect()
    b = shuffle_shards(_corpus(spark), seed="b").orderBy("doc_id").collect()
    assert [(r["shard"], r["pos"]) for r in a] != [(r["shard"], r["pos"]) for r in b]


def test_single_shard_is_total_order(spark):
    out = shuffle_shards(_corpus(spark, 50), n_shards=1)
    assert out.where(F.col("shard") != 0).count() == 0
    assert sorted(r["pos"] for r in out.collect()) == list(range(50))


def test_shuffle_guards(spark):
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(_corpus(spark), n_shards=0)
    with pytest.raises(ValueError, match="already has column"):
        shuffle_shards(_corpus(spark).withColumn("pos", F.lit(1)))


def test_shuffle_plan_single_exchange(spark):
    # one hash exchange on the shard key feeds the per-shard window
    # sort; no global single-partition sort anywhere
    plan = (
        shuffle_shards(_corpus(spark), n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan
