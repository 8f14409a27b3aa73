"""leakage_safe_split: near-duplicates never straddle a split boundary.

The split key is the near-dup CLUSTER id, so the one failure mode of
the per-doc hash split — a near-dup pair landing on opposite sides of
the train/eval boundary — is impossible by construction.  Assignment is
md5(seed:cluster_id) vs fixed hex thresholds (split_hex_threshold), so
expected outputs are recomputable bit-for-bit with hashlib here and by
the DuckDB oracle in __spark_entry__.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from simplepolygon_spark.operators.sampling import (
    leakage_safe_split,
    split_hex_threshold,
)

T_TRAIN = split_hex_threshold(0.9)


def _expected_split(cluster_id: int, seed: str = "split") -> str:
    h = hashlib.md5(f"{seed}:{cluster_id}".encode()).hexdigest()
    return "train" if h < T_TRAIN else "eval"


def _docs(spark, n=50):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def _pairs(spark, pairs):
    if not pairs:
        return spark.createDataFrame([], "doc_a long, doc_b long")
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_no_cluster_straddles_splits(spark):
    # chains and a triangle: clusters {0,1,2}, {5,6}, {10,11,12,13}
    out = leakage_safe_split(
        _docs(spark),
        _pairs(spark, [(0, 1), (1, 2), (5, 6), (10, 11), (11, 12), (12, 13)]),
    )
    straddlers = (
        out.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0


def test_assignment_matches_hashlib_exactly(spark):
    rows = leakage_safe_split(
        _docs(spark), _pairs(spark, [(0, 1), (5, 6)])
    ).collect()
    assert len(rows) == 50
    for r in rows:
        assert r.split == _expected_split(r.cluster_id), (
            r.doc_id,
            r.cluster_id,
            r.split,
        )
    # cluster keying: pair members share the min id, singletons their own
    by_id = {r.doc_id: r for r in rows}
    assert by_id[0].cluster_id == by_id[1].cluster_id == 0
    assert by_id[5].cluster_id == by_id[6].cluster_id == 5
    assert by_id[7].cluster_id == 7


def test_prevents_doc_hash_leakage(spark):
    # find a doc pair whose PER-DOC hashes land on opposite sides of the
    # 0.9 threshold — the naive per-doc split would separate them
    a = next(i for i in range(10_000) if _expected_split(i) == "train")
    b = next(i for i in range(10_000) if _expected_split(i) == "eval")
    docs = spark.createDataFrame([(a,), (b,)], "doc_id long")
    out = {
        r.doc_id: r
        for r in leakage_safe_split(docs, _pairs(spark, [(a, b)])).collect()
    }
    # premise holds (doc-level hashes disagree) ...
    assert _expected_split(a) != _expected_split(b)
    # ... yet as near-dups they share one cluster and ONE split
    assert out[a].cluster_id == out[b].cluster_id == min(a, b)
    assert out[a].split == out[b].split == _expected_split(min(a, b))


def test_all_singletons_fractions_near_weights(spark):
    out = leakage_safe_split(_docs(spark, 2000), _pairs(spark, []))
    n_train = out.where(F.col("split") == "train").count()
    # md5-uniform 90% of 2000 singleton clusters; generous 3-sigma band
    assert 1740 <= n_train <= 1860, n_train


def test_three_way_weights_and_determinism(spark):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = leakage_safe_split(_docs(spark), _pairs(spark, [(3, 4)]), weights=w)
    b = leakage_safe_split(_docs(spark), _pairs(spark, [(3, 4)]), weights=w)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert set(r.split for r in a.collect()) <= {"train", "val", "test"}


def test_validation_errors(spark):
    docs = _docs(spark)
    pairs = _pairs(spark, [])
    with pytest.raises(ValueError, match="sum"):
        leakage_safe_split(docs, pairs, weights={"train": 0.5, "eval": 0.1})
    with pytest.raises(ValueError, match="at least two"):
        leakage_safe_split(docs, pairs, weights={"train": 1.0})
    with pytest.raises(ValueError, match="already has column"):
        leakage_safe_split(docs.withColumn("split", F.lit("x")), pairs)
    with pytest.raises(ValueError, match="frac"):
        split_hex_threshold(1.0)
