"""TF-IDF postings + inverted-index cosine top-k: normalization,
vocabulary pruning, determinism contracts."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from simplepolygon_spark.operators.tfidf import tfidf_topk_similar, tfidf_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_weights_unit_norm_and_idf(spark):
    d = _docs(
        spark,
        [(1, "a a b"), (2, "a c"), (3, "b b b"), (4, None), (5, "   ")],
    )
    w = tfidf_weights(d).collect()
    # tokenless docs (NULL, whitespace-only) emit no postings
    assert {r.doc_id for r in w} == {1, 2, 3}
    by_doc = {}
    for r in w:
        by_doc.setdefault(r.doc_id, {})[r.term] = r.w
    for doc, terms in by_doc.items():
        assert math.isclose(sum(v * v for v in terms.values()), 1.0, rel_tol=1e-12)
    # idf ordering: rarer term ('c', df=1) outweighs commoner ('a', df=2)
    # at equal tf — compare within doc 2 where both have tf=1
    assert by_doc[2]["c"] > by_doc[2]["a"]


def test_weights_known_values(spark):
    # one doc, two terms: tf ratio survives normalization exactly
    d = _docs(spark, [(1, "x x y")])
    w = {r.term: r.w for r in tfidf_weights(d).collect()}
    # same idf for both terms (df=1) -> weights proportional to tf 2:1
    assert math.isclose(w["x"] / w["y"], 2.0, rel_tol=1e-12)


def test_max_df_prunes_vocabulary_and_renormalizes(spark):
    # 'the' appears in all 3 docs; with max_df_frac=0.5 it leaves the
    # vocabulary and the remaining weights renormalize to unit norm
    d = _docs(spark, [(1, "the cat"), (2, "the dog"), (3, "the the")])
    w = tfidf_weights(d, max_df_frac=0.5).collect()
    assert all(r.term != "the" for r in w)
    assert {r.doc_id for r in w} == {1, 2}  # doc 3 had only 'the'
    for r in w:
        assert math.isclose(r.w, 1.0, rel_tol=1e-12)  # single-term docs


def test_topk_identical_docs_cosine_one(spark):
    d = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon")],
    )
    out = {(r.doc_a, r.doc_b): (r.cosine, r.rank) for r in
           tfidf_topk_similar(d, k=2).collect()}
    assert out[(1, 2)] == (1.0, 1) and out[(2, 1)] == (1.0, 1)
    # doc 3 shares no term with anyone -> absent entirely
    assert not any(3 in p for p in out)


def test_topk_rank_deterministic_tiebreak(spark):
    # docs 2 and 3 are the same text -> identical cosine to doc 1;
    # rank must break ties on doc_b ascending
    d = _docs(spark, [(1, "p q"), (2, "p r"), (3, "p r"), (4, "p s")])
    rows = [r for r in tfidf_topk_similar(d, k=3).collect() if r.doc_a == 1]
    rows.sort(key=lambda r: r.rank)
    tied = [r for r in rows if r.doc_b in (2, 3)]
    assert tied[0].doc_b == 2 and tied[1].doc_b == 3
    assert tied[0].cosine == tied[1].cosine
    assert [r.rank for r in rows] == [1, 2, 3]


def test_topk_matches_naive_dense(spark):
    # pseudo-random corpus vs a literal dense-vector computation
    import random

    rng = random.Random(7)
    vocab = ["t%d" % i for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 15))))
        for i in range(25)
    ]
    d = _docs(spark, rows)
    got = {(r.doc_a, r.doc_b) for r in tfidf_topk_similar(d, k=2).collect()}

    n = len(rows)
    tf = []
    for _, text in rows:
        m = {}
        for t in text.split():
            m[t] = m.get(t, 0) + 1
        tf.append(m)
    df = {}
    for m in tf:
        for t in m:
            df[t] = df.get(t, 0) + 1
    vecs = []
    for m in tf:
        v = {t: c * (math.log((1 + n) / (1 + df[t])) + 1) for t, c in m.items()}
        nrm = math.sqrt(sum(x * x for x in v.values()))
        vecs.append({t: x / nrm for t, x in v.items()})
    want = set()
    for i in range(n):
        sims = []
        for j in range(n):
            if i == j:
                continue
            c = sum(vecs[i][t] * vecs[j].get(t, 0.0) for t in vecs[i])
            if c > 0:
                sims.append((round(c, 6), -j))
        sims.sort(reverse=True)
        for c, nj in sims[:2]:
            want.add((i, -nj))
    assert got == want


def test_tfidf_weights_single_doc_exchange_plan(spark, tmp_path):
    """The corpus is tokenized and doc-shuffled ONCE: the df branch
    derives from the tf aggregate (r6), so the tokenize +
    repartition(doc_id) subtree appears under both branches of the
    plan but EXECUTES once — AQE stage reuse materializes the second
    occurrence as a ReusedExchange in the final plan.  The (doc, term)
    groupBy is subset-satisfied by that one exchange, the per-doc norm
    window's sort sits directly on the (partitioning-preserving)
    broadcast idf join, and the df branch's own exchange is
    term-keyed, vocabulary-scale.  Asserted on the FINAL adaptive plan
    (the frame is executed first): exactly one non-reused doc_id
    exchange."""
    _docs(
        spark,
        [(i, f"shared term{i % 3} body number {i}") for i in range(12)],
    ).write.parquet(str(tmp_path / "docs"))
    docs = spark.read.parquet(str(tmp_path / "docs"))
    w = tfidf_weights(docs)
    w.collect()  # finalize the adaptive plan
    plan = w._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final, plan
    # each ReusedExchange line repeats the reused exchange's
    # description — subtract them to count real doc_id exchanges
    real = final.count("hashpartitioning(doc_id") - final.count(
        "ReusedExchange"
    )
    assert real == 1, plan
    assert "BroadcastHashJoin" in final, plan
