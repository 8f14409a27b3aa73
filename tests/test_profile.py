"""profile_corpus: one-pass corpus health report."""

from pyspark.sql import functions as F

from simplepolygon_spark.operators.corpus import profile_corpus


def test_profile_planted_edge_cases(spark):
    rows = [
        (1, "en", "same text"),
        (2, "en", "same text"),      # exact dup of 1
        (3, "de", None),             # NULL text
        (4, "de", "   "),            # whitespace-only = empty after trim
        (5, "fr", "unique words"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    r = profile_corpus(d).collect()[0]
    assert r.n_docs == 5
    assert r.null_text == 1
    assert r.empty_text == 1
    assert r.dup_docs == 1           # 4 non-null texts, 3 distinct
    assert r.n_langs == 3
    assert r.min_chars == 3          # the "   " row
    assert r.max_chars == 12         # "unique words"
    assert r.total_chars == 9 + 9 + 3 + 12


def test_profile_agrees_with_exact_dup_groups(spark):
    from simplepolygon_spark.operators.dedup import exact_dup_groups

    d = spark.createDataFrame(
        [(i, "en", f"t{i % 7}") for i in range(30)],
        "doc_id long, lang string, text string",
    )
    prof = profile_corpus(d).collect()[0]
    groups = exact_dup_groups(d)
    extra = (
        groups.agg(F.sum(F.col("n_docs") - 1).alias("x")).collect()[0].x
    )
    assert prof.dup_docs == extra == 23


def test_profile_approx_mode(spark):
    """approx=True: dup_docs/n_langs become HLL estimates within the
    sketch tolerance; every other column stays exact; and the plan
    loses the distinct-count Expand stage (the sketch partials are
    constant-size — the hourly-over-100TB shape)."""
    from simplepolygon_spark.operators.corpus import profile_corpus

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = profile_corpus(docs).collect()[0]
    appr = profile_corpus(docs, approx=True).collect()[0]
    for col in ("n_docs", "null_text", "empty_text", "min_chars",
                "max_chars", "total_chars"):
        assert getattr(appr, col) == getattr(exact, col)
    # HLL++ rsd default 5%: dup_docs = n - distinct, so compare the
    # distinct estimates underneath
    ex_d = exact.n_docs - exact.null_text - exact.dup_docs
    ap_d = appr.n_docs - appr.null_text - appr.dup_docs
    assert abs(ap_d - ex_d) <= 0.1 * ex_d
    assert abs(appr.n_langs - exact.n_langs) <= max(1, 0.1 * exact.n_langs)
    plan = (
        profile_corpus(docs, approx=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in plan
    exact_plan = (
        profile_corpus(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan  # the cost approx mode removes


def test_snapshot_diff_statuses_and_null_safety(spark):
    """All four statuses from a hand-built pair, including the NULL
    edges: NULL→NULL unchanged, NULL→text and text→NULL changed, and a
    present-with-NULL-text row never reads as absent."""
    from simplepolygon_spark.operators.corpus import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d"), (5, None), (6, "f")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (3, None), (5, "now"), (6, None), (7, "new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",  # NULL -> NULL
        4: "removed",
        5: "changed",  # NULL -> text
        6: "changed",  # text -> NULL
        7: "added",
    }


def test_snapshot_diff_colocated_on_bucketed_snapshots(spark, tmp_path):
    """SCALE.md's co-location claim, proven: two snapshots written
    bucketed by doc_id diff with NO Exchange anywhere in the plan (the
    full-outer SortMergeJoin reads co-located bucket files), and the
    result matches the unbucketed diff."""
    from simplepolygon_spark.operators.corpus import snapshot_diff
    from simplepolygon_spark.plans.bucketing import write_bucketed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    old = docs.select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 5 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.expr("text || ' v2'"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    write_bucketed(
        old, "snap_old", ["doc_id"], 8, path=str(tmp_path / "old")
    )
    write_bucketed(
        new, "snap_new", ["doc_id"], 8, path=str(tmp_path / "new")
    )
    try:
        d = snapshot_diff(spark.table("snap_old"), spark.table("snap_new"))
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        got = {r.doc_id: r.status for r in d.collect()}
        want = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
        assert got == want
        assert "removed" in got.values() and "changed" in got.values()
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_old")
        spark.sql("DROP TABLE IF EXISTS snap_new")
