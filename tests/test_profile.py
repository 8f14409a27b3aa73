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
