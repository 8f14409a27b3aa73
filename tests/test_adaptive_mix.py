"""adaptive_length_filter (per-group percentile length gate) and
mix_report (single-pass ROLLUP mixture report)."""

import pytest
from pyspark.sql import functions as F

from simplepolygon_spark.operators.corpus import mix_report
from simplepolygon_spark.operators.text import adaptive_length_filter


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_adaptive_filter_drops_shortest_decile(spark):
    # token counts 1..10 in one lang; exact 0.1 percentile of [1..10]
    # is 1.9 (a+(b-a)*frac), so only the 1-token doc falls below it
    rows = [(i, "en", " ".join(["w"] * i)) for i in range(1, 11)]
    kept = adaptive_length_filter(_docs(spark, rows), frac=0.1).collect()
    assert sorted(r["doc_id"] for r in kept) == list(range(2, 11))
    assert all(abs(r["length_floor"] - 1.9) < 1e-12 for r in kept)


def test_adaptive_filter_per_group_floors_independent(spark):
    rows = [(i, "en", " ".join(["w"] * i)) for i in range(1, 11)] + [
        (100 + i, "de", " ".join(["w"] * (10 * i))) for i in range(1, 11)
    ]
    kept = adaptive_length_filter(_docs(spark, rows), frac=0.1)
    floors = {r["lang"]: r["length_floor"] for r in kept.collect()}
    assert abs(floors["en"] - 1.9) < 1e-12
    assert abs(floors["de"] - 19.0) < 1e-12  # 0.1 pct of [10,20..100]


def test_adaptive_filter_null_text_dropped(spark):
    rows = [(1, "en", "a b c"), (2, "en", None), (3, "en", "a b")]
    kept = adaptive_length_filter(_docs(spark, rows), frac=0.0).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 3]


def test_adaptive_filter_guards(spark):
    d = _docs(spark, [(1, "en", "x")])
    with pytest.raises(ValueError, match="frac"):
        adaptive_length_filter(d, frac=1.0)
    with pytest.raises(ValueError, match="already has column"):
        adaptive_length_filter(d.withColumn("n_tokens", F.lit(1)))


def test_adaptive_filter_corpus_side_broadcast(spark):
    d = _docs(spark, [(i, "en", "a b c") for i in range(20)])
    plan = (
        adaptive_length_filter(d)._jdf.queryExecution().executedPlan().toString()
    )
    # the per-group floors broadcast back; the corpus side must never
    # hash-shuffle for the join (the only exchange feeds the tiny agg)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" not in plan


def test_mix_report_levels_and_totals(spark):
    rows = [
        (1, "en", "aa"),     # 2 chars
        (2, "en", "bbbb"),   # 4
        (3, "de", "cc"),     # 2
    ]
    d = _docs(spark, rows).withColumn("source", F.lit("s0"))
    out = {
        (r["lang"], r["source"], r["level"]): (r["n_docs"], r["total_chars"])
        for r in mix_report(d).collect()
    }
    assert out[("en", "s0", 0)] == (2, 6)
    assert out[("de", "s0", 0)] == (1, 2)
    assert out[("en", None, 1)] == (2, 6)    # per-lang subtotal
    assert out[("de", None, 1)] == (1, 2)
    assert out[(None, None, 3)] == (3, 8)    # grand total
    assert len(out) == 5  # 2 leaves + 2 lang subtotals + 1 grand


def test_mix_report_level_disambiguates_real_nulls(spark):
    # a REAL NULL source leaf must not be confused with the per-lang
    # subtotal row — only the grouping bitmask separates them
    rows = [(1, "en", "aa"), (2, "en", "bbbb")]
    d = _docs(spark, rows).withColumn(
        "source", F.when(F.col("doc_id") == 1, F.lit("s0"))
    )
    out = {
        (r["lang"], r["source"], r["level"]): r["n_docs"]
        for r in mix_report(d).collect()
    }
    assert out[("en", None, 0)] == 1  # the real-NULL-source leaf
    assert out[("en", None, 1)] == 2  # the subtotal over both


def test_mix_report_row_count_is_grouping_sets_sum(spark):
    d = _docs(
        spark, [(i, ["en", "de"][i % 2], "x") for i in range(8)]
    ).withColumn("source", F.concat(F.lit("s"), (F.col("doc_id") % 2).cast("string")))
    # leaves: en only pairs with s1? doc_id%2 drives both → 2 leaves
    rows = mix_report(d).collect()
    leaves = [r for r in rows if r["lang"] is not None and r["source"] is not None]
    langs = [r for r in rows if r["lang"] is not None and r["source"] is None]
    grand = [r for r in rows if r["lang"] is None and r["source"] is None]
    assert len(rows) == len(leaves) + len(langs) + len(grand)
    assert len(grand) == 1 and grand[0]["n_docs"] == 8


def test_mix_report_missing_dim_guard(spark):
    with pytest.raises(ValueError, match="no column"):
        mix_report(_docs(spark, [(1, "en", "x")]), dims=("lang", "nope"))
