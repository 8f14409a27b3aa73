"""chunk_documents: sliding context-window chunking.

Chunk i covers tokens [i*stride, i*stride + max_tokens), stride =
max_tokens - overlap; the last chunk is the first whose window reaches
the end of the doc.  Every token lands in >=1 chunk, consecutive chunks
share exactly `overlap` tokens, and the whole thing is reconstructible.
"""

import pytest
from pyspark.sql import functions as F

from simplepolygon_spark.operators.text import chunk_documents


def _doc(spark, text, doc_id=1):
    return spark.createDataFrame([(doc_id, text)], "doc_id long, text string")


def test_hand_computed_windows(spark):
    # 10 tokens, max_tokens=4, overlap=1 (stride 3):
    # nc = floor((10-4+2)/3)+1 = 3 -> windows [0:4), [3:7), [6:10)
    toks = [f"t{i}" for i in range(10)]
    rows = chunk_documents(
        _doc(spark, " ".join(toks)), max_tokens=4, overlap=1
    ).orderBy("chunk_index").collect()
    got = [(r.chunk_index, r.chunk_text, r.n_tokens) for r in rows]
    assert got == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t3 t4 t5 t6", 4),
        (2, "t6 t7 t8 t9", 4),
    ]


def test_short_doc_single_chunk_and_exact_boundary(spark):
    rows = chunk_documents(
        _doc(spark, "a b c"), max_tokens=8, overlap=2
    ).collect()
    assert [(r.chunk_index, r.chunk_text, r.n_tokens) for r in rows] == [
        (0, "a b c", 3)
    ]
    # exactly max_tokens -> still one chunk (n <= max_tokens branch)
    rows = chunk_documents(
        _doc(spark, "a b c d"), max_tokens=4, overlap=1
    ).collect()
    assert len(rows) == 1 and rows[0].n_tokens == 4


def test_null_and_whitespace_only_produce_no_chunks(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "x y")], "doc_id long, text string"
    )
    rows = chunk_documents(df, max_tokens=4, overlap=1).collect()
    assert {r.doc_id for r in rows} == {3}


def test_reconstruction_and_overlap_property(spark):
    """Dropping the first `overlap` tokens of every chunk after the
    first reconstructs the original token stream exactly."""
    toks = [f"w{i}" for i in range(137)]
    rows = (
        chunk_documents(_doc(spark, " ".join(toks)), max_tokens=16, overlap=4)
        .orderBy("chunk_index")
        .collect()
    )
    rebuilt = rows[0].chunk_text.split(" ")
    for r in rows[1:]:
        rebuilt += r.chunk_text.split(" ")[4:]
    assert rebuilt == toks
    # every chunk except possibly the last is full-width
    assert all(r.n_tokens == 16 for r in rows[:-1])
    assert 0 < rows[-1].n_tokens <= 16


def test_plan_has_no_exchange(spark):
    df = _doc(spark, "a b c d e f g h")
    plan = (
        chunk_documents(df, max_tokens=4, overlap=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_validation(spark):
    df = _doc(spark, "a b")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, max_tokens=4, overlap=-1)
