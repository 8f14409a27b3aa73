import pytest
from simplepolygon_spark.session import register_tables


def test_register_tables_and_sql_surface(spark):
    done = register_tables(spark, "/root/testdata/sf0.001")
    assert "documents" in done and "events" in done
    # plain SQL over the views, incl. a ROLLUP — the engine's SQL half
    rows = spark.sql(
        "SELECT lang, count(*) AS n FROM documents GROUP BY ROLLUP (lang)"
    ).collect()
    total = [r.n for r in rows if r.lang is None]
    assert len(total) == 1 and total[0] == sum(r.n for r in rows if r.lang is not None)
    # cell_sql_expr composes with the views (same expression the DuckDB
    # oracle runs verbatim)
    from simplepolygon_spark.functions.cells_sql import cell_sql_expr

    register_tables(spark, "/root/testdata/sf0.001", ["part"])
    n = spark.sql(
        f"SELECT count(distinct {cell_sql_expr('p_retailprice/1000 - 90', 'p_retailprice/2000 - 45', 6)}) AS c FROM part"
    ).collect()[0].c
    assert n >= 1


def test_register_tables_skips_missing(spark, tmp_path):
    assert register_tables(spark, str(tmp_path)) == []
