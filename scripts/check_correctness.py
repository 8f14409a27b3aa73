"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry AND its oracle_sql() on the same
parquet tables, compare row count, schema width, and exact values
(columns sorted by name, rows sorted canonically).

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df):
    """pandas -> sorted list of value tuples with columns name-sorted."""
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False):
        t = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                t.append(None)
            elif hasattr(v, "item"):
                t.append(v.item())
            else:
                t.append(v)
        out.append(tuple(t))
    out.sort(key=lambda r: tuple((x is not None, str(type(x)), str(x)) for x in r))
    return cols, out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as E
    from simplepolygon_spark.session import get_spark

    only = set(sys.argv[2:])
    spark = get_spark("correctness-check", parallelism=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:28s} rows={len(sdf):7d}  NO_ORACLE")
            continue
        odf = con.execute(oracles[name]).df()
        sc, sv = canon(sdf)
        oc, ov = canon(odf)
        ok_rows = len(sv) == len(ov)
        ok_cols = sc == oc
        ok_vals = sv == ov
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            n_fail += 1
        print(
            f"{name:28s} rows={len(sv):7d}/{len(ov):7d} "
            f"cols={'=' if ok_cols else f'{sc}!={oc}'} vals={'=' if ok_vals else 'DIFF'}  {status}"
        )
        if not ok_vals and ok_rows and ok_cols:
            for a, b in zip(sv, ov):
                if a != b:
                    print(f"   first diff:\n   spark  {a}\n   oracle {b}")
                    break
        elif not ok_rows:
            so, oo = set(sv), set(ov)
            print(f"   spark-only: {list(so - oo)[:3]}")
            print(f"   oracle-only: {list(oo - so)[:3]}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
