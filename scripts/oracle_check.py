#!/usr/bin/env python
"""Local replica of the driver's Spark-vs-DuckDB oracle compare.

For each named query: run Q[name](spark, sf_dir) -> pandas, run
oracle_sql()[name] in DuckDB over the same parquet tables -> pandas,
and report rows_match (count), values_match (sorted row-by-row, NaN-
aware), and dtype_match (pandas dtype per column — a proxy for the
driver's hash sensitivity to result TYPES, the round-5 failure mode).

Usage: python scripts/oracle_check.py [--sf-dir D] q1 q2 ... | --all
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(df):
    import pandas as pd

    # stable row order independent of engine ordering
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    args = ap.parse_args()

    import duckdb

    from simplepolygon_spark.session import TABLES, get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    Q = entrymod.queries()
    O = entrymod.oracle_sql()
    names = [n for n in Q if n in O] if args.all else args.queries

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    failed = []
    for name in names:
        try:
            sp = canon(Q[name](spark, args.sf_dir).toPandas())
            du = canon(con.execute(O[name]).df())
            rows = len(sp) == len(du)
            dtypes_sp = [str(t) for t in sp.dtypes]
            dtypes_du = [str(t) for t in du.dtypes]
            dtype_ok = dtypes_sp == dtypes_du
            vals = rows and list(sp.columns) == list(du.columns)
            if vals:
                for c in sp.columns:
                    a, b = sp[c].to_numpy(), du[c].to_numpy()
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        af = a.astype(float)
                        bf = b.astype(float)
                        same = (af == bf) | (np.isnan(af) & np.isnan(bf))
                        ok = bool(same.all())
                    else:
                        ok = bool((a == b).all())
                    if not ok:
                        vals = False
                        break
            status = "OK" if (rows and vals and dtype_ok) else "FAIL"
            if status == "FAIL":
                failed.append(name)
            print(
                f"{status} {name}: rows={len(sp)}/{len(du)} values={vals} "
                f"dtypes={dtype_ok}"
                + ("" if dtype_ok else f" sp={dtypes_sp} du={dtypes_du}")
            )
        except Exception as e:  # pragma: no cover - diagnostic tool
            failed.append(name)
            print(f"ERR  {name}: {type(e).__name__}: {e}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
