#!/usr/bin/env python
"""Per-query isolation bench + plan capture (optimization guide §1) —
NOT the driver contract; bench.py stays the measured surface.

Times individual declared queries with the same methodology as
bench.py (build + .count(), N repeats, min + spread), optionally
captures .explain("formatted") to plans/r06/<query>_<tag>.txt, and can
time with the noop sink (full-row materialization) instead of count.

Usage:
  python bench_extra.py q1 q2 ...            # time those queries
  python bench_extra.py --all                # every declared query
  --sf-dir D      data dir (default $SPARK_GRAFT_SF_DIR or sf0.1)
  --repeats N     default 3
  --explain TAG   write plans/r06/<name>_<TAG>.txt (no timing)
  --noop          time with noop sink instead of .count()
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from simplepolygon_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench_extra", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    Q = entrymod.queries()
    names = list(Q) if args.all else args.queries
    unknown = [n for n in names if n not in Q]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown} (have: {sorted(Q)})")

    if args.explain:
        os.makedirs("plans/r06", exist_ok=True)
        for name in names:
            df = Q[name](spark, args.sf_dir)
            path = f"plans/r06/{name}_{args.explain}.txt"
            with open(path, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                ))
            print(f"wrote {path}")
        spark.stop()
        return

    timings, spreads, samples_all = {}, {}, {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        samples = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            df = Q[name](spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 3)
        spreads[name] = round(max(samples) / min(samples) - 1.0, 3)
        samples_all[name] = [round(s, 3) for s in samples]
        print(json.dumps({"query": name, "min": timings[name],
                          "spread": spreads[name], "samples": samples_all[name]}))
    print(json.dumps({"sf_dir": args.sf_dir, "mode": "noop" if args.noop else "count",
                      "queries": timings, "spread": spreads}))
    spark.stop()


if __name__ == "__main__":
    main()
