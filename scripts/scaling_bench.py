#!/usr/bin/env python
"""Two-parallelism scaling benchmark → BENCH/BASELINE.md.

Sandbox stand-in for N vs 4N executors (per driver instruction): the
same spatial-join job runs at local[8] and local[32] on the same input;
throughput (images/sec through the full join path) is measured as the
median of 5 runs after 1 warm-up, and scaling efficiency
(T_4N / T_N) / 4 is reported against the ≥0.8 gate
(BASELINE.json:2,14).

Each level runs in its own subprocess so the JVM is sized to the level
(a shared JVM would let the 8-core run borrow the 32-core pools).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
cpus = int(sys.argv[1]); n_images = int(sys.argv[2])
from simplepolygon_spark.session import get_spark
from simplepolygon_spark.operators.decompose import decompose_polygons
from simplepolygon_spark.operators.tiling import broadcast_index, build_interval_index, pip_join
from simplepolygon_spark.plans.pipeline import salted_ring_stats
from simplepolygon_spark.sources.footprints import footprints_df
from simplepolygon_spark.sources.images import images_df

spark = get_spark(f"scale-{cpus}", parallelism=cpus)
spark.sparkContext.setLogLevel("ERROR")
rings = decompose_polygons(footprints_df(spark, grid=8))
bc = broadcast_index(spark, build_interval_index(rings, cover_level=10))
imgs = images_df(spark, n_images, partitions=256, with_bytes=False).persist()
imgs.count()

def job():
    return salted_ring_stats(pip_join(imgs, bc)).count()

job()  # warm-up
times = []
for _ in range(5):
    t0 = time.perf_counter()
    job()
    times.append(time.perf_counter() - t0)
print(json.dumps({"cpus": cpus, "times": times}))
spark.stop()
"""


def run_level(cpus: int, n_images: int) -> dict:
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), str(n_images)],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith('{"cpus"'):
            return json.loads(line)
    raise RuntimeError(f"child failed: {out.stderr[-2000:]}")


def main() -> None:
    n_images = int(os.environ.get("SCALE_IMAGES", "6000000"))
    levels = {}
    for cpus in (4, 16):
        r = run_level(cpus, n_images)
        med = statistics.median(r["times"])
        levels[cpus] = {
            "median_sec": round(med, 3),
            "images_per_sec": round(n_images / med, 1),
            "times": [round(t, 3) for t in r["times"]],
        }
        print(f"local[{cpus}]: {levels[cpus]}")

    eff = (levels[16]["images_per_sec"] / levels[4]["images_per_sec"]) / 4.0
    result = {"images": n_images, "levels": levels, "efficiency": round(eff, 3)}
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured engine numbers

## Scaling: same job, same input, two parallelism levels

Sandbox stand-in for N → 4N executors (no multi-node cluster available;
per driver instruction): `local[4]` vs `local[16]` (N and 4N cores; chosen so JVM + Python-worker
threads of the 4N level fit the 32-CPU host without oversubscription —
a real 4N-executor cluster is not oversubscribed either), flagship spatial
join (decompose → broadcast interval index → PIP join → salted ring
stats) over {n_images:,} generated images, median of 5 runs after 1
warm-up; identical 256-partition input layout at both levels.

| level | median sec | images/sec |
|---|---|---|
| local[4]  (N)  | {levels[4]['median_sec']} | {levels[4]['images_per_sec']:,} |
| local[16] (4N) | {levels[16]['median_sec']} | {levels[16]['images_per_sec']:,} |

**Scaling efficiency (T_4N / T_N) / 4 = {result['efficiency']}**
(gate: ≥ 0.8, BASELINE.json:2,14)

raw: `{json.dumps(result)}`

## Reference comparison

The reference (simplepolygon v2.0.4) publishes no benchmark numbers
(vitest bench harness only, no committed results — BASELINE.md top
section).  Single-polygon decomposition parity and throughput are
covered by the fixture suite and `bench.py` (`BENCH_r*.json`).
"""
        )


if __name__ == "__main__":
    main()
