#!/usr/bin/env python
"""Second scaling workload (VERDICT r4 #5): a SHUFFLE-BOUND job under
the exact round-4 hardened protocol.

The compute-bound flagship (scaling_bench.py: fused decode+PSNR+PIP)
measures 0.92 efficiency — but at 100 TB the dedup suite is
shuffle-shaped, and its scaling was asserted, not measured.  This
harness runs ``minhash_dup_pairs`` over a high-duplication corpus
derived deterministically from the sf0.1 documents table (each doc
replicated SCALE_REPLICAS× with a short per-replica suffix → every
replica group is a near-dup clique), so the job exercises every
shuffle in the dedup path: the melted (band, band_hash) bucket
self-join, candidate distinct, and — because EVERY doc is
pair-involved on this corpus, the verify stage's worst case — the
full-corpus shingle-array joins.  Same paired-interleaved /
min-of-reps / spread-discard / steal-disclosure protocol, same
append-only raw log (BENCH/scaling_runs_shuffle.jsonl), and the
result — whatever it is — is disclosed in BENCH/BASELINE.md next to
the compute-bound number: a shared-memory-bus sandbox host is expected
to scale shuffle work worse than a real 4N-executor cluster that
multiplies memory channels and NICs, and hiding that would be worse
than measuring it.

The per-run table lands in BENCH/BASELINE.md between SHUFFLE-SECTION
markers (scaling_bench.py owns the rest of the file).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import REPO, Level, one_run  # noqa: E402

CHILD_SHUFFLE = r"""
import json, os, sys, time
cpus = int(sys.argv[1]); replicas = int(sys.argv[2])
from pyspark.sql import functions as F
from simplepolygon_spark.session import get_spark
from simplepolygon_spark.operators.dedup import minhash_dup_pairs

spark = get_spark(f"scale-shuffle-{cpus}", parallelism=cpus)
spark.sparkContext.setLogLevel("ERROR")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
reps = spark.range(replicas).select(F.col("id").cast("int").alias("rep"))
# deterministic high-duplication corpus: replica 0 is the original,
# replicas 1..R-1 append a short suffix (j ~ 0.94 on these docs) —
# every replica group is a near-dup clique, so the verify stage sees
# its worst case (all docs pair-involved)
corpus = (
    docs.crossJoin(reps)
    .select(
        (F.col("doc_id") * replicas + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" replicamark"), F.col("rep")))
        .alias("text"),
    )
    .repartition(96)
    .persist()
)
n_docs = corpus.count()

def job():
    n = minhash_dup_pairs(corpus, threshold=0.8).count()
    assert n > 0, n
    return n

expect = job()  # warm-up; also pins the expected pair count
print("READY", flush=True)
for line in sys.stdin:
    if line.strip() == "go":
        t0 = time.perf_counter()
        n = job()
        assert n == expect, (n, expect)
        print(json.dumps({"t": time.perf_counter() - t0}), flush=True)
    else:
        break
spark.stop()
"""

BEGIN = "<!-- SHUFFLE-SECTION BEGIN -->"
END = "<!-- SHUFFLE-SECTION END -->"


def main() -> None:
    replicas = int(os.environ.get("SCALE_REPLICAS", "10"))
    n_pairs = int(os.environ.get("SCALE_PAIRS", "6"))
    n_reps = int(os.environ.get("SCALE_REPS", "3"))
    n_runs = int(os.environ.get("SCALE_RUNS", "3"))
    spread_bound = float(os.environ.get("SCALE_SPREAD_BOUND", "0.25"))
    n_lo = int(os.environ.get("SCALE_N", "3"))
    n_hi = 4 * n_lo

    lo = Level(n_lo, replicas, child_src=CHILD_SHUFFLE)
    hi = Level(n_hi, replicas, child_src=CHILD_SHUFFLE)
    runs = []
    try:
        jsonl = os.path.join(REPO, "BENCH", "scaling_runs_shuffle.jsonl")
        os.makedirs(os.path.dirname(jsonl), exist_ok=True)
        for r in range(n_runs):
            print(f"shuffle run {r + 1}/{n_runs}:")
            runs.append(one_run(lo, hi, n_pairs, n_reps, spread_bound))
            runs[-1]["replicas"] = replicas
            with open(jsonl, "a") as jf:
                jf.write(json.dumps(runs[-1]) + "\n")
            summary = {
                k: runs[-1][k]
                for k in (
                    "efficiency_median_paired",
                    "efficiency_min_based",
                    "n_discarded",
                    "steal_sec_during_run",
                )
            }
            print(f"shuffle run {r + 1} summary: {json.dumps(summary)}")
    finally:
        lo.stop()
        hi.stop()

    complete = [r for r in runs if r["n_clean"] == n_pairs]
    worst = (
        min(
            min(r["efficiency_median_paired"], r["efficiency_min_based"])
            for r in complete
        )
        if complete
        else 0.0
    )
    print(
        json.dumps(
            {
                "workload": "minhash_dup_pairs-shuffle",
                "replicas": replicas,
                "runs_complete": len(complete),
                "efficiency_worst": worst,
            }
        )
    )

    run_rows = "\n".join(
        f"| {i + 1} | {r['efficiency_median_paired']} | {r['efficiency_min_based']} "
        f"| {r['n_clean']}/{n_pairs} | {r['n_discarded']} "
        f"| {r['steal_sec_during_run']} | {r['median3']} | {r['median12']} |"
        for i, r in enumerate(runs)
    )
    section = f"""{BEGIN}
## Scaling: shuffle-bound dedup workload (round 5)

Same hardened protocol as the compute-bound table above (paired
interleaved, min of {n_reps} repeats per level per pair, pairs with
within-level spread > {spread_bound:.0%} discarded and disclosed,
{n_runs} consecutive runs, /proc/stat steal sampled per run) plus ONE
disclosed knob: an untimed warm rep per level at the start of each
pair (timeit-style), because a first session — aborted, raw log
preserved at `BENCH/scaling_shuffle_attempt1.log` — showed a
reproducible ~25-30% hi-level FIRST-rep penalty after idling through
the lo level's longer runs (monotone t12_reps, near-zero t3 spread)
that the spread filter kept discarding as "steal".  Applied
to the SHUFFLE-SHAPED job the 100 TB dedup suite actually runs:
`minhash_dup_pairs(threshold=0.8)` over the sf0.1 documents table
replicated {replicas}x with per-replica suffixes ({replicas * 5000:,}
docs; every replica group a near-dup clique, so the bucket self-join,
candidate distinct, AND the verify stage's full-corpus shingle joins
all exercise their shuffles).  `local[{n_lo}]` vs `local[{n_hi}]`.

| run | eff (median-paired) | eff (min-based) | clean pairs | discarded | steal sec | local[{n_lo}] median s | local[{n_hi}] median s |
|---|---|---|---|---|---|---|---|
{run_rows}

**Shuffle-workload scaling efficiency = {worst}** (worst run's worst
estimator over runs with a full clean-pair quota).  Disclosed next to
the compute-bound 0.92 deliberately: on ONE shared-memory-bus host the
shuffle path contends for the same bus, localhost Arrow IPC, and
shuffle-file IO that a real 4N-executor cluster multiplies per
executor — this number is the sandbox floor for shuffle-shaped work,
not the cluster expectation, and reporting it honestly beats asserting
it away (raw per-pair data incl. discards:
`BENCH/scaling_runs_shuffle.jsonl`).
{END}"""

    # The BASELINE.md shuffle section is hand-curated since it carries
    # a TWO-workload size sweep (25k + 50k docs) whose older jsonl rows
    # lack the replicas field — an automatic rewrite from one
    # invocation would silently drop the other size's disclosed runs.
    # New runs land in the jsonl above; fold them into the section by
    # hand (or pass SCALE_REWRITE_SECTION=1 to restore the old
    # single-table behavior knowingly).
    if os.environ.get("SCALE_REWRITE_SECTION") != "1":
        print("jsonl updated; BASELINE.md shuffle section left as-is "
              "(hand-curated two-workload sweep — see comment)")
        return
    baseline = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(baseline) as f:
        text = f.read()
    if BEGIN in text:
        if END not in text:
            # a half-written marker pair must not silently truncate the
            # rest of BASELINE.md below BEGIN
            raise RuntimeError(
                "BENCH/BASELINE.md has the SHUFFLE-SECTION BEGIN marker "
                "but no END marker — repair the file before rewriting"
            )
        pre = text.split(BEGIN)[0]
        post = text.split(END, 1)[1]
        text = pre + section + post
    else:
        marker = "## Reference comparison"
        if marker in text:
            text = text.replace(marker, section + "\n\n" + marker, 1)
        else:
            text = text + "\n" + section + "\n"
    with open(baseline, "w") as f:
        f.write(text)
    print("updated BENCH/BASELINE.md shuffle section")


if __name__ == "__main__":
    main()
