"""Sampling + curriculum operators for training-data pipelines.

  stratified_sample — EXACT n-per-stratum deterministic sample: rank
      rows inside each stratum by a portable hash order (md5 of the id,
      so the DuckDB oracle reproduces it bit-for-bit) and keep the
      first n.  One shuffle on the stratum key; a giant stratum is a
      skew risk, so the scale variant below trades exactness for a
      single scan.
  approx_stratified — Spark's sampleBy (per-stratum Bernoulli): no
      window, no skew, not exact — the 100 TB default when "about 1%
      per language" is the actual requirement.
  pack_sequences    — greedy sequence packing: assign docs (in a
      deterministic order) to fixed-token-budget bins by running token
      cumsum; the bin id and intra-bin offset are pure window
      arithmetic.  The classic "fill 8k-token context windows" step.
  decontaminate     — drop training docs whose normalized fingerprint
      appears in a benchmark set (left_anti on the fingerprint) — the
      train/test-overlap removal step; the benchmark side is tiny and
      broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint_col


def stratified_sample(
    df: DataFrame, strata_col: str, n_per_stratum: int, id_col: str = "doc_id"
) -> DataFrame:
    """Exact, deterministic n-per-stratum sample (md5-order ranking)."""
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(order, id_col)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n_per_stratum)
        .drop("rn")
    )


def approx_stratified(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 13
) -> DataFrame:
    """Per-stratum Bernoulli sample — single scan, no shuffle, not
    exact; the skew-immune scale path."""
    return df.sampleBy(strata_col, fractions, seed)


def pack_sequences(
    docs: DataFrame, window_tokens: int = 1024, id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_tokens, bin_id, bin_offset): greedy contiguous packing of
    whitespace token counts into ``window_tokens``-sized bins, docs
    taken in ``id_col`` order.

    bin_id = floor(exclusive-prefix-sum / window): a doc may straddle a
    boundary (real packers split or pad there; the assignment contract
    is the deterministic part worth verifying).  Single global window —
    the 100 TB form partitions first (e.g. by shard) and packs within
    partitions, same expression over Window.partitionBy."""
    n_tok = F.size(F.split(F.trim("text"), "\\s+"))
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        docs.select(id_col, n_tok.alias("n_tokens"))
        .withColumn("bin_id", (prefix / window_tokens).cast("long"))
        .withColumn("bin_offset", (prefix % window_tokens).cast("long"))
    )


def decontaminate(
    train: DataFrame, benchmark: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Training rows whose normalized text fingerprint does NOT occur
    in the benchmark set (exact-overlap decontamination).  The
    fingerprint is computed IN the train scan (a column, not a join —
    joining the corpus back to itself would shuffle 100 TB); the
    benchmark fingerprint dim is broadcast and the anti-join is
    therefore shuffle-free on the fact side."""
    train_fp = train.withColumn("fingerprint", fingerprint_col("text"))
    bench_fp = (
        benchmark.select(fingerprint_col("text").alias("fingerprint")).distinct()
    )
    return train_fp.join(
        F.broadcast(bench_fp), "fingerprint", "left_anti"
    ).drop("fingerprint")
