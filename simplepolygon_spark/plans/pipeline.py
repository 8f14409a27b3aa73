"""The flagship spatial-join + tiling pipeline (SURVEY.md §3.4).

  images ──┬─ with_part_id ─ resume-filter ─ pip_join (broadcast index,
           │                                 mapInArrow, NO shuffle)
           │                                   │
           └────────── skew-aware per-ring aggregation (salted) ──┐
                                               │                  │
                        write data + lineage (exact resume)       │
                                                         ring stats

Skew: the generator's hot cell concentrates ~10% of images onto a few
rings.  A plain ``groupBy(ring)`` on the assignments would hash all hot
rows to one reducer.  ``salted_ring_stats`` aggregates in two phases —
partial per (ring, salt), final per ring — bounding any single
reducer's input to ~1/S of the hot key, on top of Spark's own map-side
partial aggregation and AQE skew handling (both also on).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.tiling import pip_join
from .lineage import remaining, with_part_id, write_with_lineage


def salted_ring_stats(assignments: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """(polygon_id, ring_index) → n_images, distinct-ish image spread.

    Two-phase salted aggregation: the salt column splits a hot ring key
    across ``salt_buckets`` reducers in phase 1; phase 2 combines the
    tiny per-salt partials.  All JVM-side column ops.
    """
    salted = assignments.withColumn(
        "salt", F.pmod(F.xxhash64("image_id"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("polygon_id", "ring_index", "salt").agg(
        F.count(F.lit(1)).alias("c"),
        F.bit_xor(F.xxhash64("image_id")).alias("hsum"),
    )
    return partial.groupBy("polygon_id", "ring_index").agg(
        F.sum("c").alias("n_images"),
        F.bit_xor("hsum").alias("image_hash_xor"),
    )


def run_pipeline(
    spark: SparkSession,
    images: DataFrame,
    index_bc,
    out_dir: str,
    run_id: str | None = None,
    num_parts: int = 64,
    fail_after_parts: int | None = None,
) -> DataFrame:
    """Resumable flagship run; returns the assignments DataFrame of the
    parts processed in *this* invocation.

    ``run_id`` defaults to a fresh uuid per invocation — the lineage
    commit-point argument (orphan data files from a crashed run stay
    invisible because their (part_id, run_id) never gets a lineage row)
    silently REQUIRES per-invocation-unique ids: resuming a crashed run
    under its old id would append a second copy into the same data
    partition and then commit both.  ``write_with_lineage`` additionally
    rejects a run_id that already appears in the lineage log.

    ``fail_after_parts`` (tests only) truncates the run to the first K
    remaining logical partitions — simulating executor/job loss so the
    kill/resume test can assert exact-resume equality.
    """
    if run_id is None:
        run_id = uuid.uuid4().hex[:12]
    imgs = with_part_id(images, "image_id", num_parts)
    todo = remaining(imgs, spark, out_dir)
    # one scan collects the todo part-id list; passing the raw
    # todo.select() into write_with_lineage would re-execute the whole
    # input pipeline a second time just to enumerate ids
    todo_ids = sorted(
        r.part_id for r in todo.select("part_id").distinct().collect()
    )
    if fail_after_parts is not None:
        todo_ids = todo_ids[:fail_after_parts]
        todo = todo.filter(F.col("part_id").isin(todo_ids))

    # part_id is a pure function of image_id — recompute on the output
    # instead of joining it back (saves a full shuffle join)
    asg = with_part_id(pip_join(todo, index_bc), "image_id", num_parts)
    write_with_lineage(asg, out_dir, run_id, todo_ids)
    return asg
