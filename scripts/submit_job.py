#!/usr/bin/env python
"""spark-submit entry point for the flagship pipeline.

Usage:
  zip -r /tmp/sp.zip simplepolygon_spark
  spark-submit --master <master> --py-files /tmp/sp.zip \
      scripts/submit_job.py <out_dir> [n_images] [grid] [num_parts]

Runs the resumable spatial-join pipeline (decompose → broadcast interval
index → PIP join → lineage write) and prints a one-line JSON summary.
Re-running with the same out_dir resumes from the lineage log.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_dir = sys.argv[1]
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    grid = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    num_parts = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    # master=None: spark-submit --master controls deployment while the
    # engine's plan-shaping defaults (AQE, Arrow batching) still apply
    from simplepolygon_spark.session import get_spark

    spark = get_spark("simplepolygon-pipeline", master=None)

    from simplepolygon_spark.operators.decompose import decompose_polygons
    from simplepolygon_spark.operators.tiling import (
        broadcast_index,
        build_interval_index,
    )
    from simplepolygon_spark.plans.lineage import done_part_ids, read_result
    from simplepolygon_spark.plans.pipeline import run_pipeline
    from simplepolygon_spark.sources.footprints import footprints_df
    from simplepolygon_spark.sources.images import images_df

    rings = decompose_polygons(footprints_df(spark, grid=grid))
    index = build_interval_index(rings, cover_level=10)
    bc = broadcast_index(spark, index)
    imgs = images_df(spark, n_images, with_bytes=False)
    # run_id stays the default fresh uuid: a FIXED id would break the
    # documented resume flow — write_with_lineage rejects an id already
    # committed to the lineage log, so the second run would raise
    run_pipeline(spark, imgs, bc, out_dir, num_parts=num_parts)

    print(
        json.dumps(
            {
                "done_parts": len(done_part_ids(spark, out_dir)),
                "assignments": read_result(spark, out_dir).count(),
                "index_stats": index.stats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
