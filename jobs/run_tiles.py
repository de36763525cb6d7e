"""Tile-assignment job — the STR leaf-assignment relation elevated to a
first-class output (SURVEY.md section 2.7; north_star "raster<->vector
tile assignment").

    spark-submit --py-files engine.zip jobs/run_tiles.py \
        --input <docs> --mode cover|primary|rasterize|pyramid \
        --output /data/out/tiles --manifest /data/out/manifest

Output: (cell, doc_id) — primary (exactly-one-tile, centroid rule,
mirroring the reference's one-leaf-per-rect property) or cover
(raster<->vector multi-cover) — partitioned by coarse cell.
``--mode rasterize`` writes the fixed-point coverage band
(cell, coverage_units); ``--mode pyramid`` the full zoom stack
(level, cell, coverage_units), both partitioned the same way.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs._common import base_parser, build_session, coarse_cell_col, finish, load_rects
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.tiles import (
    cover_tiles,
    primary_tiles,
    rasterize,
    rasterize_pyramid,
)


def main() -> None:
    p = base_parser("raster<->vector tile assignment")
    p.add_argument("--input", required=True)
    p.add_argument(
        "--mode",
        choices=["primary", "cover", "rasterize", "pyramid"],
        default="cover",
    )
    args = p.parse_args()

    spark = build_session("rtree-spark-tiles", args)
    grid = Grid(args.grid_level, args.extent)
    data = load_rects(spark, args.input, args.format)
    op = {
        "primary": primary_tiles,
        "cover": cover_tiles,
        "rasterize": rasterize,
        "pyramid": rasterize_pyramid,
    }[args.mode]
    tiles = op(data, grid)
    out = tiles.withColumn("part", coarse_cell_col(grid, args.coarse_level, F.col("cell")))
    finish(out, args, stage=f"tiles_{args.mode}")
    spark.stop()


if __name__ == "__main__":
    main()
