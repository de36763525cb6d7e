"""Range-query job — reference `-r data.txt queries.txt`
(src/Main.cpp:150-156, 191-209) as a cluster job.

    spark-submit --py-files engine.zip jobs/run_range.py \
        --input <docs> --queries <queries_parquet> \
        --output /data/out/range --manifest /data/out/manifest

Queries table: (query_id, min_x, min_y, max_x, max_y).  Output:
(query_id, doc_id) partitioned by the query centroid's coarse cell.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs._common import base_parser, build_session, coarse_cell_col, finish, load_query_rects, load_rects
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.range_query import range_query


def main() -> None:
    p = base_parser("batched spatial range queries")
    p.add_argument("--input", required=True)
    p.add_argument("--queries", required=True)
    args = p.parse_args()

    spark = build_session("rtree-spark-range", args)
    grid = Grid(args.grid_level, args.extent)
    data = load_rects(spark, args.input, args.format)
    queries = load_query_rects(spark, args.queries)
    hits = range_query(data, queries, grid)
    qcell = queries.select(
        "query_id",
        grid.cell_of_point_col(
            (F.col("min_x") + F.col("max_x")) / 2, (F.col("min_y") + F.col("max_y")) / 2
        ).alias("qcell"),
    )
    out = hits.join(F.broadcast(qcell), "query_id").withColumn(
        "part", coarse_cell_col(grid, args.coarse_level, F.col("qcell"))
    ).drop("qcell")
    finish(out, args, stage="range_query")
    spark.stop()


if __name__ == "__main__":
    main()
