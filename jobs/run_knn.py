"""kNN job — reference `-n -k K data.txt queries.txt`
(src/Main.cpp:156-160, 211-224) as a cluster job.

    spark-submit --py-files engine.zip jobs/run_knn.py \
        --input <docs> --queries <queries_parquet> --k 5 \
        --output /data/out/knn --manifest /data/out/manifest

Queries table: (query_id, x, y[, k]).  A missing k column takes --k
(the reference's single global -k).  Output: (query_id, doc_id,
sq_dist, rank) partitioned by the query point's coarse cell.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from jobs._common import base_parser, build_session, coarse_cell_col, finish, load_query_points, load_rects
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.knn import knn


def main() -> None:
    p = base_parser("exact k-nearest-neighbors (cell-disk doubling)")
    p.add_argument("--input", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--k", type=int, default=None, help="global k if queries lack a k column")
    args = p.parse_args()
    if args.k is not None and args.k <= 0:
        p.error("k must be > 0")  # mirrors src/Main.cpp:212-215

    spark = build_session("rtree-spark-knn", args)
    grid = Grid(args.grid_level, args.extent)
    data = load_rects(spark, args.input, args.format)
    queries = load_query_points(spark, args.queries)
    if "k" not in queries.columns:
        if args.k is None:
            p.error("--k required when the queries table has no k column")
        queries = queries.withColumn("k", F.lit(args.k))
    result = knn(data, queries, grid)
    qcell = queries.select(
        "query_id", grid.cell_of_point_col(F.col("x"), F.col("y")).alias("qcell")
    )
    out = result.join(F.broadcast(qcell), "query_id").withColumn(
        "part", coarse_cell_col(grid, args.coarse_level, F.col("qcell"))
    ).drop("qcell")
    finish(out, args, stage="knn")
    spark.stop()


if __name__ == "__main__":
    main()
