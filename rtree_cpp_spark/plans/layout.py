"""Table layout = the index (reference STR bulk load, SURVEY.md B1-B4).

The reference builds a pointer tree (RTreeBulkLoad.cpp:7-27); the Spark
analog is *data layout*: pick a cell resolution by the STR density
heuristic (capacity 64, src/Main.cpp:192; slab math RTreeBulkLoad.cpp:
38-40), add the cell key, `repartitionByRange` on it, sort within
partitions by (cell, min_x) — preserving the reference's within-node
minX order (Node.cpp:39-51) — and write a cell-keyed parquet/Iceberg
table.  Queries then get partition pruning on `cell` for free (the
distributed analog of MBR pruning, SURVEY.md O2).

Iceberg note: the sandbox has no Iceberg runtime jar, so the writer
targets parquet behind one interface; `writeTo(...).partitionedBy(...)`
is a one-line swap when an Iceberg catalog is configured.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid, pick_resolution
from rtree_cpp_spark.functions.geometry import center_cols

TARGET_OCCUPANCY = 64.0  # reference node capacity, src/Main.cpp:192


def median_occupancy_by_level(
    rects: DataFrame, levels: list[int], sample_fraction: float = 1.0, extent: float = 1024.0
) -> dict[int, float]:
    """One sampled pass per candidate level: median docs-per-cell at the
    centroid assignment (SURVEY.md section 4.1)."""
    df = rects if sample_fraction >= 1.0 else rects.sample(fraction=sample_fraction, seed=42)
    cx, cy = center_cols(
        F.col("min_x").cast("double"), F.col("min_y").cast("double"),
        F.col("max_x").cast("double"), F.col("max_y").cast("double"),
    )
    cells = df.select(
        *[Grid(lvl, extent).cell_of_point_col(cx, cy).alias(f"c{lvl}") for lvl in levels]
    )
    out: dict[int, float] = {}
    for lvl in levels:
        counts = cells.groupBy(f"c{lvl}").count()
        med = counts.agg(F.expr("percentile_approx(count, 0.5)").alias("m")).collect()[0]["m"]
        out[lvl] = float(med) / max(sample_fraction, 1e-12)
    return out


def occupancy_stats(
    rects: DataFrame, levels: list[int] | None = None, extent: float = 1024.0
) -> DataFrame:
    """(level, n_cells, max_occ, median_occ): exact per-level occupancy of
    the centroid tile assignment — the observable the STR density
    heuristic (SURVEY.md section 4.1) chooses the resolution from.
    Exact ``percentile(0.5)`` (not approx) so the SQL oracle matches."""
    levels = levels or [4, 5, 6]
    cx, cy = center_cols(
        F.col("min_x").cast("double"), F.col("min_y").cast("double"),
        F.col("max_x").cast("double"), F.col("max_y").cast("double"),
    )
    cells = rects.select(
        *[Grid(lvl, extent).cell_of_point_col(cx, cy).alias(f"c{lvl}") for lvl in levels]
    )
    per_level = [
        cells.groupBy(F.col(f"c{lvl}").alias("cell"))
        .agg(F.count("*").alias("n"))
        .agg(
            F.lit(lvl).alias("level"),
            F.count("*").alias("n_cells"),
            F.max("n").alias("max_occ"),
            F.expr("percentile(n, 0.5D)").alias("median_occ"),
        )
        for lvl in levels
    ]
    out = per_level[0]
    for df in per_level[1:]:
        out = out.unionByName(df)
    return out


def choose_grid(
    rects: DataFrame,
    levels: list[int] | None = None,
    target: float = TARGET_OCCUPANCY,
    sample_fraction: float = 1.0,
    extent: float = 1024.0,
) -> Grid:
    levels = levels or [2, 3, 4, 5, 6, 7, 8]
    occ = median_occupancy_by_level(rects, levels, sample_fraction, extent)
    return Grid(pick_resolution(occ, target), extent)


def morton_col(grid: Grid, cell_col: F.Column) -> F.Column:
    """Z-order sort key from a row-major cell id — pure bit arithmetic,
    Column-expression (unrolled interleave), used only for layout sort."""
    cx = F.shiftrightunsigned(cell_col, grid.level)
    cy = cell_col.bitwiseAND(F.lit(grid.n - 1))
    z = F.lit(0).cast("long")
    for i in range(grid.level):
        bit = F.lit(1 << i)
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftrightunsigned(cx, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftrightunsigned(cy, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def write_layout(
    rects: DataFrame,
    path: str,
    grid: Grid,
    num_partitions: int | None = None,
    coarse_levels_up: int = 3,
) -> None:
    """Write the cell-keyed table: z-ordered range partitioning (spatial
    locality across files) + hive partition dirs on a coarse parent cell
    (partition pruning for queries touching few regions)."""
    cx, cy = center_cols(
        F.col("min_x").cast("double"), F.col("min_y").cast("double"),
        F.col("max_x").cast("double"), F.col("max_y").cast("double"),
    )
    cell = grid.cell_of_point_col(cx, cy)
    df = rects.withColumn("cell", cell).withColumn("_z", morton_col(grid, F.col("cell")))
    coarse = F.shiftrightunsigned(F.col("cell"), coarse_levels_up).bitwiseAND(
        F.lit(((1 << (grid.level - coarse_levels_up)) - 1))
    )  # cx part; combine with cy part below
    up = coarse_levels_up
    pcx = F.shiftrightunsigned(F.shiftrightunsigned(F.col("cell"), grid.level), up)
    pcy = F.shiftrightunsigned(F.col("cell").bitwiseAND(F.lit(grid.n - 1)), up)
    df = df.withColumn("coarse_cell", pcx * F.lit(grid.n >> up) + pcy)
    parts = num_partitions or rects.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(parts, "_z")
        .sortWithinPartitions("_z", "min_x")
        .drop("_z")
        .write.mode("overwrite")
        .partitionBy("coarse_cell")
        .parquet(path)
    )


def read_layout(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    rects: DataFrame,
    table_name: str,
    grid: Grid,
    n_buckets: int = 16,
) -> None:
    """Write a cell-BUCKETED table (Hive bucketing on ``cell``): two
    tables bucketed the same way join WITHOUT any exchange — the
    shuffle the cell equi-join would otherwise pay happens once at
    write time and is amortized over every subsequent join/query
    (SURVEY.md §4.2 "bucketing for co-located joins"; the closest Spark
    analog of the reference's persistent R-tree).  Requires a warehouse
    (saveAsTable); asserted shuffle-free by tests via plan inspection."""
    cx, cy = center_cols(
        F.col("min_x").cast("double"), F.col("min_y").cast("double"),
        F.col("max_x").cast("double"), F.col("max_y").cast("double"),
    )
    df = rects.withColumn("cell", grid.cell_of_point_col(cx, cy))
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, "cell")
        .sortBy("cell", "min_x")
        .saveAsTable(table_name)
    )
