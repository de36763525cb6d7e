"""Cell-cover explosion — the engine's candidate generator.

Replaces the reference's tree traversal (node MBR pruning,
src/rtree/builders/RTreeBulkLoad.cpp:154-156 and :313-319): instead of
walking nodes, every rect is exploded to the grid cells it covers and
candidates meet by cell equi-join.  Pure JVM Column expressions
(``explode(sequence(...))``) — stays inside whole-stage codegen, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid


def with_cover_cells(df: DataFrame, grid: Grid, prefix: str = "") -> DataFrame:
    """Explode each rect row to one row per covered cell (column ``cell``).

    Cover ranges are inclusive ``[floor(min/s), floor(max/s)]`` so rects
    touching a cell boundary still share a candidate cell with neighbors
    they touch (closed-interval intersection, RTreeBulkLoad.h:159-163).
    """
    p = prefix
    gx0 = grid.cx_col(F.col(f"{p}min_x"))
    gx1 = grid.cx_col(F.col(f"{p}max_x"))
    gy0 = grid.cx_col(F.col(f"{p}min_y"))
    gy1 = grid.cx_col(F.col(f"{p}max_y"))
    return (
        df.withColumn("_gx", F.explode(F.sequence(gx0, gx1)))
        .withColumn("_gy", F.explode(F.sequence(gy0, gy1)))
        .withColumn("cell", F.col("_gx") * F.lit(grid.n) + F.col("_gy"))
        .drop("_gx", "_gy")
    )


def ref_point_cell_col(
    grid: Grid,
    a_min_x: Column, a_min_y: Column,
    b_min_x: Column, b_min_y: Column,
) -> Column:
    """Cell of the *reference point* of an intersecting pair:
    ``(max(a.min_x, b.min_x), max(a.min_y, b.min_y))`` — the lower-left
    corner of the intersection region.  Keeping a candidate pair only in
    this cell makes every true pair survive **exactly once** without a
    ``distinct`` shuffle (SURVEY.md J1: "reference-point dedup")."""
    return grid.cell_of_point_col(F.greatest(a_min_x, b_min_x), F.greatest(a_min_y, b_min_y))
