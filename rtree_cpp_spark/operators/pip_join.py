"""Point-in-polygon (point-in-rect) join — north_star operator.

The reference's only point-containment test is ``Rectangle::add``
(src/rtree/structures/Rectangle.cpp:29-33): **strict interior**
(``x > minX && x < maxX``, boundary excluded) — dead code there, but it
pins the intended semantics (SURVEY.md P9).  The engine exposes both
variants:

- ``boundary='closed'``: x in [min_x, max_x] — consistent with the
  closed-interval rect-rect predicate (P1, RTreeBulkLoad.h:159-163);
- ``boundary='open'``: the reference's strict-interior rule.

Plan: each point lives in exactly ONE grid cell; rects cover-explode to
their cells; candidates meet by cell equi-join and the exact predicate
refines.  Because the point's cell is unique, every true (point, rect)
pair meets in exactly one cell — **no dedup pass at all** (cheaper than
the rect-rect join's reference-point filter).  At 10^12 docs the join is
a salted SMJ on ``cell`` with the same hot-cell defenses as the spatial
join; a small point set broadcasts instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.cover import with_cover_cells


def pip_join(
    points: DataFrame,
    rects: DataFrame,
    grid: Grid,
    boundary: str = "closed",
) -> DataFrame:
    """points(point_id, x, y) x rects(doc_id, min_x..max_y)
    → (point_id, doc_id): pairs where the point is inside the rect.
    """
    if boundary not in ("closed", "open"):
        raise ValueError(f"boundary must be 'closed' or 'open', got {boundary!r}")
    p = points.select(
        "point_id",
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
    ).withColumn("cell", grid.cell_of_point_col(F.col("x"), F.col("y")))
    r = with_cover_cells(rects.select("doc_id", "min_x", "min_y", "max_x", "max_y"), grid)
    if boundary == "closed":
        hit = (
            (F.col("x") >= F.col("min_x")) & (F.col("x") <= F.col("max_x"))
            & (F.col("y") >= F.col("min_y")) & (F.col("y") <= F.col("max_y"))
        )
    else:  # strict interior, Rectangle.cpp:30
        hit = (
            (F.col("x") > F.col("min_x")) & (F.col("x") < F.col("max_x"))
            & (F.col("y") > F.col("min_y")) & (F.col("y") < F.col("max_y"))
        )
    return p.join(r, "cell").where(hit).select("point_id", "doc_id")
