"""Direct readers for the reference's text-file formats, so a user of
serafm/rtree_cpp can point this engine at their existing datasets.

- ``load_data``:   dataset lines ``"x1 y1, x2 y2"`` → rects with ids
  assigned by 1-BASED LINE ORDER (reference src/Main.cpp:50-78); any
  malformed line fails the job (the distributed analog of ``exit(0)``,
  src/Main.cpp:73-74).
- ``read_range_queries``: same format, tolerant parse — first four
  numbers of each line, extra tokens ignored (src/Main.cpp:80-105).
- ``read_nearest_queries``: rect lines collapsed to their centroid
  points; invalid lines are SKIPPED, not fatal (src/Main.cpp:107-135).

Line-order ids require a deterministic global line index.  This is the
one place the engine touches the RDD API: ``zipWithIndex`` over a text
read is deterministic (Hadoop text splits preserve line order within
and across partitions by partition index).  Everything downstream is
DataFrame/Column code; all coordinates parse as float32 like the
reference (``cast("float")``, src/Main.cpp:67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LINE_SCHEMA = "line string, _idx long"


def _lines_with_index(spark: SparkSession, path: str) -> DataFrame:
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    return spark.createDataFrame(rdd, _LINE_SCHEMA)


def _first_floats(line, n: int):
    """Columns of the first n whitespace/comma-separated floats."""
    parts = F.split(F.trim(line), r"[,\s]+")
    return [F.element_at(parts, i + 1).cast("float") for i in range(n)]


def load_data(spark: SparkSession, path: str) -> DataFrame:
    """(doc_id, min_x, min_y, max_x, max_y) — doc_id = 1-based line order
    as a string (the reference's int id, kept joinable with doc tables).
    Malformed lines raise (fail-fast, mirrors exit(0))."""
    df = _lines_with_index(spark, path)
    x1, y1, x2, y2 = _first_floats(F.col("line"), 4)
    out = df.select(
        (F.col("_idx") + 1).cast("string").alias("doc_id"),
        x1.alias("min_x"), y1.alias("min_y"), x2.alias("max_x"), y2.alias("max_y"),
    )
    bad = F.col("min_x").isNull() | F.col("min_y").isNull() | F.col("max_x").isNull() | F.col("max_y").isNull()
    # Guard EVERY rect column: a consumer whose plan prunes all but one
    # column must still hit the fail-fast (mirrors exit(0), Main.cpp:73-74).
    err = F.raise_error(F.concat(F.lit("malformed dataset line "), F.col("doc_id")))
    return out.select(
        "doc_id",
        *[F.when(bad, err).otherwise(F.col(c)).alias(c) for c in ("min_x", "min_y", "max_x", "max_y")],
    )


def read_range_queries(spark: SparkSession, path: str) -> DataFrame:
    """(query_id, min_x, min_y, max_x, max_y) — tolerant parse, first
    four numbers used (reference keeps reading floats until it has 4)."""
    df = _lines_with_index(spark, path)
    x1, y1, x2, y2 = _first_floats(F.col("line"), 4)
    return df.select(
        (F.col("_idx") + 1).cast("string").alias("query_id"),
        x1.alias("min_x"), y1.alias("min_y"), x2.alias("max_x"), y2.alias("max_y"),
    ).dropna()


def read_nearest_queries(spark: SparkSession, path: str) -> DataFrame:
    """(query_id, x, y) — query point = rect centroid, float32 midpoint
    arithmetic like the reference (src/Main.cpp:126-129); invalid lines
    skipped (warning-not-fatal semantics)."""
    q = read_range_queries(spark, path)
    return q.select(
        "query_id",
        ((F.col("min_x") + F.col("max_x")) / F.lit(2.0).cast("float")).cast("float").alias("x"),
        ((F.col("min_y") + F.col("max_y")) / F.lit(2.0).cast("float")).cast("float").alias("y"),
    )
