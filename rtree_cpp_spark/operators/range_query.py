"""Batched range queries (reference R1/R2, RTreeBulkLoad.cpp:139-210).

The reference answers one query at a time by DFS with MBR pruning.  The
distributed re-expression answers the WHOLE query batch in one plan:

    queries --cover--> (query_id, cell)   [tiny: broadcast]
    data    --cover--> (doc_id,  cell)
    equi-join on cell  -> exact closed-bound predicate
                       -> reference-point dedup (no distinct shuffle)

One broadcast hash join for the whole batch; the data side is never
shuffled.  With a cell-partitioned layout, Catalyst prunes untouched
cell partitions (the distributed analog of MBR pruning, SURVEY.md O2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.functions.geometry import contains_col, intersects_col
from rtree_cpp_spark.operators.cover import ref_point_cell_col, with_cover_cells


def range_query(data_rects: DataFrame, queries: DataFrame, grid: Grid, broadcast_queries: bool = True) -> DataFrame:
    """data_rects(doc_id, min_x..max_y) x queries(query_id, min_x..max_y)
    → (query_id, doc_id), closed-interval semantics, each pair once.

    Containment fast-path (reference R2, RTreeBulkLoad.cpp:158-164 +
    getLeafs :127-137): each query cover cell is classified ONCE on the
    tiny broadcast side — a cell whose closed box lies fully inside the
    query is *interior*, and every candidate met there is a hit by
    construction (the doc's cover guarantees it touches the closed cell
    box, which the query contains), so the per-candidate exact predicate
    short-circuits to a precomputed boolean.  Exactly the reference's
    "query contains node MBR → emit whole subtree" re-expressed per cell.
    Correctness-neutral; assumes geometry intersects the grid domain (the
    Grid clamping contract — a rect wholly outside the domain could alias
    onto edge cells it does not touch)."""
    q = queries.select(
        "query_id",
        F.col("min_x").alias("q_min_x"),
        F.col("min_y").alias("q_min_y"),
        F.col("max_x").alias("q_max_x"),
        F.col("max_y").alias("q_max_y"),
    )
    q_cells = with_cover_cells(q, grid, prefix="q_")
    interior = contains_col(
        F.col("q_min_x"), F.col("q_min_y"), F.col("q_max_x"), F.col("q_max_y"),
        *grid.cell_box_cols(F.col("cell")),
    )
    q_cells = q_cells.withColumn("q_interior", interior)
    if broadcast_queries:
        q_cells = F.broadcast(q_cells)
    d_cells = with_cover_cells(data_rects, grid)
    hit = intersects_col(
        F.col("q_min_x"), F.col("q_min_y"), F.col("q_max_x"), F.col("q_max_y"),
        F.col("min_x"), F.col("min_y"), F.col("max_x"), F.col("max_y"),
    )
    ref_cell = ref_point_cell_col(
        grid, F.col("q_min_x"), F.col("q_min_y"), F.col("min_x"), F.col("min_y")
    )
    return (
        d_cells.join(q_cells, "cell")
        .where((F.col("cell") == ref_cell) & (F.col("q_interior") | hit))
        .select("query_id", "doc_id")
    )


def contains_query(
    data_rects: DataFrame, queries: DataFrame, grid: Grid, broadcast_queries: bool = True
) -> DataFrame:
    """Containment query: (query_id, doc_id) for docs FULLY INSIDE the
    query rect — reference P3 (`contains`, Rectangle.h:74-77) promoted
    from a pruning helper to a first-class plan.  Closed containment:
    docs equal to the query match.

    Same one-broadcast-join shape as :func:`range_query`; the reference-
    point dedup is valid unchanged because a contained doc's reference
    point is its own min corner (max(q_min, d_min) = d_min), whose cell
    is in both covers."""
    q = queries.select(
        "query_id",
        F.col("min_x").alias("q_min_x"),
        F.col("min_y").alias("q_min_y"),
        F.col("max_x").alias("q_max_x"),
        F.col("max_y").alias("q_max_y"),
    )
    q_cells = with_cover_cells(q, grid, prefix="q_")
    if broadcast_queries:
        q_cells = F.broadcast(q_cells)
    d_cells = with_cover_cells(data_rects, grid)
    inside = contains_col(
        F.col("q_min_x"), F.col("q_min_y"), F.col("q_max_x"), F.col("q_max_y"),
        F.col("min_x"), F.col("min_y"), F.col("max_x"), F.col("max_y"),
    )
    ref_cell = ref_point_cell_col(
        grid, F.col("q_min_x"), F.col("q_min_y"), F.col("min_x"), F.col("min_y")
    )
    return (
        d_cells.join(q_cells, "cell")
        .where(inside & (F.col("cell") == ref_cell))
        .select("query_id", "doc_id")
    )


def range_query_layout(
    spark, layout_path: str, queries: DataFrame, grid: Grid
) -> DataFrame:
    """Range query over a WRITTEN layout with partition pruning: coarse
    hive partitions whose per-partition MBR (the node-MBR analog,
    ``plans.layout.stats_path``) is disjoint from every query are never
    read — Catalyst turns the ``isin`` into PartitionFilters, so the
    pruned dirs cost zero I/O.  This is the reference's root-level MBR
    pruning (RTreeBulkLoad.cpp:154-156) at the storage layer.

    Pruning on the MBR (not the coarse cell box) is what makes it sound:
    docs are placed by centroid and can overhang their partition, exactly
    as R-tree node MBRs overhang their STR slab.  Pruning is EXCLUSION-
    based: only partitions a stats row proves disjoint are dropped, so
    missing stats (legacy layout, crash window) degrade to extra I/O,
    never to missing results.  Queries are tiny by contract (S2,
    broadcast side) — the prune set is computed driver-side from the
    O(coarse cells) stats table."""
    from rtree_cpp_spark.plans.layout import excluded_partitions_for_queries, read_layout

    excluded = excluded_partitions_for_queries(spark, layout_path, queries.toPandas())
    data = read_layout(spark, layout_path)
    if excluded:
        data = data.where(~F.col("coarse_cell").isin(excluded))
    return range_query(
        data.select("doc_id", "min_x", "min_y", "max_x", "max_y"), queries, grid
    )


def range_count(data_rects: DataFrame, queries: DataFrame, grid: Grid) -> DataFrame:
    """Per-query hit count — the reference's only (commented-out) range
    output was the count (RTreeBulkLoad.cpp:202-209)."""
    hits = range_query(data_rects, queries, grid)
    return (
        queries.select("query_id")
        .join(hits.groupBy("query_id").agg(F.count("*").alias("n_hits")), "query_id", "left")
        .select("query_id", F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"))
    )


def anti_range_query(data_rects: DataFrame, queries: DataFrame) -> DataFrame:
    """(doc_id): documents whose rectangle intersects NONE of the query
    rectangles — the complement of ``range_query`` over the same
    batched-query contract (coverage-gap audits, out-of-scope
    carve-outs for region-restricted corpora).

    Plan: ONE BroadcastNestedLoopJoin(left_anti) against the tiny query
    batch — |Q| closed-interval predicate evaluations per doc, all in
    codegen, zero shuffle.  The positive query uses the cell cover to
    SKIP non-matching docs; the anti query must consider every doc by
    definition, so the full scan is irreducible and the broadcast NLJ
    is the optimal plan, not a fallback."""
    cond = (
        (queries["max_x"] >= data_rects["min_x"])
        & (queries["min_x"] <= data_rects["max_x"])
        & (queries["max_y"] >= data_rects["min_y"])
        & (queries["min_y"] <= data_rects["max_y"])
    )
    return data_rects.join(F.broadcast(queries), cond, "left_anti").select("doc_id")
