"""End-to-end golden tests: engine vs brute-force oracle (SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pytest

from oracle import brute
from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.knn import knn
from rtree_cpp_spark.operators.range_query import range_count, range_query
from rtree_cpp_spark.operators.spatial_join import spatial_join, spatial_join_salted
from rtree_cpp_spark.operators.tiles import cover_tiles, primary_tiles
from rtree_cpp_spark.sources import synth

from conftest import assert_same_rows

GRIDS = [Grid(3), Grid(6)]


@pytest.fixture(scope="module")
def rects_a_df(spark, rects_a_pdf):
    return spark.createDataFrame(rects_a_pdf)


@pytest.fixture(scope="module")
def rects_b_df(spark, rects_b_pdf):
    return spark.createDataFrame(rects_b_pdf)


@pytest.fixture(scope="module")
def range_queries_pdf():
    return synth.synth_range_queries_pdf(30, seed=43)


@pytest.mark.parametrize("grid", GRIDS, ids=lambda g: f"level{g.level}")
def test_range_query_vs_brute(spark, rects_a_df, rects_a_pdf, range_queries_pdf, grid):
    qdf = spark.createDataFrame(range_queries_pdf)
    got = range_query(rects_a_df, qdf, grid)
    exp = brute.range_brute(rects_a_pdf, range_queries_pdf)
    assert_same_rows(got, exp)


def test_range_count(spark, rects_a_df, rects_a_pdf, range_queries_pdf):
    qdf = spark.createDataFrame(range_queries_pdf)
    got = range_count(rects_a_df, qdf, Grid(6)).toPandas().set_index("query_id")["n_hits"]
    exp = (
        brute.range_brute(rects_a_pdf, range_queries_pdf)
        .groupby("query_id")
        .size()
        .reindex(range_queries_pdf["query_id"], fill_value=0)
    )
    assert got.sort_index().tolist() == exp.sort_index().tolist()


@pytest.mark.parametrize("grid", GRIDS, ids=lambda g: f"level{g.level}")
def test_spatial_join_vs_brute(spark, rects_a_df, rects_b_df, rects_a_pdf, rects_b_pdf, grid):
    got = spatial_join(rects_a_df, rects_b_df, grid)
    exp = brute.join_brute(rects_a_pdf, rects_b_pdf)
    assert_same_rows(got, exp)
    # exactly-once: no duplicate pairs
    gp = got.toPandas()
    assert not gp.duplicated(["a_doc_id", "b_doc_id"]).any()


def test_salted_join_equals_unsalted(spark, rects_a_df, rects_b_df, rects_a_pdf, rects_b_pdf):
    # skewed fixture: 30% of docs are clustered in 3 hot spots, so a low
    # threshold actually triggers salting here
    grid = Grid(6)
    salted = spatial_join_salted(rects_a_df, rects_b_df, grid, hot_threshold=5, n_salt=4)
    exp = brute.join_brute(rects_a_pdf, rects_b_pdf)
    assert_same_rows(salted, exp)


@pytest.mark.parametrize("grid", GRIDS, ids=lambda g: f"level{g.level}")
def test_knn_vs_brute(spark, rects_a_df, rects_a_pdf, grid):
    qpdf = synth.synth_knn_queries_pdf(25, seed=44)
    qdf = spark.createDataFrame(qpdf)
    got = knn(rects_a_df, qdf, grid)
    exp = brute.knn_brute(rects_a_pdf, qpdf, dtype=np.float64)
    assert_same_rows(got, exp)


def test_knn_k_larger_than_dataset(spark, rects_a_df, rects_a_pdf):
    qpdf = pd.DataFrame({"query_id": ["K0"], "x": [512.0], "y": [512.0], "k": [10_000]})
    got = knn(rects_a_df, spark.createDataFrame(qpdf), Grid(6)).toPandas()
    assert len(got) == len(rects_a_pdf)  # returns every doc, ranked
    assert got["rank"].max() == len(rects_a_pdf)


def test_primary_tiles_vs_brute(spark, rects_a_df, rects_a_pdf):
    grid = Grid(6)
    got = primary_tiles(rects_a_df, grid)
    exp = brute.tiles_brute(rects_a_pdf, grid, dtype=np.float64)
    assert_same_rows(got, exp)
    # partition property: each doc in exactly one tile
    assert got.toPandas()["doc_id"].is_unique


def test_cover_tiles_vs_brute(spark, rects_a_df, rects_a_pdf):
    grid = Grid(6)
    got = cover_tiles(rects_a_df, grid)
    exp = brute.tiles_cover_brute(rects_a_pdf, grid)
    assert_same_rows(got, exp)
