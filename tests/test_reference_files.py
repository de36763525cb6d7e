"""Direct reference text-file formats (src/Main.cpp:50-135) round-trip."""

import numpy as np
import pytest

from oracle import brute
from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.range_query import range_query
from rtree_cpp_spark.sources import reference_files as rf


@pytest.fixture()
def data_file(tmp_path):
    # reference format: "x1 y1, x2 y2" (whitespace + comma), float32 parse
    lines = [
        "1.5 2.25, 10 12.75",
        "0 0, 0.25 0.25",
        "100.5 200.25, 116.5 216.25",
        "3 3, 19.25 19.25",
    ]
    p = tmp_path / "data.txt"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_load_data_line_order_ids(spark, data_file):
    got = rf.load_data(spark, data_file).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in got] == ["1", "2", "3", "4"]
    assert got[0]["min_x"] == np.float32(1.5)
    assert got[2]["max_y"] == np.float32(216.25)


def test_load_data_malformed_fails(spark, tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("1 2, 3 4\nnot a rect line\n")
    with pytest.raises(Exception, match="malformed|MALFORMED|USER_RAISED"):
        rf.load_data(spark, str(p)).collect()


def test_nearest_queries_centroid(spark, data_file):
    got = {r["query_id"]: (r["x"], r["y"]) for r in rf.read_nearest_queries(spark, data_file).collect()}
    # centroid rule, float32 (Main.cpp:126-129)
    assert got["1"] == (np.float32((1.5 + 10) / 2), np.float32((2.25 + 12.75) / 2))


def test_range_query_over_reference_files(spark, tmp_path, data_file):
    qp = tmp_path / "queries.txt"
    # tolerant parse: extra trailing number ignored (Main.cpp:80-105)
    qp.write_text("0 0, 20 20 999\n50 50, 60 60\n")
    data = rf.load_data(spark, data_file)
    queries = rf.read_range_queries(spark, str(qp))
    got = range_query(data, queries, Grid(5)).toPandas()
    exp = brute.range_brute(
        data.toPandas().rename(columns={"doc_id": "doc_id"}),
        queries.toPandas(),
    )
    from conftest import assert_same_rows
    assert_same_rows(range_query(data, queries, Grid(5)), exp)
    # query 2 matches nothing; query 1 contains rects 1,2,4 (closed bounds)
    hits = set(map(tuple, got[["query_id", "doc_id"]].itertuples(index=False)))
    assert hits == {("1", "1"), ("1", "2"), ("1", "4")}
