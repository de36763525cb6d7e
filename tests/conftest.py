from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from rtree_cpp_spark.sources import synth  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("rtree_cpp_spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_a_pdf() -> pd.DataFrame:
    return synth.synth_docs_pdf("A", 400, seed=42)


@pytest.fixture(scope="session")
def docs_b_pdf() -> pd.DataFrame:
    return synth.synth_docs_pdf("B", 300, seed=77)


def rects_pdf_from_docs(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-side float32 parse of the geo span (oracle input)."""
    rows = []
    for _, r in pdf.iterrows():
        geo = next(s for s in r["spans"] if s["kind"] == "geo")
        import numpy as np

        vals = np.asarray(geo["text"].replace(",", " ").split(), dtype=np.float32)
        rows.append((r["doc_id"], *vals.tolist()))
    return pd.DataFrame(rows, columns=["doc_id", "min_x", "min_y", "max_x", "max_y"])


@pytest.fixture(scope="session")
def rects_a_pdf(docs_a_pdf) -> pd.DataFrame:
    return rects_pdf_from_docs(docs_a_pdf)


@pytest.fixture(scope="session")
def rects_b_pdf(docs_b_pdf) -> pd.DataFrame:
    return rects_pdf_from_docs(docs_b_pdf)


@pytest.fixture(scope="session")
def docs_a_df(spark, docs_a_pdf):
    return spark.createDataFrame(docs_a_pdf, schema=synth.DOC_SCHEMA)


@pytest.fixture(scope="session")
def docs_b_df(spark, docs_b_pdf):
    return spark.createDataFrame(docs_b_pdf, schema=synth.DOC_SCHEMA)


def assert_same_rows(df, pdf_expected: pd.DataFrame) -> None:
    """Order-insensitive row-set equality between a Spark DF and pandas."""
    got = df.toPandas()
    cols = sorted(got.columns)
    assert sorted(pdf_expected.columns) == cols, (sorted(pdf_expected.columns), cols)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = pdf_expected[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, rtol=1e-9)
