"""Deterministic rect tables derived from the driver's testdata.

The driver's correctness gate (CORRECTNESS_r{N}.json) compares our Spark
queries against DuckDB SQL over the SAME parquet tables, so the spatial
inputs must be derivable in both engines bit-identically.  Every rect is
a pure integer-arithmetic function of a table key, landing on the 0.25
lattice in [0, 1024) — exact in float32, float64, and DuckDB doubles.

The SQL snippets below are **dialect-neutral** (run verbatim in Spark SQL
and DuckDB) and are the single source of truth: the Spark side executes
them via ``spark.sql`` over temp views; ``oracle_sql`` embeds them as
CTEs.  No drift possible.

This mirrors the reference's id-by-line-order loading (src/Main.cpp:
50-78): the table key plays the line number, the derived rect plays the
parsed ``"x1 y1, x2 y2"`` line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Knuth multiplicative hash — keys here are < ~10^7 so key*K < 2^63.
_K = 2654435761


def _rect_sql(table: str, key: str, prefix: str, seed: int) -> str:
    """SELECT producing (doc_id, min_x, min_y, max_x, max_y) from a keyed
    table.  Center on the 0.25 lattice in [0,1024); width/height in
    {0.25..16} — the FIXTURES.md distribution, SQL-expressible.  Two
    independent hash streams decorrelate position and size."""
    h1 = f"(({key} + {seed}) * {_K}) % 2147483648"
    h2 = f"(({key} + {seed + 7}) * {_K}) % 2147483648"
    hx = f"({h1}) % 4096"
    hy = f"CAST(FLOOR(({h1}) / 4096.0e0) AS BIGINT) % 4096"
    hw = f"({h2}) % 64"
    hh = f"CAST(FLOOR(({h2}) / 64.0e0) AS BIGINT) % 64"
    return (
        f"SELECT CONCAT('{prefix}', CAST({key} AS STRING)) AS doc_id, "
        f"({hx}) * 0.25e0 AS min_x, "
        f"({hy}) * 0.25e0 AS min_y, "
        f"(({hx}) + ({hw}) + 1) * 0.25e0 AS max_x, "
        f"(({hy}) + ({hh}) + 1) * 0.25e0 AS max_y "
        f"FROM {table}"
    )


RECTS_A_SQL = _rect_sql("orders", "o_orderkey", "A", 1)
RECTS_B_SQL = _rect_sql("customer", "c_custkey", "B", 2)

# ~3% deterministic subset of A (same hash arithmetic → doc_ids are a
# strict subset of RECTS_A_SQL's): the query side of the kNN join.
RECTS_A_SUBSET_SQL = _rect_sql(
    "(SELECT o_orderkey FROM orders WHERE o_orderkey % 29 = 0) t", "o_orderkey", "A", 1
)

# Deterministic per-doc field value (for zonal/interpolation analytics):
# same doc_ids as RECTS_A_SQL, value = pure key arithmetic.
RECT_VALUES_SQL = (
    "SELECT CONCAT('A', CAST(o_orderkey AS STRING)) AS doc_id, "
    f"(o_orderkey * {_K}) % 1000 AS value FROM orders"
)


# Range queries from nation (25 rows): mixed sizes incl. huge boxes.
QUERIES_RANGE_SQL = (
    "SELECT CONCAT('R', CAST(n_nationkey AS STRING)) AS query_id, "
    "((n_nationkey * 97) % 64) * 16.0e0 AS min_x, "
    "((n_nationkey * 53) % 64) * 16.0e0 AS min_y, "
    "((n_nationkey * 97) % 64) * 16.0e0 + (CASE WHEN n_nationkey % 3 = 0 THEN 0.25e0 "
    "WHEN n_nationkey % 3 = 1 THEN 24.0e0 ELSE 160.0e0 END) AS max_x, "
    "((n_nationkey * 53) % 64) * 16.0e0 + (CASE WHEN n_nationkey % 3 = 0 THEN 0.25e0 "
    "WHEN n_nationkey % 3 = 1 THEN 24.0e0 ELSE 160.0e0 END) AS max_y "
    "FROM nation"
)

# kNN queries from nation: centroid-style lattice points, varying k.
QUERIES_KNN_SQL = (
    "SELECT CONCAT('K', CAST(n_nationkey AS STRING)) AS query_id, "
    "((n_nationkey * 131) % 8192) * 0.125e0 AS x, "
    "((n_nationkey * 241) % 8192) * 0.125e0 AS y, "
    "(CASE WHEN n_nationkey % 4 = 0 THEN 1 WHEN n_nationkey % 4 = 1 THEN 5 "
    "WHEN n_nationkey % 4 = 2 THEN 64 ELSE 200 END) AS k "
    "FROM nation"
)

def _fmt2(v: str) -> str:
    """Dialect-neutral 2-decimal string of a lattice value ('12.25', '12.00')."""
    return f"CAST(CAST({v} AS DECIMAL(14,2)) AS STRING)"


# The reference line format "x1 y1, x2 y2" (src/Main.cpp:65-77) rebuilt
# from the rect columns — runs verbatim in Spark SQL and DuckDB.
GEO_LINE_SQL = (
    f"CONCAT({_fmt2('min_x')}, ' ', {_fmt2('min_y')}, ', ', "
    f"{_fmt2('max_x')}, ' ', {_fmt2('max_y')})"
)

# Spark-only: materialize the interleaved span sequence (input_hint shape)
# with spans deliberately OUT of offset order (geo, image, text) so the
# signature's sort-by-offset does real work.
def _interleaved_spark_sql(rect_sql: str, text_prefix: str) -> str:
    return (
        f"SELECT doc_id, array("
        f"named_struct('kind', 'geo', 'text', {GEO_LINE_SQL}, "
        f"'media_ref', CAST(NULL AS STRING), 'offset', 1), "
        f"named_struct('kind', 'image', 'text', CAST(NULL AS STRING), "
        f"'media_ref', CONCAT('media://', doc_id), 'offset', 2), "
        f"named_struct('kind', 'text', 'text', CONCAT('{text_prefix} ', doc_id), "
        f"'media_ref', CAST(NULL AS STRING), 'offset', 0)"
        f") AS spans FROM ({rect_sql}) r"
    )


INTERLEAVED_DOCS_SPARK_SQL = _interleaved_spark_sql(RECTS_A_SQL, "order")
INTERLEAVED_DOCS_B_SPARK_SQL = _interleaved_spark_sql(RECTS_B_SQL, "customer")


def sig_sql(alias: str, text_prefix: str) -> str:
    """Dialect-neutral reconstruction of the canonical span signature for
    the interleaved docs above (kind/text/media_ref ordered by offset)."""
    return (
        f"CONCAT('text', chr(31), CONCAT('{text_prefix} ', {alias}.doc_id), chr(30), "
        f"'geo', chr(31), CONCAT("
        f"{_fmt2(f'{alias}.min_x')}, ' ', {_fmt2(f'{alias}.min_y')}, ', ', "
        f"{_fmt2(f'{alias}.max_x')}, ' ', {_fmt2(f'{alias}.max_y')}), chr(30), "
        f"'image', chr(31), CONCAT('media://', {alias}.doc_id))"
    )


def interleaved_docs_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The A rect set as interleaved text+media documents
    (doc_id, spans:array<struct<kind,text,media_ref,offset>>)."""
    _ensure_views(spark, sf_dir)
    return spark.sql(INTERLEAVED_DOCS_SPARK_SQL)


def interleaved_docs_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(INTERLEAVED_DOCS_B_SPARK_SQL)


_VIEWS = {"orders": "orders", "customer": "customer", "nation": "nation"}


def _ensure_views(spark: SparkSession, sf_dir: str) -> None:
    for name in _VIEWS:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)


def rects_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(RECTS_A_SQL)


def rects_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(RECTS_B_SQL)


def rects_a_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(RECTS_A_SUBSET_SQL)


def rect_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(RECT_VALUES_SQL)


def queries_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(QUERIES_RANGE_SQL)


def queries_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir)
    return spark.sql(QUERIES_KNN_SQL)
