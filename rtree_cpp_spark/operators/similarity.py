"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k cosine neighbors — the
  correctness baseline.  Dot products are per-row **left folds over the
  array** (``zip_with`` + ``aggregate``), so the floating-point sum
  order is the array order — bit-identical across engines and across
  partitionings (no shuffle-order nondeterminism), and reproducible by
  the DuckDB oracle with ``list_zip``/``list_reduce``.
- ``lsh_buckets``: sign-LSH (random hyperplanes with ±1 components
  derived from md5 bits — reproducible in SQL) — the scale path.
- ``lsh_topk``: bucketed ANN — exact ranking within the query's bucket,
  replacing the all-pairs scan with a bucket equi-join.

No UDFs anywhere; everything stays JVM-side.  The plan shape at scale:
the query set broadcasts (small), the corpus is scanned once, each row
does dim multiply-adds inside codegen — no shuffle until top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _h64(s: Column) -> Column:
    return F.conv(F.substring(F.md5(F.encode(s, "utf-8")), 1, 15), 16, 10).cast("long")


def dot_col(a: Column, b: Column) -> Column:
    """Left-fold dot product of two array<float> columns, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors.

    Output: (query_vec_id, neighbor_vec_id, cos_sim double, rank int),
    rank by (cos_sim desc, neighbor_vec_id), self excluded.
    """
    q = F.broadcast(
        embeddings.where(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_vec_id"), F.col("embedding").alias("q_emb")
        )
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_vec_id"),
        F.col("embedding").alias("n_emb"),
    )
    scored = (
        c.join(q, F.col("neighbor_vec_id") != F.col("query_vec_id"))
        .withColumn(
            "cos_sim",
            dot_col(F.col("q_emb"), F.col("n_emb"))
            / (norm_col(F.col("q_emb")) * norm_col(F.col("n_emb"))),
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_vec_id", "neighbor_vec_id", "cos_sim", "rank")
    )


def plane_weights(n_planes: int) -> Column:
    """array<array<double>> of ±1 hyperplane components, w[p][i] from
    md5(p ':' i) — deterministic and SQL-reproducible.  Built per-row
    from the row's own dimension so it adapts to any embedding width."""
    dim_idx = F.sequence(F.lit(0), F.size(F.col("embedding")) - 1)
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.transform(
            dim_idx,
            lambda i: F.when(
                _h64(F.concat_ws(":", p.cast("string"), i.cast("string"))) % 2 == 1, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        ),
    )


def lsh_buckets(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """(vec_id, bucket): sign-LSH bucket id in [0, 2^n_planes)."""
    with_w = embeddings.withColumn("w", plane_weights(n_planes))
    sgn = F.transform(
        F.col("w"),
        lambda wp: F.when(dot_col(F.col("embedding"), wp) >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    bucket = F.aggregate(
        F.zip_with(
            sgn,
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            # 2^p via double pow — exact for p < 53, and n_planes is tiny
            lambda s, p: s.cast("long") * F.pow(F.lit(2.0), p.cast("double")).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return with_w.select("vec_id", bucket.alias("bucket"))


def lsh_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5, n_planes: int = 4) -> DataFrame:
    """Bucketed ANN: exact cosine top-k among same-bucket candidates —
    the 100 TB path (recall < 1.0 by design; the bucket equi-join
    replaces the all-pairs scan)."""
    b = lsh_buckets(embeddings, n_planes)
    emb = embeddings.join(b, "vec_id")
    q = F.broadcast(
        emb.where(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_vec_id"), F.col("embedding").alias("q_emb"), "bucket"
        )
    )
    c = emb.select(F.col("vec_id").alias("neighbor_vec_id"), F.col("embedding").alias("n_emb"), "bucket")
    scored = (
        c.join(q, "bucket")
        .where(F.col("neighbor_vec_id") != F.col("query_vec_id"))
        .withColumn(
            "cos_sim",
            dot_col(F.col("q_emb"), F.col("n_emb"))
            / (norm_col(F.col("q_emb")) * norm_col(F.col("n_emb"))),
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_vec_id", "neighbor_vec_id", "cos_sim", "rank")
    )
