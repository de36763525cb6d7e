"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k cosine neighbors — the
  correctness baseline.  Dot products are per-row **left folds over the
  array** evaluated as vectorized Arrow/pandas kernels (numpy float64
  accumulation in array order), so the floating-point sum order is the
  array order — bit-identical across engines and across partitionings,
  and reproducible by the DuckDB oracle with ``list_zip``/``list_reduce``.
- ``lsh_buckets``: sign-LSH (random hyperplanes with ±1 components
  derived from md5 bits — reproducible in SQL) — the scale path.
- ``lsh_topk``: bucketed ANN — exact ranking within the query's bucket,
  replacing the all-pairs scan with a bucket equi-join.

Plan shape at scale: the query set broadcasts (small), the corpus is
scanned once; norms are computed once per vector BEFORE the join (never
per pair), and the pairwise dot runs as one Arrow-batched kernel — no
shuffle until the per-query top-k window.

Reference parity note: the reference engine (serafm/rtree_cpp) has no
similarity operators; these are the training-data-pipeline extensions
required by the task brief.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _h64(s: Column) -> Column:
    return F.conv(F.substring(F.md5(F.encode(s, "utf-8")), 1, 15), 16, 10).cast("long")


def dot_col(a: Column, b: Column) -> Column:
    """Left-fold dot product of two array<float> columns, in double.

    JVM higher-order-function form (interpreted, no codegen) — kept for
    small inputs and as the executable spec of the fold order; the hot
    paths below use the Arrow kernel twin ``_fold_dot_udf``.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def _fold_dot_udf():
    """Arrow-batched left-fold dot product: for each row,
    acc_{j+1} = acc_j + a_j * b_j in float64 — the exact same IEEE754
    operation sequence as ``dot_col`` and the DuckDB ``list_reduce``
    oracle, but vectorized ACROSS rows with numpy."""

    @F.pandas_udf("double")
    def fold_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(np.zeros(0))
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        acc = np.zeros(A.shape[0])
        for j in range(A.shape[1]):
            acc = acc + A[:, j] * B[:, j]
        return pd.Series(acc)

    return fold_dot


def cosine_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors of the first ``n_queries`` vectors.

    Output: (query_vec_id, neighbor_vec_id, cos_sim double, rank int),
    rank by (cos_sim desc, neighbor_vec_id), self excluded.

    Norms are computed once per vector on each side BEFORE the join
    (N + Q folds, not N*Q), then each candidate pair costs exactly one
    fold-dot inside one Arrow batch kernel.
    """
    fold_dot = _fold_dot_udf()
    q = F.broadcast(
        embeddings.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_vec_id"), F.col("embedding").alias("q_emb"))
        .withColumn("q_norm", F.sqrt(fold_dot(F.col("q_emb"), F.col("q_emb"))))
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_vec_id"),
        F.col("embedding").alias("n_emb"),
    ).withColumn("n_norm", F.sqrt(fold_dot(F.col("n_emb"), F.col("n_emb"))))
    scored = c.join(q, F.col("neighbor_vec_id") != F.col("query_vec_id")).withColumn(
        "cos_sim",
        fold_dot(F.col("q_emb"), F.col("n_emb")) / (F.col("q_norm") * F.col("n_norm")),
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_vec_id", "neighbor_vec_id", "cos_sim", "rank")
    )


def _fold_sqdiff_udf():
    """Arrow-batched left-fold squared L2 distance: per row,
    acc_{j+1} = acc_j + (a_j - b_j)^2 in float64 — matching the DuckDB
    ``list_reduce`` oracle's op order exactly."""

    @F.pandas_udf("double")
    def fold_sqdiff(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series(np.zeros(0))
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        acc = np.zeros(A.shape[0])
        for j in range(A.shape[1]):
            d = A[:, j] - B[:, j]
            acc = acc + d * d
        return pd.Series(acc)

    return fold_sqdiff


def embedding_neardup(embeddings: DataFrame, threshold: float = 0.4) -> DataFrame:
    """(a_vec_id, b_vec_id, cos_sim): embedding-cosine near-duplicate
    pairs, a < b — the exactness baseline of the dedup family's
    embedding lens.  All-pairs at test scale; the 100 TB path blocks by
    ``lsh_buckets`` first (same refine predicate, candidate recall < 1)."""
    fold_dot = _fold_dot_udf()
    withn = embeddings.select(
        "vec_id", "embedding"
    ).withColumn("nrm", F.sqrt(fold_dot(F.col("embedding"), F.col("embedding"))))
    a = withn.select(
        F.col("vec_id").alias("a_vec_id"), F.col("embedding").alias("a_emb"), F.col("nrm").alias("a_nrm")
    )
    b = withn.select(
        F.col("vec_id").alias("b_vec_id"), F.col("embedding").alias("b_emb"), F.col("nrm").alias("b_nrm")
    )
    pairs = a.join(b, F.col("a_vec_id") < F.col("b_vec_id")).withColumn(
        "cos_sim", fold_dot(F.col("a_emb"), F.col("b_emb")) / (F.col("a_nrm") * F.col("b_nrm"))
    )
    return pairs.where(F.col("cos_sim") >= threshold).select("a_vec_id", "b_vec_id", "cos_sim")


def _centroid_table(
    embeddings: DataFrame, n_centroids: int, centroids: DataFrame | None
):
    """Broadcast centroid table (cent_id, c_emb): the trained table when
    given, else the deterministic first-``n_centroids`` seed vectors.
    Single definition so assignment and probing can never diverge."""
    return F.broadcast(
        centroids
        if centroids is not None
        else embeddings.where(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
        )
    )


def ivf_assign(
    embeddings: DataFrame, n_centroids: int = 16, centroids: DataFrame | None = None
) -> DataFrame:
    """(vec_id, cent_id): IVF coarse quantization — nearest centroid by
    squared L2, tie-break cent_id.  Default centroids are the first
    ``n_centroids`` vectors (deterministic seeds); pass ``centroids``
    (cent_id, c_emb) — e.g. ``ivf_train`` output — for the trained
    quantizer.  At scale this is a broadcast map-side pass: N x
    n_centroids distance folds, no shuffle until the argmin window."""
    fold_sqdiff = _fold_sqdiff_udf()
    cent = _centroid_table(embeddings, n_centroids, centroids)
    scored = embeddings.select("vec_id", "embedding").crossJoin(cent).withColumn(
        "l2", fold_sqdiff(F.col("embedding"), F.col("c_emb"))
    )
    w = Window.partitionBy("vec_id").orderBy("l2", "cent_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vec_id", "cent_id")
    )


_FXP = float(1 << 30)  # fixed-point scale for order-independent mean sums


def ivf_train(embeddings: DataFrame, n_centroids: int = 16, n_iters: int = 2) -> DataFrame:
    """(cent_id, centroid array<double>): Lloyd's k-means refinement of
    the deterministic seed centroids (first ``n_centroids`` vectors),
    ``n_iters`` rounds — the training step the IVF scale path needs when
    the seed quantization drifts from the data distribution.

    Per round: centroids (driver-resident, tiny) broadcast → per-vector
    argmin assignment by (sq_l2, cent_id) → per-(centroid, dim) mean.
    The mean uses **fixed-point accumulation**: each float32 element maps
    to ``floor(v * 2^30)`` (exact — a float32's 24-bit mantissa times a
    power of two is exact in double), the int64 quantities SUM in any
    order, and one IEEE division yields the double centroid.  That makes
    the distributed mean order-independent, hence bit-identical across
    partitionings AND reproducible by the DuckDB oracle — the standard
    determinism trick for distributed float aggregation.  Empty clusters
    keep their previous centroid."""
    fold_sqdiff = _fold_sqdiff_udf()
    spark = embeddings.sparkSession
    e = embeddings.select("vec_id", "embedding")
    cent = e.where(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cent_id"),
        F.transform("embedding", lambda v: v.cast("double")).alias("c_emb"),
    )
    cent_schema = "cent_id long, c_emb array<double>"
    for _ in range(n_iters):
        bcent = F.broadcast(cent)
        w = Window.partitionBy("vec_id").orderBy("l2", "cent_id")
        asg = (
            e.crossJoin(bcent)
            .withColumn("l2", fold_sqdiff(F.col("embedding"), F.col("c_emb")))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("vec_id", "cent_id")
        )
        elem = (
            e.join(asg, "vec_id")
            .select("cent_id", F.posexplode("embedding").alias("pos", "val"))
            .withColumn("q", F.floor(F.col("val").cast("double") * F.lit(_FXP)).cast("long"))
        )
        mean = (
            elem.groupBy("cent_id", "pos")
            .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
            .select(
                "cent_id", "pos",
                (F.col("s").cast("double") / (F.col("n").cast("double") * F.lit(_FXP))).alias("v"),
            )
        )
        new_c = (
            mean.groupBy("cent_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("pv"))
            .select("cent_id", F.transform("pv", lambda x: x["v"]).alias("c_emb"))
        )
        merged = (
            cent.select("cent_id", F.col("c_emb").alias("_old"))
            .join(new_c, "cent_id", "left")
            .select("cent_id", F.coalesce("c_emb", "_old").alias("c_emb"))
        )
        # centroids are tiny and driver-resident by design: collect to
        # truncate the iteration's lineage (the "broadcast model" state)
        rows = [(r["cent_id"], list(r["c_emb"])) for r in merged.collect()]
        cent = spark.createDataFrame(rows, cent_schema)
    return cent.select("cent_id", F.col("c_emb").alias("centroid"))


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 20,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF ANN: queries probe their ``n_probe`` nearest centroid lists,
    exact cosine rank within the probed lists (recall < 1 by design) —
    the inverted-file scale path next to ``lsh_topk``.  Pass
    ``centroids`` (cent_id, c_emb) to serve from a TRAINED quantizer
    (``ivf_train`` output) — assignment and probing both use it, the
    train→serve composition of a production ANN index."""
    fold_dot = _fold_dot_udf()
    fold_sqdiff = _fold_sqdiff_udf()
    assign = ivf_assign(embeddings, n_centroids, centroids)
    emb = embeddings.join(assign, "vec_id")
    cent = _centroid_table(embeddings, n_centroids, centroids)
    qw = Window.partitionBy("query_vec_id").orderBy("l2", "cent_id")
    probes = F.broadcast(
        embeddings.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_vec_id"), F.col("embedding").alias("q_emb"))
        .crossJoin(cent)
        .withColumn("l2", fold_sqdiff(F.col("q_emb"), F.col("c_emb")))
        .withColumn("_rn", F.row_number().over(qw))
        .where(F.col("_rn") <= n_probe)
        .withColumn("q_norm", F.sqrt(fold_dot(F.col("q_emb"), F.col("q_emb"))))
        .select("query_vec_id", "q_emb", "q_norm", "cent_id")
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_vec_id"), F.col("embedding").alias("n_emb"), "cent_id"
    ).withColumn("n_norm", F.sqrt(fold_dot(F.col("n_emb"), F.col("n_emb"))))
    scored = (
        c.join(probes, "cent_id")
        .where(F.col("neighbor_vec_id") != F.col("query_vec_id"))
        .withColumn(
            "cos_sim",
            fold_dot(F.col("q_emb"), F.col("n_emb")) / (F.col("q_norm") * F.col("n_norm")),
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_vec_id", "neighbor_vec_id", "cos_sim", "rank")
    )


def _plane_matrix(n_planes: int, dim: int) -> np.ndarray:
    """±1 hyperplane components w[p][i] from md5(p ':' i) parity —
    deterministic, identical to the DuckDB oracle's CASE over
    ``('0x' || substr(md5(p ':' i), 1, 15)) % 2``."""
    w = np.empty((n_planes, dim), dtype=np.float64)
    for p in range(n_planes):
        for i in range(dim):
            h = int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:15], 16)
            w[p, i] = 1.0 if h % 2 == 1 else -1.0
    return w


def lsh_buckets(embeddings: DataFrame, n_planes: int = 8) -> DataFrame:
    """(vec_id, bucket): sign-LSH bucket id in [0, 2^n_planes).

    The plane matrix depends only on (plane, dim-index), so it is built
    ONCE per executor batch (driver-style hashlib, not per-row SQL md5)
    and the per-plane signed sums run as left folds over the array
    dimension — bit-identical to the SQL oracle's fold."""

    @F.pandas_udf("long")
    def bucket_udf(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series(np.zeros(0, dtype=np.int64))
        E = np.stack(emb.to_numpy()).astype(np.float64)
        n, dim = E.shape
        w = _plane_matrix(n_planes, dim)
        bucket = np.zeros(n, dtype=np.int64)
        for p in range(n_planes):
            acc = np.zeros(n)
            for i in range(dim):
                acc = acc + E[:, i] * w[p, i]
            bucket |= (acc >= 0).astype(np.int64) << p
        return pd.Series(bucket)

    return embeddings.select("vec_id", bucket_udf(F.col("embedding")).alias("bucket"))


def lsh_topk(embeddings: DataFrame, n_queries: int = 20, k: int = 5, n_planes: int = 4) -> DataFrame:
    """Bucketed ANN: exact cosine top-k among same-bucket candidates —
    the 100 TB path (recall < 1.0 by design; the bucket equi-join
    replaces the all-pairs scan)."""
    fold_dot = _fold_dot_udf()
    b = lsh_buckets(embeddings, n_planes)
    emb = embeddings.join(b, "vec_id")
    q = F.broadcast(
        emb.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_vec_id"), F.col("embedding").alias("q_emb"), "bucket")
        .withColumn("q_norm", F.sqrt(fold_dot(F.col("q_emb"), F.col("q_emb"))))
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_vec_id"), F.col("embedding").alias("n_emb"), "bucket"
    ).withColumn("n_norm", F.sqrt(fold_dot(F.col("n_emb"), F.col("n_emb"))))
    scored = (
        c.join(q, "bucket")
        .where(F.col("neighbor_vec_id") != F.col("query_vec_id"))
        .withColumn(
            "cos_sim",
            fold_dot(F.col("q_emb"), F.col("n_emb")) / (F.col("q_norm") * F.col("n_norm")),
        )
    )
    w = Window.partitionBy("query_vec_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_vec_id", "neighbor_vec_id", "cos_sim", "rank")
    )


def quantize_embeddings(embs: DataFrame) -> DataFrame:
    """(vec_id, pos, q, scale): symmetric int8 scalar quantization of
    each embedding — the storage/serving compression step of a vector
    pipeline (q = round(v / scale) with scale = max|v| / 127, so
    q in [-127, 127]; dequant is q * scale).

    Exactness contract: float32 → double casts are exact, max|v| is
    order-independent, and scale/quotient are single IEEE divisions, so
    q and scale are bit-identical to the DuckDB oracle with NO rounding
    anywhere.  Rounding mode is floor(x + 0.5) (half-up) spelled out
    explicitly — never the engine's round(), whose half-even/half-away
    choice differs across engines.

    Scale shape: zero shuffle — per-vector codegen expressions plus a
    posexplode; rows out = vectors x dims (the gate's driver-hashable
    long form; production would keep ``array<tinyint>``)."""
    maxabs = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))))
    t = embs.select("vec_id", "embedding", (maxabs / F.lit(127.0)).alias("scale"))
    e = t.select("vec_id", "scale", F.posexplode("embedding").alias("pos", "v"))
    q = (
        F.when(
            F.col("scale") > 0,
            F.floor(F.col("v").cast("double") / F.col("scale") + F.lit(0.5)),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    return e.select("vec_id", F.col("pos").cast("int").alias("pos"), q.alias("q"), "scale")
