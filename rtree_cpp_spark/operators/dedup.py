"""Deduplication operators for large-scale training-data pipelines.

Four families over a ``documents(doc_id, text, ...)`` table:

- exact          : hash-groupBy on full text
- MinHash + LSH  : shingle → 32 minhashes → 8 bands x 4 rows → band-bucket
                   self-join → candidate near-dup pairs
- SimHash        : 16-bit signed-sum signature over token hashes
- n-gram Jaccard : exact token-set similarity via token self-join

All hashing goes through ``conv(substring(md5(..),1,15),16,10)`` — pure
JVM built-ins (no UDFs), and bit-identically reproducible in ANSI SQL
(DuckDB: ``CAST('0x'||substr(md5(..),1,15) AS BIGINT)``), which is what
makes the driver's DuckDB oracle able to verify every operator.

Scale notes: the LSH band join shuffles on (band, bucket) — bounded by
band-bucket sizes, with AQE skew-split as backstop; the exact-Jaccard
self-join is quadratic per token and exists as the small-scale oracle
for the MinHash path, not the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_HASHES = 32
N_BANDS = 8
ROWS_PER_BAND = 4


def _h64(s: Column) -> Column:
    """60-bit integer hash of a string, reproducible in ANSI SQL."""
    return F.conv(F.substring(F.md5(F.encode(s, "utf-8")), 1, 15), 16, 10).cast("long")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """(text_hash, keep_id, n_copies): one row per distinct text; the
    kept doc is the minimum id (deterministic survivor pick)."""
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select(F.md5(F.encode("text", "utf-8")).alias("text_hash"), "keep_id", "n_copies")
    )


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def _shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-grams (only for docs with >= n tokens; callers filter)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(tokens) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j) for j in range(n)]
        ),
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, seed, minhash): the MinHash signature matrix.

    minhash(d, i) = min over shingles s of h64(i || ':' || s).
    """
    toks = _tokens(F.col("text"))
    shingled = (
        docs.where(F.size(toks) >= 3)
        .select("doc_id", F.explode(_shingles(toks)).alias("shingle"))
        .distinct()
    )
    seeded = shingled.withColumn("seed", F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))))
    h = _h64(F.concat_ws(":", F.col("seed").cast("string"), F.col("shingle")))
    return seeded.select("doc_id", "seed", h.alias("h")).groupBy("doc_id", "seed").agg(
        F.min("h").alias("minhash")
    )


def lsh_candidate_pairs(
    docs: DataFrame, n_bands: int = N_BANDS, rows_per_band: int = ROWS_PER_BAND
) -> DataFrame:
    """(a_doc_id, b_doc_id): distinct candidate near-dup pairs — docs
    agreeing on all minhashes of at least one band.  a < b, directed."""
    sig = minhash_signatures(docs, n_bands * rows_per_band)
    bands = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.encode(
                    F.concat_ws(
                        ":",
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
                            lambda x: x["minhash"].cast("string"),
                        ),
                    ),
                    "utf-8",
                )
            ).alias("bucket")
        )
    )
    a = bands.select(F.col("doc_id").alias("a_doc_id"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("b_doc_id"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a_doc_id") < F.col("b_doc_id"))
        .select("a_doc_id", "b_doc_id")
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash): signed-bit-sum signature over token hashes.
    Bit j is 1 iff sum over token occurrences of ±1 (per hash bit j) >= 0."""
    tok = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token"))
    h = _h64(F.col("token"))
    bitted = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        h.alias("h"),
    ).withColumn(
        "contrib",
        F.when(F.expr("shiftrightunsigned(h, j)").bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
    )
    per_bit = bitted.groupBy("doc_id", "j").agg(F.sum("contrib").alias("s"))
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(cast(1 as bigint), j)")).otherwise(0)
        ).alias("simhash")
    )


def jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """(a_doc_id, b_doc_id, jaccard): exact token-set Jaccard >= threshold.

    Quadratic-per-token self-join — the small-scale exactness baseline
    that LSH approximates.  The similarity is a single IEEE754 division
    of small integers — bit-identical across engines, no rounding."""
    toks = docs.select("doc_id", F.explode(_tokens(F.col("text"))).alias("token")).distinct()
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        toks.alias("x")
        .join(toks.alias("y"), "token")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a_doc_id"), F.col("y.doc_id").alias("b_doc_id"))
        .agg(F.count("*").alias("inter"))
    )
    j = F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a_doc_id"), F.col("n").alias("na")), "a_doc_id")
        .join(sizes.select(F.col("doc_id").alias("b_doc_id"), F.col("n").alias("nb")), "b_doc_id")
        .withColumn("jaccard", j)
        .where(F.col("jaccard") >= threshold)
        .select("a_doc_id", "b_doc_id", "jaccard")
    )
