"""Deterministic corpus sampling / source-mixing for training-data
pipelines: temperature-style stratified downsampling with a
hash-ordered, fully reproducible per-group sample.

Why not ``df.sample``: training-data mixing must be REPRODUCIBLE and
content-addressed (the same doc set at every re-run, on any cluster
size, under any partitioning), so the sample order is a cryptographic
hash of the key, never an RNG stream tied to partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def h64_col(c) -> F.Column:
    """60-bit integer from md5 — the deterministic sort key used across
    the engine (same arithmetic as text_analysis.fingerprint.fp64 and
    the DuckDB twin CAST('0x' || substr(md5(..), 1, 15) AS BIGINT))."""
    h = F.md5(F.encode(c.cast("string"), "utf-8"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def stratified_sample(
    docs: DataFrame, group_col: str = "lang", k_scale: int = 4
) -> DataFrame:
    """(doc_id, group, rnk): temperature-flattened stratified sample —
    per group g keep the ``min(c_g, floor(sqrt(c_g) * k_scale))``
    documents with the smallest hash.  sqrt-of-count quotas are the
    alpha=0.5 temperature-sampling rule (multilingual/source mixing in
    public LLM recipes: rare groups are kept nearly whole, huge groups
    are flattened toward sqrt growth).

    Determinism contract: the quota uses only floor/sqrt on integer
    counts (no cross-group float normalization sum, whose addition
    order would differ between engines), and sample membership is the
    md5-hash order of doc_id with doc_id itself as tiebreak — exactly
    reproducible in the DuckDB oracle.

    Scale shape: group counts are one tiny aggregate (broadcast back);
    per-group selection is a row_number window — one shuffle on the
    group key.  A dominant group makes that window skewed; the scale
    alternative (documented, same semantics only when quotas are
    fractions) is a hash-threshold filter ``h64 < quota/c_g * 2^60``
    which needs no sort at all — kept as the window form here because
    exact quota counts are the contract the gate verifies."""
    counts = docs.groupBy(group_col).agg(F.count("*").alias("c_g"))
    quota = F.least(
        F.col("c_g"), F.floor(F.sqrt(F.col("c_g").cast("double")) * float(k_scale))
    ).alias("quota")
    quotas = counts.select(group_col, quota)
    w = Window.partitionBy(group_col).orderBy(h64_col(F.col("doc_id")), F.col("doc_id"))
    ranked = docs.select("doc_id", group_col).withColumn(
        "rnk", F.row_number().over(w).cast("int")
    )
    return (
        ranked.join(F.broadcast(quotas), group_col)
        .where(F.col("rnk") <= F.col("quota"))
        .select("doc_id", group_col, "rnk")
    )
