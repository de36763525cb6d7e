"""Deterministic stratified sampling (operators/sampling.py): quota
arithmetic, hash-order membership, reproducibility across partitioning."""

import pandas as pd

from rtree_cpp_spark.operators import sampling


def _docs(spark, n_a=100, n_b=9):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(n_a + n_b)),
            "lang": ["big"] * n_a + ["small"] * n_b,
            "text": ["w"] * (n_a + n_b),
        }
    )
    return spark.createDataFrame(pdf)


def test_quota_is_sqrt_scaled(spark):
    # big: floor(sqrt(100)*4) = 40 of 100; small: floor(sqrt(9)*4) = 12
    # > 9 -> capped at group size (rare groups kept whole)
    got = sampling.stratified_sample(_docs(spark), group_col="lang", k_scale=4).toPandas()
    by = got.groupby("lang").size().to_dict()
    assert by == {"big": 40, "small": 9}
    # ranks are 1..quota per group
    assert sorted(got[got["lang"] == "big"]["rnk"]) == list(range(1, 41))


def test_sample_membership_is_partitioning_invariant(spark):
    docs = _docs(spark)
    a = sampling.stratified_sample(docs, group_col="lang", k_scale=2).toPandas()
    b = sampling.stratified_sample(
        docs.repartition(13, "doc_id"), group_col="lang", k_scale=2
    ).toPandas()
    key = lambda d: sorted(map(tuple, d[["doc_id", "lang", "rnk"]].values.tolist()))
    assert key(a) == key(b)


def test_sample_order_is_hash_of_doc_id(spark):
    # membership must be content-addressed: dropping non-sampled docs
    # from the input cannot change the selected set's hash order
    docs = _docs(spark, n_a=20, n_b=0)
    got = sampling.stratified_sample(docs, group_col="lang", k_scale=2).toPandas()
    assert len(got) == 8  # floor(sqrt(20)*2) = 8
    picked = set(got["doc_id"])
    again = sampling.stratified_sample(
        docs.where(docs.doc_id.isin(*picked)), group_col="lang", k_scale=2
    ).toPandas()
    # the smaller input lowers the quota (floor(sqrt(8)*2) = 5) but the
    # hash order is content-addressed: the 5 survivors are exactly the
    # rnk 1..5 docs of the first run, with identical ranks
    r1 = dict(zip(got["doc_id"], got["rnk"]))
    r2 = dict(zip(again["doc_id"], again["rnk"]))
    assert set(r2) == {d for d, r in r1.items() if r <= 5}
    assert all(r1[d] == r for d, r in r2.items())
