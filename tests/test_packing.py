"""Chunking and sequence-packing operator tests (operators/packing.py)."""

import hashlib

import pandas as pd
import pytest

from rtree_cpp_spark.operators import packing


def test_chunk_documents_known_windows(spark):
    # 10 tokens, chunk=4, overlap=1 -> step=3: starts 0,3,6,9
    toks = [f"t{i}" for i in range(10)]
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [" ".join(toks)]}))
    rows = sorted(
        packing.chunk_documents(docs, chunk=4, overlap=1).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in rows] == [4, 4, 4, 1]  # tail window short
    expect = [toks[0:4], toks[3:7], toks[6:10], toks[9:10]]
    for r, w in zip(rows, expect):
        assert r.chunk_hash == hashlib.md5(" ".join(w).encode()).hexdigest()


def test_chunk_documents_short_doc_one_chunk(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2], "text": ["solo", "a b"]}))
    rows = packing.chunk_documents(docs, chunk=32, overlap=8).collect()
    got = {r.doc_id: r for r in rows}
    assert len(rows) == 2  # every doc yields >= 1 chunk
    assert got[1].n_chunk_tokens == 1 and got[2].n_chunk_tokens == 2


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError):
        packing.chunk_documents(docs, chunk=4, overlap=4)


def _mk_docs(spark, n_tokens_by_id):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(n_tokens_by_id),
                "text": [" ".join(["w"] * n) for n in n_tokens_by_id.values()],
            }
        )
    )


def test_pack_sequences_greedy_invariants(spark):
    docs = _mk_docs(spark, {i: 10 + (i * 37) % 90 for i in range(200)})
    out = packing.pack_sequences(docs, capacity=128, n_shards=4).toPandas()
    assert len(out) == 200 and out["doc_id"].is_unique
    assert set(out["shard"]) <= set(range(4))
    # per (shard, bin): fill <= capacity unless the bin holds one oversize doc
    fills = out.groupby(["shard", "bin"])["n_tokens"].agg(["sum", "count"])
    over = fills[fills["sum"] > 128]
    assert (over["count"] == 1).all()
    # bins dense from 0 per shard
    for _, g in out.groupby("shard"):
        bins = sorted(g["bin"].unique())
        assert bins == list(range(len(bins)))


def test_pack_sequences_oversize_doc_isolated(spark):
    docs = _mk_docs(spark, {1: 500, 2: 10, 3: 20, 4: 700})
    out = packing.pack_sequences(docs, capacity=256, n_shards=1).toPandas()
    by_doc = out.set_index("doc_id")
    for big in (1, 4):
        b = by_doc.loc[big, "bin"]
        assert (out["bin"] == b).sum() == 1  # oversize doc alone in its bin


def test_pack_sequences_partitioning_invariant(spark):
    """Same result regardless of input partitioning (the determinism
    contract: hash order within shard, not partition order)."""
    docs = _mk_docs(spark, {i: 5 + i % 60 for i in range(150)})
    a = packing.pack_sequences(docs.coalesce(1), capacity=200, n_shards=8).toPandas()
    b = packing.pack_sequences(docs.repartition(13), capacity=200, n_shards=8).toPandas()
    key = ["doc_id", "shard", "bin", "n_tokens"]
    pd.testing.assert_frame_equal(
        a[key].sort_values("doc_id").reset_index(drop=True),
        b[key].sort_values("doc_id").reset_index(drop=True),
    )
