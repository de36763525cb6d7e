"""Document chunking and sequence packing for training pipelines.

- ``chunk_documents``: overlapping fixed-size token windows per doc
  (the retrieval/embedding chunking pass) — pure Column expressions.
- ``pack_sequences``: greedy bin-packing of docs into fixed token
  budgets (training batch construction).  Packing is inherently
  order-dependent, so the corpus is sharded by doc-id hash and packed
  sequentially WITHIN each shard — shards are the parallel unit, and
  the within-shard order is the content-addressed hash order (same
  result on any cluster size / partitioning, like sampling.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtree_cpp_spark.operators.sampling import h64_col


def chunk_documents(docs: DataFrame, chunk: int = 32, overlap: int = 8) -> DataFrame:
    """(doc_id, chunk_idx, n_chunk_tokens, chunk_hash): split each doc
    into token windows of ``chunk`` tokens advancing by ``chunk -
    overlap`` (so consecutive windows share ``overlap`` tokens); the
    final window may be short.  chunk_hash is the md5 of the
    space-joined window — the identity a downstream embedding/dedup
    stage keys on.

    Zero shuffle: window starts are a per-doc ``sequence`` +
    ``posexplode`` projection, entirely in codegen.  Every doc (even a
    1-token one) produces at least one chunk."""
    if not 0 <= overlap < chunk:
        raise ValueError(f"need 0 <= overlap < chunk, got {overlap=} {chunk=}")
    step = chunk - overlap
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(step))
    exploded = docs.select(
        "doc_id", toks.alias("toks"), F.posexplode(starts).alias("chunk_idx", "start")
    )
    sliced = F.slice(F.col("toks"), F.col("start") + 1, chunk)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(sliced).alias("n_chunk_tokens"),
        F.md5(F.encode(F.array_join(sliced, " "), "utf-8")).alias("chunk_hash"),
    )


def pack_sequences(
    docs: DataFrame, capacity: int = 256, n_shards: int = 8
) -> DataFrame:
    """(doc_id, shard, bin, n_tokens): greedy first-fit packing of
    whole documents into ``capacity``-token bins.

    Contract: docs are sharded by ``h64(doc_id) % n_shards``; within a
    shard they are visited in (h64, doc_id) order and appended to the
    current bin unless that would exceed ``capacity``, which opens the
    next bin.  A doc longer than ``capacity`` occupies a bin alone.
    Bin ids are per-shard and dense from 0.

    Scale shape: packing is a sequential fold, so the shard is the unit
    of parallelism — ONE shuffle (groupBy shard), then an Arrow-batched
    applyInPandas walks each shard's docs once (O(shard rows), two
    int64 columns of state).  n_shards is the packing-locality knob: at
    cluster scale set it ~ executor-core count x a few; bins never span
    shards so results stay reproducible as the cluster grows."""
    t = (
        docs.select(
            "doc_id",
            h64_col(F.col("doc_id")).alias("h"),
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
        .withColumn("shard", F.pmod(F.col("h"), F.lit(n_shards)).cast("int"))
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["h", "doc_id"]).reset_index(drop=True)
        bins, cur_bin, fill = [], 0, 0
        first = True
        for n in pdf["n_tokens"]:
            if not first and fill + n > capacity:
                cur_bin += 1
                fill = 0
            bins.append(cur_bin)
            fill += int(n)
            first = False
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "shard", "bin", "n_tokens"]]

    return t.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard int, bin long, n_tokens int"
    )
