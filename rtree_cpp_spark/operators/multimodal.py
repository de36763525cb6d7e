"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (``decode_media`` raises NotImplementedError and
``fake_feature`` is the deterministic stand-in) — but the Spark-side
plumbing is real and tested: binary column schema, Arrow batch transfer,
mapInPandas batch shapes, and a vectorized numpy pass over the raw
bytes (per-batch, never per-row Python).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ("image", "audio", "video")

FEATURE_SCHEMA = (
    "doc_id long, kind string, n_bytes int, checksum long, feature array<float>"
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Add an opaque binary payload + typed metadata to a documents
    table.  (Synthetic: the payload is the utf-8 text bytes — stands in
    for real blobs; schema/partitioning identical to the real thing.)"""
    kind = F.element_at(F.array(*[F.lit(k) for k in MEDIA_KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        payload.alias("media"),
        F.length(payload).alias("n_bytes"),
    )


def decode_media(kind: str, payload: bytes):
    """REAL decode would dispatch to PIL/libav here — not available in
    this environment."""
    raise NotImplementedError(
        "media codecs not installed; use fake_feature() for the deterministic stub"
    )


def fake_feature(buf: np.ndarray, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector:
    byte-histogram moments, vectorized over the raw buffer."""
    if len(buf) == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(buf.astype(np.float32), dim)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def extract_features(media_df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Per Arrow batch: concatenates buffers into one numpy byte array and
    computes checksums/features with vectorized slicing — demonstrating
    the batch shape a real decoder plugs into.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["media"]]
            lens = np.array([len(b) for b in bufs], dtype=np.int64)
            flat = np.concatenate(bufs) if bufs else np.empty(0, np.uint8)
            ends = np.cumsum(lens)
            sums = np.concatenate(([0], np.cumsum(flat.astype(np.int64))))
            checksums = (sums[ends] - sums[ends - lens]) % (1 << 31)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": lens.astype("int32"),
                    "checksum": checksums,
                    "feature": [fake_feature(b, dim) for b in bufs],
                }
            )

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, kind string, n_bytes int, resized binary, resized_bytes int"


def resize_media(media_df: DataFrame, factor: int = 4) -> DataFrame:
    """mapInPandas 'resize': deterministic nearest-neighbor downsample of
    the opaque payload (every ``factor``-th byte).  A real image resize
    plugs into the same batch shape after ``decode_media``; the stride
    slice stands in so the plumbing (binary in, binary out, Arrow
    batches) is real and testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [np.frombuffer(b, dtype=np.uint8) for b in pdf["media"]]
            resized = [b[::factor].tobytes() for b in bufs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in bufs],
                    "resized": resized,
                    "resized_bytes": [len(r) for r in resized],
                }
            )

    return media_df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, kind string, frame_idx int, frame_bytes int, frame binary"


def sample_frames(media_df: DataFrame, frame_size: int = 64, every: int = 4) -> DataFrame:
    """mapInPandas frame sampling: the payload is treated as consecutive
    ``frame_size``-byte frames; every ``every``-th frame is kept — the
    video-keyframe-sampling batch shape.  Frame boundaries and kept
    indices are pure arithmetic, so the (doc_id, frame_idx, frame_bytes)
    metadata is SQL-oracle-checkable while the bytes stay opaque."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_kind, out_idx, out_len, out_frame = [], [], [], [], []
            for doc_id, kind, b in zip(
                pdf["doc_id"].astype("int64"), pdf["kind"], pdf["media"]
            ):
                buf = np.frombuffer(b, dtype=np.uint8)
                n_frames = (len(buf) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every):
                    fr = buf[i * frame_size : (i + 1) * frame_size]
                    out_doc.append(doc_id)
                    out_kind.append(kind)
                    out_idx.append(i)
                    out_len.append(len(fr))
                    out_frame.append(fr.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "kind": out_kind,
                    "frame_idx": pd.array(out_idx, dtype="int32"),
                    "frame_bytes": pd.array(out_len, dtype="int32"),
                    "frame": out_frame,
                }
            )

    return media_df.mapInPandas(run, schema=FRAME_SCHEMA)


def media_meta(docs: DataFrame) -> DataFrame:
    """SQL-checkable projection of the media metadata (gate query)."""
    m = attach_media(docs)
    return m.select("doc_id", "kind", "n_bytes")
