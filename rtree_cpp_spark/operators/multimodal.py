"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no codec libraries (PIL/libav), so *general* decode
is out of scope — but ``decode_media`` is a REAL pure-numpy decoder for
three self-describing formats (RIFF/WAV PCM-16, BMP 24-bit, and a
trivial VID0 frame container) that the synthesizer emits as genuine
bytes, proving the decode path (header parsing, row padding,
endianness) end-to-end against a closed-form SQL oracle.  The rest of
the plumbing is the production shape: binary column schema, Arrow batch
transfer, mapInPandas batch kernels, vectorized numpy passes.
"""

from __future__ import annotations

import struct
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


def decode_media(kind: str, payload: bytes) -> dict:
    """REAL decode for the three self-describing formats the synthesizer
    emits — pure python/numpy, no codec libraries:

    - WAV (RIFF/PCM 16-bit): chunk walk → (sample_rate, n_samples) +
      int16 sample array,
    - BMP (24-bit uncompressed): header parse → (width, height) + pixel
      bytes with the 4-byte row padding stripped,
    - VID0 (trivial frame container): (frame_size, n_frames) + frame
      bytes.

    Arbitrary codecs (JPEG/H.264/...) would dispatch to PIL/libav here
    and stay out of scope in this environment; these formats prove the
    decode path end-to-end (header parsing, padding, endianness) against
    a closed-form oracle.  Returns {meta_a, meta_b, content} where
    content is the decoded numeric payload (samples / pixel bytes /
    frame bytes)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, sample_rate, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            if pos + 8 + size > len(payload):
                raise ValueError("truncated chunk")
            if cid == b"fmt ":
                fmt, channels, sample_rate = struct.unpack_from("<HHI", payload, pos + 8)
                if fmt != 1 or channels != 1:
                    raise ValueError("only PCM mono supported")
            elif cid == b"data":
                data = np.frombuffer(payload, dtype="<i2", count=size // 2, offset=pos + 8)
            pos += 8 + size + (size & 1)
        if sample_rate is None or data is None:
            raise ValueError("malformed WAV: missing fmt or data chunk")
        return {"meta_a": int(sample_rate), "meta_b": len(data), "content": data}
    if payload[:2] == b"BM":
        (data_off,) = struct.unpack_from("<I", payload, 10)
        hdr_size, width, height, _planes, bpp = struct.unpack_from("<IiiHH", payload, 14)
        if bpp != 24 or hdr_size < 40:
            raise ValueError("only 24-bit BI_RGB supported")
        height = abs(height)
        row_bytes = width * 3
        stride = (row_bytes + 3) & ~3
        rows = [
            np.frombuffer(payload, np.uint8, count=row_bytes, offset=data_off + y * stride)
            for y in range(height)
        ]
        return {"meta_a": width, "meta_b": height, "content": np.concatenate(rows) if rows else np.empty(0, np.uint8)}
    if payload[:4] == b"VID0":
        frame_size, n_frames = struct.unpack_from("<II", payload, 4)
        body = np.frombuffer(payload, np.uint8, count=frame_size * n_frames, offset=12)
        return {"meta_a": int(frame_size), "meta_b": int(n_frames), "content": body}
    raise ValueError("unknown media container")


# ---------------------------------------------------------------------------
# Real-format synthesis: deterministic WAV / BMP / VID0 bytes per doc_id
# (pure integer arithmetic, so a SQL oracle can recompute every decoded
# field and content sum in closed form)
# ---------------------------------------------------------------------------


def _wav_bytes(doc_id: int) -> bytes:
    sr = 8000 + (doc_id % 8) * 1000
    n = 64 + doc_id % 128
    i = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 31 + i * 7) % 4096 - 2048).astype("<i2")
    data = samples.tobytes()
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _bmp_bytes(doc_id: int) -> bytes:
    w, h = 4 + doc_id % 13, 3 + doc_id % 9
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    c = np.arange(3, dtype=np.int64)
    px = (
        (doc_id + 3 * x[None, :, None] + 7 * y[:, None, None] + 11 * c[None, None, :]) % 256
    ).astype(np.uint8)
    body = b"".join(px[yy].tobytes() + b"\x00" * pad for yy in range(h))
    data_size = (row_bytes + pad) * h
    return (
        b"BM" + struct.pack("<IHHI", 54 + data_size, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
        + body
    )


def _vid_bytes(doc_id: int) -> bytes:
    frames, fsize = 1 + doc_id % 7, 32
    j = np.arange(frames * fsize, dtype=np.int64)
    return b"VID0" + struct.pack("<II", fsize, frames) + ((doc_id + j) % 256).astype(np.uint8).tobytes()


_SYNTH_BY_KIND = {"audio": _wav_bytes, "image": _bmp_bytes, "video": _vid_bytes}


def attach_real_media(docs: DataFrame) -> DataFrame:
    """Like :func:`attach_media` but the payload is REAL decodable bytes
    (WAV for audio docs, BMP for image docs, VID0 for video docs) built
    deterministically from doc_id in an Arrow-batched kernel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            kinds = [MEDIA_KINDS[int(d) % 3] for d in ids]
            media = [_SYNTH_BY_KIND[k](int(d)) for k, d in zip(kinds, ids)]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "kind": kinds,
                    "media": media,
                    "n_bytes": pd.array([len(m) for m in media], dtype="int32"),
                }
            )

    return docs.select("doc_id").mapInPandas(
        run, schema="doc_id long, kind string, media binary, n_bytes int"
    )


DECODE_SCHEMA = "doc_id long, kind string, meta_a int, meta_b int, content_sum long"


def decode_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas over binary payloads running the REAL decoder: emits
    the decoded header fields and the int64 sum of the decoded content
    (samples / pixel bytes / frame bytes) — every field recomputable in
    closed form by the SQL oracle, so decode correctness (chunk walk,
    BMP row padding, little-endian int16 samples) is gate-verified."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "kind": [], "meta_a": [], "meta_b": [], "content_sum": []}
            for doc_id, kind, b in zip(pdf["doc_id"].astype("int64"), pdf["kind"], pdf["media"]):
                d = decode_media(kind, bytes(b))
                rows["doc_id"].append(doc_id)
                rows["kind"].append(kind)
                rows["meta_a"].append(d["meta_a"])
                rows["meta_b"].append(d["meta_b"])
                rows["content_sum"].append(int(d["content"].astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": rows["doc_id"],
                    "kind": rows["kind"],
                    "meta_a": pd.array(rows["meta_a"], dtype="int32"),
                    "meta_b": pd.array(rows["meta_b"], dtype="int32"),
                    "content_sum": rows["content_sum"],
                }
            )

    return media_df.mapInPandas(run, schema=DECODE_SCHEMA)


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
