"""Brute-force float32 oracle — the fixtures' source of truth.

The reference repo ships no tests and no data (SURVEY.md section 5), so
parity means executing the reference *semantics* exhaustively: O(N*Q)
closed-bound predicates (reference: src/rtree/builders/RTreeBulkLoad.h:
159-163), squared float32 distances (src/rtree/structures/Rectangle.h:
92-112), exact kNN with deterministic ``(sq_dist, doc_id)`` tie-break
(documented deviation from the reference's heap-order ties,
RTreeBulkLoad.cpp:284-295), and directed exactly-once join pairs
(RTreeBulkLoad.cpp:304-379).

All inputs/outputs are pandas DataFrames; geometry in float32 by default.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _rect_arrays(df: pd.DataFrame, dtype):
    return tuple(df[c].to_numpy(dtype=dtype) for c in ("min_x", "min_y", "max_x", "max_y"))


def range_brute(rects: pd.DataFrame, queries: pd.DataFrame, dtype=np.float32) -> pd.DataFrame:
    """All (query_id, doc_id) with closed-interval intersection."""
    rx0, ry0, rx1, ry1 = _rect_arrays(rects, dtype)
    qx0, qy0, qx1, qy1 = _rect_arrays(queries, dtype)
    out_q, out_d = [], []
    doc_ids = rects["doc_id"].to_numpy()
    for i in range(len(queries)):
        m = (rx1 >= qx0[i]) & (rx0 <= qx1[i]) & (ry1 >= qy0[i]) & (ry0 <= qy1[i])
        hits = doc_ids[m]
        out_q.extend([queries["query_id"].iat[i]] * len(hits))
        out_d.extend(hits)
    return pd.DataFrame({"query_id": out_q, "doc_id": out_d})


def knn_brute(rects: pd.DataFrame, queries: pd.DataFrame, dtype=np.float32) -> pd.DataFrame:
    """Exact kNN: (query_id, doc_id, sq_dist, rank) by (sq_dist, doc_id)."""
    rx0, ry0, rx1, ry1 = _rect_arrays(rects, dtype)
    doc_ids = rects["doc_id"].to_numpy()
    rows = []
    for i in range(len(queries)):
        px = dtype(queries["x"].iat[i])
        py = dtype(queries["y"].iat[i])
        k = int(queries["k"].iat[i]) if "k" in queries.columns else int(queries.attrs.get("k", 5))
        dx = np.maximum(np.maximum(rx0 - px, px - rx1), dtype(0))
        dy = np.maximum(np.maximum(ry0 - py, py - ry1), dtype(0))
        d = dx * dx + dy * dy
        order = np.lexsort((doc_ids, d))[:k]
        for rank, j in enumerate(order, start=1):
            rows.append((queries["query_id"].iat[i], doc_ids[j], float(d[j]), rank))
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "sq_dist", "rank"])


def contains_brute(rects: pd.DataFrame, queries: pd.DataFrame, dtype=np.float32) -> pd.DataFrame:
    """All (query_id, doc_id) where the query CONTAINS the doc (closed,
    reference P3 Rectangle.h:74-77 — equal rects contain)."""
    rx0, ry0, rx1, ry1 = _rect_arrays(rects, dtype)
    qx0, qy0, qx1, qy1 = _rect_arrays(queries, dtype)
    out_q, out_d = [], []
    doc_ids = rects["doc_id"].to_numpy()
    for i in range(len(queries)):
        m = (qx1[i] >= rx1) & (qx0[i] <= rx0) & (qy1[i] >= ry1) & (qy0[i] <= ry0)
        hits = doc_ids[m]
        out_q.extend([queries["query_id"].iat[i]] * len(hits))
        out_d.extend(hits)
    return pd.DataFrame({"query_id": out_q, "doc_id": out_d})


def join_brute(a: pd.DataFrame, b: pd.DataFrame, dtype=np.float32) -> pd.DataFrame:
    """Directed A→B intersection pairs, each exactly once."""
    ax0, ay0, ax1, ay1 = _rect_arrays(a, dtype)
    bx0, by0, bx1, by1 = _rect_arrays(b, dtype)
    a_ids = a["doc_id"].to_numpy()
    b_ids = b["doc_id"].to_numpy()
    out_a, out_b = [], []
    for i in range(len(a)):
        m = (bx1 >= ax0[i]) & (bx0 <= ax1[i]) & (by1 >= ay0[i]) & (by0 <= ay1[i])
        hits = b_ids[m]
        out_a.extend([a_ids[i]] * len(hits))
        out_b.extend(hits)
    return pd.DataFrame({"a_doc_id": out_a, "b_doc_id": out_b})


def tiles_brute(rects: pd.DataFrame, grid, dtype=np.float32) -> pd.DataFrame:
    """Primary-tile assignment: centroid cell — each doc in exactly one
    cell, mirroring the STR leaf property (RTreeBulkLoad.cpp:42-58)."""
    rx0, _, rx1, _ = _rect_arrays(rects, dtype)
    ry0 = rects["min_y"].to_numpy(dtype=dtype)
    ry1 = rects["max_y"].to_numpy(dtype=dtype)
    cx = (rx0 + rx1) / dtype(2)
    cy = (ry0 + ry1) / dtype(2)
    cell = grid.cell_of_point(np.asarray(cx, dtype=np.float64), np.asarray(cy, dtype=np.float64))
    return pd.DataFrame({"cell": cell, "doc_id": rects["doc_id"].to_numpy()})


def tiles_cover_brute(rects: pd.DataFrame, grid, dtype=np.float32) -> pd.DataFrame:
    """Multi-cell cover assignment (raster↔vector overlay variant)."""
    rows_c, rows_d = [], []
    ids = rects["doc_id"].to_numpy()
    for i in range(len(rects)):
        cells = grid.cover_cells_one(
            float(rects["min_x"].iat[i]),
            float(rects["min_y"].iat[i]),
            float(rects["max_x"].iat[i]),
            float(rects["max_y"].iat[i]),
        )
        rows_c.extend(cells.tolist())
        rows_d.extend([ids[i]] * len(cells))
    return pd.DataFrame({"cell": rows_c, "doc_id": rows_d})
