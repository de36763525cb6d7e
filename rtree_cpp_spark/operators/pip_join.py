"""Point-in-polygon (point-in-rect) join — north_star operator.

The reference's only point-containment test is ``Rectangle::add``
(src/rtree/structures/Rectangle.cpp:29-33): **strict interior**
(``x > minX && x < maxX``, boundary excluded) — dead code there, but it
pins the intended semantics (SURVEY.md P9).  The engine exposes both
variants:

- ``boundary='closed'``: x in [min_x, max_x] — consistent with the
  closed-interval rect-rect predicate (P1, RTreeBulkLoad.h:159-163);
- ``boundary='open'``: the reference's strict-interior rule.

Plan: each point lives in exactly ONE grid cell; rects cover-explode to
their cells; candidates meet by cell equi-join and the exact predicate
refines.  Because the point's cell is unique, every true (point, rect)
pair meets in exactly one cell — **no dedup pass at all** (cheaper than
the rect-rect join's reference-point filter).  At 10^12 docs the join is
a salted SMJ on ``cell`` with the same hot-cell defenses as the spatial
join; a small point set broadcasts instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.cover import with_cover_cells
from rtree_cpp_spark.plans.parallelism import fan_out


def _with_ring_check(df: DataFrame, xs: str = "xs", ys: str = "ys") -> DataFrame:
    """Fail fast on degenerate rings: every polygon needs >= 3 vertices
    and equal-length coordinate arrays.  With an empty ring the expr
    fold's ``F.sequence(0, n-1)`` would produce a DESCENDING [0, -1] and
    ``element_at(xs, 0)`` raises a cryptic 1-based-index error at an
    arbitrary point of the plan; 1-2-vertex rings would silently
    evaluate degenerate edges.  ``assert_true`` is NULL when the
    precondition holds, so the coalesce keeps every valid row and the
    check rides the existing scan (no extra pass)."""
    ok = (F.size(F.col(xs)) >= 3) & (F.size(F.col(xs)) == F.size(F.col(ys)))
    msg = F.concat(
        F.lit("polygon ring needs >= 3 vertices and len(xs) == len(ys); got len(xs)="),
        F.size(F.col(xs)).cast("string"),
        F.lit(" len(ys)="),
        F.size(F.col(ys)).cast("string"),
    )
    return df.where(F.coalesce(F.assert_true(ok, msg), F.lit(True)))


def _id_schema(df: DataFrame, pairs: list[tuple[str, str]], extra: str = "") -> str:
    """mapInArrow output schema with id column TYPES taken from the
    input plan (not hardcoded strings), so refine='kernel' accepts
    exactly the same inputs as refine='expr' — non-string doc ids
    included.  ``pairs`` maps (input_col, output_col)."""
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    cols = ", ".join(f"{out} {by_name[src]}" for src, out in pairs)
    return cols + extra


def pip_join(
    points: DataFrame,
    rects: DataFrame,
    grid: Grid,
    boundary: str = "closed",
) -> DataFrame:
    """points(point_id, x, y) x rects(doc_id, min_x..max_y)
    → (point_id, doc_id): pairs where the point is inside the rect.
    """
    if boundary not in ("closed", "open"):
        raise ValueError(f"boundary must be 'closed' or 'open', got {boundary!r}")
    # fan_out: the exact-predicate pipeline must not inherit a 1-split
    # scan (single parquet row group = one task); no-op at real scale
    p = fan_out(points).select(
        "point_id",
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
    ).withColumn("cell", grid.cell_of_point_col(F.col("x"), F.col("y")))
    r = with_cover_cells(
        fan_out(rects).select("doc_id", "min_x", "min_y", "max_x", "max_y"), grid
    )
    if boundary == "closed":
        hit = (
            (F.col("x") >= F.col("min_x")) & (F.col("x") <= F.col("max_x"))
            & (F.col("y") >= F.col("min_y")) & (F.col("y") <= F.col("max_y"))
        )
    else:  # strict interior, Rectangle.cpp:30
        hit = (
            (F.col("x") > F.col("min_x")) & (F.col("x") < F.col("max_x"))
            & (F.col("y") > F.col("min_y")) & (F.col("y") < F.col("max_y"))
        )
    return p.join(r, "cell").where(hit).select("point_id", "doc_id")


def octagons_from_rects(rects: DataFrame, cut: float = 0.25) -> DataFrame:
    """Derive a convex CCW octagon per rect by cutting each corner at
    ``cut`` × (width, height) — a deterministic polygon fixture both the
    engine and the DuckDB oracle can rebuild from the same parquet
    columns (no external geometry data, per the input_hint).

    Output: (doc_id, xs array<double>, ys array<double>,
    min_x..max_y bbox).  Vertex arithmetic is written EXACTLY as the
    oracle writes it (``min_x + cut*(max_x-min_x)``): IEEE doubles make
    the two engines bit-identical, so boundary-point membership can
    never diverge.
    """
    c = F.lit(float(cut))
    w, h = F.col("max_x") - F.col("min_x"), F.col("max_y") - F.col("min_y")
    x_lo, x_hi = F.col("min_x") + c * w, F.col("max_x") - c * w
    y_lo, y_hi = F.col("min_y") + c * h, F.col("max_y") - c * h
    return rects.select(
        "doc_id", "min_x", "min_y", "max_x", "max_y",
        F.array(x_lo, x_hi, F.col("max_x"), F.col("max_x"),
                x_hi, x_lo, F.col("min_x"), F.col("min_x")).alias("xs"),
        F.array(F.col("min_y"), F.col("min_y"), y_lo, y_hi,
                F.col("max_y"), F.col("max_y"), y_hi, y_lo).alias("ys"),
    )


def polygon_pip_join(
    points: DataFrame,
    polygons: DataFrame,
    grid: Grid,
    id_col: str = "doc_id",
    refine: str = "expr",
    validate: bool = True,
) -> DataFrame:
    """TRUE point-in-polygon join (north_star: "point-in-polygon joins")
    — generalizes :func:`pip_join` from rects to arbitrary CONVEX
    polygons given as CCW vertex arrays.

    ``points(point_id, x, y)`` × ``polygons(id_col, xs, ys[, bbox])``
    → (point_id, id_col) pairs where the point is inside or on the
    polygon (closed boundary, consistent with the engine's P1/P3
    closed-interval convention; RTreeBulkLoad.h:159-163).

    Plan (identical scale shape to pip_join):
      1. candidate generation — polygons cover-explode on their BBOX to
         grid cells; each point hashes to its ONE cell; candidates meet
         by cell equi-join (salted SMJ at scale, exactly-once with no
         dedup because the point cell is unique);
      2. exact refine — every edge's cross product
         ``(x_j-x_i)*(py-y_i) - (y_j-y_i)*(px-x_i) >= 0`` must hold for
         a CCW convex ring, gated behind a codegen-cheap bbox test.

    ``refine`` picks the fold implementation (results IDENTICAL, the
    per-edge IEEE expression is the same — pytest-asserted):

    - ``'expr'`` (default): ``F.aggregate`` over the vertex arrays —
      zero Python, but Spark interprets higher-order functions per
      row, so the fold costs ~µs per bbox-surviving candidate;
    - ``'kernel'``: Arrow-native numpy (``mapInArrow``) — vectorizes
      the cross products across the whole candidate batch, gathering
      ragged vertex lists straight from the Arrow list buffers (no
      pandas object materialization); the scale path when bbox
      survivors are a large share of candidates.  Output id types are
      derived from the input plan, so both refine modes accept the
      same inputs.

    Precondition (both modes, checked in-plan): every ring has >= 3
    vertices and ``len(xs) == len(ys)`` — degenerate rings fail fast
    with a clear error instead of evaluating nonsense edges.
    """
    if refine not in ("expr", "kernel"):
        raise ValueError(f"refine must be 'expr' or 'kernel', got {refine!r}")
    cols = polygons.columns
    if not {"min_x", "min_y", "max_x", "max_y"}.issubset(cols):
        polygons = polygons.select(
            "*",
            F.array_min("xs").alias("min_x"), F.array_min("ys").alias("min_y"),
            F.array_max("xs").alias("max_x"), F.array_max("ys").alias("max_y"),
        )
    # ring validation attaches to the verts branch (the only branch
    # that consumes ring payloads); see polygon_join's docstring for
    # the validate tradeoff on plan-computed rings
    vg = _with_ring_check(polygons) if validate else polygons
    # fan_out: PIP refine (expr fold or Arrow kernel) runs pre-shuffle
    # on a broadcast-join pipeline — don't inherit a 1-split scan.
    # SLIM: the cell join carries the polygon id + bbox only; ring
    # payloads are re-attached by id for bbox survivors
    p = fan_out(points).select(
        "point_id",
        F.col("x").cast("double").alias("x"),
        F.col("y").cast("double").alias("y"),
    ).withColumn("cell", grid.cell_of_point_col(F.col("x"), F.col("y")))
    g = with_cover_cells(
        fan_out(polygons).select(id_col, "min_x", "min_y", "max_x", "max_y"),
        grid,
    )
    n = F.size(F.col("xs"))
    xs, ys = F.col("xs"), F.col("ys")
    px, py = F.col("x"), F.col("y")

    def edge_ok(i):
        j = F.pmod(i + F.lit(1), n) + F.lit(1)  # element_at is 1-based
        xi, yi = F.element_at(xs, i + F.lit(1)), F.element_at(ys, i + F.lit(1))
        xj, yj = F.element_at(xs, j), F.element_at(ys, j)
        return ((xj - xi) * (py - yi) - (yj - yi) * (px - xi)) >= F.lit(0.0)

    inside = F.aggregate(
        F.sequence(F.lit(0), n - F.lit(1)),
        F.lit(True),
        lambda acc, i: acc & edge_ok(i),
    )
    # bbox prefilter FIRST: the codegen-cheap rect test short-circuits
    # the expensive exact fold for the ~98% of cell candidates whose
    # bbox the point misses (measured, scripts/polygon_scale_run.py)
    bbox_hit = (
        (px >= F.col("min_x")) & (px <= F.col("max_x"))
        & (py >= F.col("min_y")) & (py <= F.col("max_y"))
    )
    cand = (
        p.join(g, "cell")
        .where(bbox_hit)
        .select("point_id", "x", "y", id_col)
        .join(vg.select(id_col, "xs", "ys"), id_col)
    )
    if refine == "expr":
        return cand.where(inside).select("point_id", id_col)
    out = cand.select(
        "point_id", "x", "y", F.col(id_col).alias("_id"), "xs", "ys"
    )
    out = out.mapInArrow(
        _pip_kernel,
        schema=_id_schema(out, [("point_id", "point_id"), ("_id", "_id")]),
    )
    return out.select("point_id", F.col("_id").alias(id_col))


def _ragged(col):
    """(lens, starts, flat) numpy views of a pyarrow ListArray.  Offsets
    are ABSOLUTE into ``.values`` even on sliced batches (probed on this
    pyarrow), so per-length stacking is one fancy-index gather over the
    flat buffer — zero per-row Python, zero pandas object churn (the
    list→object-Series→np.asarray route the first kernel used was a
    measurable share of kernel wall at 10^6 rows)."""
    import numpy as np

    offs = col.offsets.to_numpy()
    flat = col.values.to_numpy(zero_copy_only=False)
    return np.diff(offs), offs[:-1].astype(np.int64), flat


def _check_lens(lens_x, lens_y):
    """Ring-arity guard from the Arrow list offsets (already in hand —
    zero extra cost): every ring needs >= 3 vertices and equal-length
    coordinate arrays.  Runs in BOTH kernels regardless of ``validate``
    so degenerate rings can never produce silent wrong answers."""
    import numpy as np

    if lens_x.size and (lens_x.min() < 3 or not np.array_equal(lens_x, lens_y)):
        raise ValueError(
            "polygon ring needs >= 3 vertices and len(xs) == len(ys); "
            f"got min len(xs)={int(lens_x.min())}"
            + ("" if np.array_equal(lens_x, lens_y) else ", len(xs) != len(ys)")
        )


def _gather(starts, n, flat):
    """(k, n) float64 matrix: rows of length ``n`` starting at
    ``starts`` in the flat Arrow value buffer."""
    import numpy as np

    return flat[starts[:, None] + np.arange(n)[None, :]]


def _pip_kernel(batches):
    """Arrow-native PIP refine (``mapInArrow``): vectorized all-edges
    cross products over candidate rows (point_id, x, y, _id, xs, ys)
    → survivors.  Vertex lists are gathered straight from the Arrow
    list buffers (offsets + flat float64), grouped per distinct vertex
    count.  Same IEEE expression per edge as the expr variant —
    results identical."""
    import numpy as np
    import pyarrow as pa

    out_names = ["point_id", "_id"]
    for batch in batches:
        col = {n: batch.column(i) for i, n in enumerate(batch.schema.names)}
        if batch.num_rows == 0:
            yield pa.RecordBatch.from_arrays(
                [col[n] for n in out_names], names=out_names)
            continue
        px = col["x"].to_numpy(zero_copy_only=False)
        py = col["y"].to_numpy(zero_copy_only=False)
        lens, starts_x, fx = _ragged(col["xs"])
        lens_y, starts_y, fy = _ragged(col["ys"])
        _check_lens(lens, lens_y)
        keep = np.zeros(batch.num_rows, dtype=bool)
        for n in np.unique(lens):
            idx = np.nonzero(lens == n)[0]
            vx = _gather(starts_x[idx], int(n), fx)
            vy = _gather(starts_y[idx], int(n), fy)
            vxj, vyj = np.roll(vx, -1, axis=1), np.roll(vy, -1, axis=1)
            cross = (
                (vxj - vx) * (py[idx, None] - vy)
                - (vyj - vy) * (px[idx, None] - vx)
            )
            keep[idx] = (cross >= 0.0).all(axis=1)
        mask = pa.array(keep)
        yield pa.RecordBatch.from_arrays(
            [col[n].filter(mask) for n in out_names], names=out_names)


def _sat_separated(avx, avy, bvx, bvy):
    """(k,) separated flags via the SAT with a PER-AXIS short circuit:
    axes are tested one edge at a time over a SHRINKING working set —
    a pair proven separated by an earlier axis drops out of every later
    axis's arithmetic.  Most disjoint bbox-surviving pairs separate on
    the first one or two axes, so the typical cost is O(k x nQ) instead
    of the full k x nA x nB cross tensor (which the first version
    materialized before reducing — VERDICT r4 'what's wrong' #3).
    Per-element IEEE expression identical to the expr fold
    (_separated_by), so results are bit-equal."""
    import numpy as np

    k = len(avx)
    separated = np.zeros(k, dtype=bool)
    undecided = np.arange(k)
    for pvx, pvy, qvx, qvy in ((avx, avy, bvx, bvy), (bvx, bvy, avx, avy)):
        pvxj, pvyj = np.roll(pvx, -1, axis=1), np.roll(pvy, -1, axis=1)
        for e in range(pvx.shape[1]):
            if undecided.size == 0:
                return separated
            xi = pvx[undecided, e][:, None]
            yi = pvy[undecided, e][:, None]
            ex = pvxj[undecided, e][:, None] - xi
            ey = pvyj[undecided, e][:, None] - yi
            cross = ex * (qvy[undecided] - yi) - ey * (qvx[undecided] - xi)
            sep = (cross < 0.0).all(axis=1)
            separated[undecided[sep]] = True
            undecided = undecided[~sep]
    return separated


def _sat_kernel(batches):
    """Arrow-native SAT refine (``mapInArrow``) over candidate pairs
    with both rings' vertex arrays; separated ⟺ some edge of either
    ring has all other-ring vertices strictly outside (cross < 0).
    Ragged vertex lists come straight from the Arrow list buffers
    (_ragged/_gather) grouped per (nA, nB)."""
    import numpy as np
    import pyarrow as pa

    _VERT_COLS = ("a_xs", "a_ys", "b_xs", "b_ys")
    for batch in batches:
        col = {n: batch.column(i) for i, n in enumerate(batch.schema.names)}
        out_names = [n for n in batch.schema.names if n not in _VERT_COLS]
        if batch.num_rows == 0:
            yield pa.RecordBatch.from_arrays(
                [col[n] for n in out_names], names=out_names)
            continue
        lens_a, st_ax, fax = _ragged(col["a_xs"])
        lens_ay, st_ay, fay = _ragged(col["a_ys"])
        lens_b, st_bx, fbx = _ragged(col["b_xs"])
        lens_by, st_by, fby = _ragged(col["b_ys"])
        _check_lens(lens_a, lens_ay)
        _check_lens(lens_b, lens_by)
        keep = np.zeros(batch.num_rows, dtype=bool)
        for na in np.unique(lens_a):
            sel_a = lens_a == na
            for nb in np.unique(lens_b[sel_a]):
                idx = np.nonzero(sel_a & (lens_b == nb))[0]
                avx = _gather(st_ax[idx], int(na), fax)
                avy = _gather(st_ay[idx], int(na), fay)
                bvx = _gather(st_bx[idx], int(nb), fbx)
                bvy = _gather(st_by[idx], int(nb), fby)
                keep[idx] = ~_sat_separated(avx, avy, bvx, bvy)
        mask = pa.array(keep)
        yield pa.RecordBatch.from_arrays(
            [col[n].filter(mask) for n in out_names], names=out_names)


def _separated_by(xs_p, ys_p, xs_q, ys_q):
    """True iff some edge of CCW convex polygon P is a separating axis
    for polygon Q: all Q vertices strictly outside (cross < 0).  Touching
    boundaries give cross == 0 → NOT separated (closed semantics,
    consistent with the engine's closed-interval rect predicate P1)."""
    n_p = F.size(xs_p)

    def cross(i, j):
        xi, yi = F.element_at(xs_p, i + F.lit(1)), F.element_at(ys_p, i + F.lit(1))
        k = F.pmod(i + F.lit(1), n_p) + F.lit(1)
        xj, yj = F.element_at(xs_p, k), F.element_at(ys_p, k)
        qx, qy = F.element_at(xs_q, j), F.element_at(ys_q, j)
        return (xj - xi) * (qy - yi) - (yj - yi) * (qx - xi)

    return F.exists(
        F.sequence(F.lit(0), n_p - F.lit(1)),
        lambda i: F.forall(
            F.sequence(F.lit(1), F.size(xs_q)),
            lambda j: cross(i, j) < F.lit(0.0),
        ),
    )


def polygon_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    grid: Grid,
    refine: str = "expr",
    hot_threshold: int | None = None,
    n_salt: int = 16,
    levels_finer: int | None = None,
    sample_fraction: float = 1.0,
    keep_cell: bool = False,
    validate: bool = True,
) -> DataFrame:
    """Convex-polygon × convex-polygon INTERSECTION join via the
    separating-axis test — the polygon generalization of the engine's
    rect-rect spatial join (reference J1, RTreeBulkLoad.cpp:304-379).

    Inputs: (doc_id, xs, ys[, bbox]) per side, CCW convex rings.
    Output: directed (a_doc_id, b_doc_id), exactly once per
    intersecting pair (closed semantics: touching counts).

    Plan (same scale shape as the rect join):
      1. both sides cover-explode on their BBOX → cell equi-join
         (salted SMJ at scale, AQE skew backstop);
      2. exactly-once via the bbox reference-point rule fused into the
         filter — intersecting polygons have overlapping bboxes, so
         every true pair survives in exactly one cell, no distinct;
      3. cheap bbox overlap pre-filter prunes most candidates before
         the exact SAT refine.

    ``refine='expr'`` (default) evaluates the separating-axis test as
    nested exists/forall over the vertex arrays — JVM, no Python, but
    interpreted per candidate; ``refine='kernel'`` runs the identical
    per-edge IEEE cross products as an Arrow-native numpy kernel
    (mapInArrow over the raw list buffers) — the scale path when
    bbox-overlapping candidates dominate (measured 8.6x vs the rect
    join for 'expr' at 10^6 rows; scripts/polygon_scale_run.py tracks
    both).

    ``hot_threshold`` enables the rect join's hot-cell skew defenses
    (census over a seeded ``sample_fraction``):

    - ``levels_finer=None`` (default): explicit SALTING — A rows hash
      into ``n_salt`` buckets, B rows fan out.  Re-partitions the same
      candidate pairs, so output rows are identical (pytest-asserted on
      a skewed fixture; measured at 10^6-row clustered scale in
      BENCH/polygon_skew.json).
    - ``levels_finer=k``: MIXED-RESOLUTION ADAPTIVE cells — hot coarse
      cells subdivide ``k`` levels finer and candidates inside them meet
      at the fine resolution (spatial_join.adaptive_rekey), so pairs
      that never share a fine cell are never generated: the candidate
      cross-product SHRINKS structurally instead of being re-sharded.
      Exactly-once via the bbox reference-point rule evaluated at each
      row's own resolution (spatial_join.adaptive_keep_col).  This is
      the skew defense that actually pays for polygons, where each
      surviving candidate costs a SAT refine (BENCH/polygon_skew.json).

    Precondition: rings have >= 3 vertices and ``len(xs) == len(ys)``.
    With ``validate=True`` (default) the check rides the ring-payload
    scans as an in-plan fail-fast filter — cheap for STORED array
    columns (a size() over list offsets), but for PLAN-COMPUTED rings
    (e.g. octagons_from_rects) predicate pushdown inlines the whole
    CreateArray expression into the filter, which is measurably
    expensive; pass ``validate=False`` for rings a plan constructs
    with statically valid arity.  The Arrow kernel independently
    asserts ring arity from the list offsets (free), so degenerate
    rings can never produce silent wrong answers in kernel mode."""
    if refine not in ("expr", "kernel"):
        raise ValueError(f"refine must be 'expr' or 'kernel', got {refine!r}")
    if levels_finer is not None and hot_threshold is None:
        raise ValueError("levels_finer requires hot_threshold (the hot-cell census)")
    # ring validation attaches to the verts branch below (the only
    # branch that consumes ring payloads); the slim cell join never
    # touches the arrays
    va = _with_ring_check(polys_a) if validate else polys_a
    vb = _with_ring_check(polys_b) if validate else polys_b

    def prep(df: DataFrame, p: str) -> DataFrame:
        if not {"min_x", "min_y", "max_x", "max_y"}.issubset(df.columns):
            df = df.select(
                "*",
                F.array_min("xs").alias("min_x"), F.array_min("ys").alias("min_y"),
                F.array_max("xs").alias("max_x"), F.array_max("ys").alias("max_y"),
            )
        # fan_out only on the plain path: with no hot-cell census the
        # cell join typically broadcasts and the whole explode→join→
        # kernel pipeline would inherit a 1-split scan; the salted and
        # adaptive modes shuffle on their key anyway, where an extra
        # repartition is pure overhead.  SLIM: the cell join carries
        # ids + bboxes only; vertex arrays are re-attached by id AFTER
        # the bbox filter, so the join's candidate blow-up (~40x the
        # inputs at bench scale) never copies ring payloads.
        if hot_threshold is None:
            df = fan_out(df)
        return with_cover_cells(
            df.select(
                F.col("doc_id").alias(f"{p}doc_id"),
                F.col("min_x").alias(f"{p}min_x"), F.col("min_y").alias(f"{p}min_y"),
                F.col("max_x").alias(f"{p}max_x"), F.col("max_y").alias(f"{p}max_y"),
            ),
            grid,
            prefix=p,
        )

    from rtree_cpp_spark.operators.cover import ref_point_cell_col

    pa, pb = prep(polys_a, "a_"), prep(polys_b, "b_")
    rx = F.greatest(F.col("a_min_x"), F.col("b_min_x"))
    ry = F.greatest(F.col("a_min_y"), F.col("b_min_y"))
    if hot_threshold is not None:
        census_src = (
            pa
            if sample_fraction >= 1.0
            else prep(polys_a.sample(fraction=sample_fraction, seed=42), "a_")
        )
        # persist: the hot set feeds both sides' broadcast joins and
        # Spark does not reuse the exchange across them (see
        # spatial_join_salted) — cache the O(hot cells) result so the
        # census computes once.
        census = (
            census_src.groupBy("cell")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") > hot_threshold * sample_fraction)
        ).persist()
        # Empty-census fast path (see spatial_join_salted): with no hot
        # cells both the salted and adaptive paths degenerate to the
        # plain cell join — rebuild the sides through the plain prep so
        # they also regain its fan_out/broadcast-shape treatment, and
        # fall through to the unsalted branch.  Bounded planning probe
        # on the already-persisted O(hot cells) census.
        if census.isEmpty():
            hot_threshold = None
            levels_finer = None
            pa, pb = prep(polys_a, "a_"), prep(polys_b, "b_")
    if hot_threshold is not None and levels_finer is not None:
        from rtree_cpp_spark.operators.spatial_join import (
            adaptive_keep_col,
            adaptive_rekey,
        )

        hot = census.select("cell", F.lit(True).alias("_hot"))
        joined = adaptive_rekey(pa, "a_", grid, hot, levels_finer).join(
            adaptive_rekey(pb, "b_", grid, hot, levels_finer), "key"
        )
        keep = adaptive_keep_col(grid, levels_finer, rx, ry)
    elif hot_threshold is not None:
        hot = census.select("cell", F.lit(n_salt).alias("_n_salt"))
        sa = pa.join(F.broadcast(hot), "cell", "left").withColumn(
            "salt",
            F.when(F.col("_n_salt").isNull(), F.lit(0)).otherwise(
                F.pmod(F.xxhash64("a_doc_id"), F.col("_n_salt")).cast("int")
            ),
        ).drop("_n_salt")
        sb = (
            pb.join(F.broadcast(hot), "cell", "left")
            .withColumn(
                "salt",
                F.explode(
                    F.when(F.col("_n_salt").isNull(), F.array(F.lit(0))).otherwise(
                        F.sequence(F.lit(0), F.col("_n_salt") - 1)
                    )
                ),
            )
            .drop("_n_salt")
        )
        joined = sa.join(sb, ["cell", "salt"])
        keep = F.col("cell") == ref_point_cell_col(
            grid, F.col("a_min_x"), F.col("a_min_y"), F.col("b_min_x"), F.col("b_min_y")
        )
    else:
        joined = pa.join(pb, "cell")
        keep = F.col("cell") == ref_point_cell_col(
            grid, F.col("a_min_x"), F.col("a_min_y"), F.col("b_min_x"), F.col("b_min_y")
        )
    bbox_hit = (
        (F.col("a_min_x") <= F.col("b_max_x")) & (F.col("b_min_x") <= F.col("a_max_x"))
        & (F.col("a_min_y") <= F.col("b_max_y")) & (F.col("b_min_y") <= F.col("a_max_y"))
    )
    cand = joined.where(keep & bbox_hit)
    if keep_cell:
        # the COARSE reference cell in every mode — the adaptive path's
        # mixed "key" is an internal join artifact, not a lineage key
        cand = cand.withColumn("cell", grid.cell_of_point_col(rx, ry))
    out_cols = ["a_doc_id", "b_doc_id"] + (["cell"] if keep_cell else [])
    # re-attach ring payloads by id for the bbox SURVIVORS only — two
    # key joins over the (much smaller) surviving candidate set instead
    # of copying both rings through every cell-join candidate
    cand = (
        cand.select(*out_cols)
        .join(
            va.select(
                F.col("doc_id").alias("a_doc_id"),
                F.col("xs").alias("a_xs"), F.col("ys").alias("a_ys"),
            ),
            "a_doc_id",
        )
        .join(
            vb.select(
                F.col("doc_id").alias("b_doc_id"),
                F.col("xs").alias("b_xs"), F.col("ys").alias("b_ys"),
            ),
            "b_doc_id",
        )
    )
    if refine == "expr":
        sep = _separated_by(
            F.col("a_xs"), F.col("a_ys"), F.col("b_xs"), F.col("b_ys")
        ) | _separated_by(F.col("b_xs"), F.col("b_ys"), F.col("a_xs"), F.col("a_ys"))
        return cand.where(~sep).select(*out_cols)
    kin = cand.select(*out_cols, "a_xs", "a_ys", "b_xs", "b_ys")
    schema = _id_schema(
        kin,
        [("a_doc_id", "a_doc_id"), ("b_doc_id", "b_doc_id")],
        extra=", cell bigint" if keep_cell else "",
    )
    return kin.mapInArrow(_sat_kernel, schema=schema)
