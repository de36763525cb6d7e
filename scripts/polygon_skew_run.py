#!/usr/bin/env python
"""Skewed polygon-join scale study: salting vs mixed-resolution
ADAPTIVE cells (round 5; VERDICT r4 'Next round' #3 + the polygon
extension of #1).

Input: corner-cut octagons derived from clustered lattice rects
(CLUSTER_FRAC packed into 3 hot spots of diameter CLUSTER_DIAM — the
dense-urban-tile skew of the north_star).  The study answers, with
measurements instead of guesses:

1. does the hot-cell straggler actually bind at this config?
   ``plain`` is run with AQE skew-join ON and OFF;
2. does explicit salting re-balance it?  ``salted`` under both AQE
   settings (salting re-shards the SAME candidate pairs);
3. does SUBDIVISION beat re-sharding?  ``adaptive`` replaces hot coarse
   cells with cells ``levels_finer`` deeper, so the raw equi-join pair
   count itself SHRINKS — counted and published alongside the walls
   (``raw_candidates``: plain/salted process the identical pair set by
   construction, adaptive's is structurally smaller; ``refine_input`` —
   exactly-once bbox survivors — is identical for every variant, so the
   SAT kernel work is constant and the delta isolates the join stage).

All variants' OUTPUTS are verified identical (counts + anti-joins)
before any wall is published.  Timing protocol per BENCH/BASELINE.md:
single-thread numpy CPU controls bracket every timed pass; best-of-N
walls with per-pass detail in the artifact.

Prints one JSON line -> BENCH/polygon_skew.json (+ curated table in
BENCH/BASELINE.md).  Env: POLY_SKEW_A (default 600000), POLY_SKEW_B
(300000), CLUSTER_FRAC (0.25), CLUSTER_DIAM (32.0), POLY_HOT_THRESHOLD
(5000), POLY_LEVELS_FINER (2), POLY_SKEW_PASSES (3),
SPARK_GRAFT_CPUS (16).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from rtree_cpp_spark.functions.cells import Grid  # noqa: E402
from rtree_cpp_spark.operators.cover import with_cover_cells  # noqa: E402
from rtree_cpp_spark.operators.pip_join import octagons_from_rects, polygon_join  # noqa: E402
from rtree_cpp_spark.operators.spatial_join import adaptive_rekey  # noqa: E402

from adaptive_scale_run import synth_rects_clustered  # noqa: E402

GRID = Grid(6)


def cpu_control() -> float:
    """Single-thread numpy burn (same workload as bench.py:48) — VM
    throttle detector bracketing every timed pass."""
    import numpy as np

    a = np.arange(1_000_000, dtype=np.float64) * 1e-6
    for _ in range(5):
        a = np.sqrt(a * a + 1.0) - 1.0
    t0 = time.perf_counter()
    for _ in range(60):
        a = np.sqrt(a * a + 1.0) - 1.0
    assert a is not None
    return round(time.perf_counter() - t0, 3)


def prep_cov(df, p: str):
    """Cover-explode one octagon side with the polygon join's column
    prefixes (for candidate-count probes only — the timed runs go
    through polygon_join itself)."""
    return with_cover_cells(
        df.select(
            F.col("doc_id").alias(f"{p}doc_id"),
            F.col("min_x").alias(f"{p}min_x"), F.col("min_y").alias(f"{p}min_y"),
            F.col("max_x").alias(f"{p}max_x"), F.col("max_y").alias(f"{p}max_y"),
        ),
        GRID,
        prefix=p,
    )


def main() -> None:
    n_a = int(os.environ.get("POLY_SKEW_A", "600000"))
    n_b = int(os.environ.get("POLY_SKEW_B", "300000"))
    cluster_frac = float(os.environ.get("CLUSTER_FRAC", "0.25"))
    cluster_diam = float(os.environ.get("CLUSTER_DIAM", "32.0"))
    hot_threshold = int(os.environ.get("POLY_HOT_THRESHOLD", "5000"))
    levels_finer = int(os.environ.get("POLY_LEVELS_FINER", "2"))
    n_passes = max(2, int(os.environ.get("POLY_SKEW_PASSES", "3")))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("polygon-skew-run")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # wider rects than the adaptive run (octagons need area to intersect)
    a = synth_rects_clustered(
        spark, n_a, "pa", 23, cluster_frac, cluster_diam, max_dim=2.0
    ).localCheckpoint()
    b = synth_rects_clustered(
        spark, n_b, "pb", 71, cluster_frac, cluster_diam, max_dim=2.0
    ).localCheckpoint()
    oa, ob = octagons_from_rects(a), octagons_from_rects(b)

    def set_skew_aqe(on: bool):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true" if on else "false")

    variants = {
        # (builder, aqe_skew_on)
        "plain_aqe": (lambda: polygon_join(oa, ob, GRID, refine="kernel"), True),
        "plain_noaqe": (lambda: polygon_join(oa, ob, GRID, refine="kernel"), False),
        "salted_aqe": (
            lambda: polygon_join(
                oa, ob, GRID, refine="kernel", hot_threshold=hot_threshold, n_salt=16
            ),
            True,
        ),
        "salted_noaqe": (
            lambda: polygon_join(
                oa, ob, GRID, refine="kernel", hot_threshold=hot_threshold, n_salt=16
            ),
            False,
        ),
        "adaptive_aqe": (
            lambda: polygon_join(
                oa, ob, GRID, refine="kernel",
                hot_threshold=hot_threshold, levels_finer=levels_finer,
            ),
            True,
        ),
    }

    walls: dict[str, float] = {}
    passes: dict[str, list[float]] = {}
    counts: dict[str, int] = {}
    controls: list[float] = [cpu_control()]
    for name, (make, aqe_on) in variants.items():
        set_skew_aqe(aqe_on)
        make().count()  # warm
        ws = []
        for _ in range(n_passes):
            t0 = time.perf_counter()
            counts[name] = make().count()
            ws.append(round(time.perf_counter() - t0, 2))
            controls.append(cpu_control())
        passes[name] = ws
        walls[name] = min(ws)
    set_skew_aqe(True)

    # --- candidate-count probes (the structural story, untimed) ---
    pa, pb = prep_cov(oa, "a_"), prep_cov(ob, "b_")
    raw_plain = pa.join(pb, "cell").count()
    hot = (
        pa.groupBy("cell").agg(F.count("*").alias("_n"))
        .where(F.col("_n") > hot_threshold)
        .select("cell", F.lit(True).alias("_hot"))
    )
    n_hot = hot.count()
    raw_adaptive = (
        adaptive_rekey(pa, "a_", GRID, hot, levels_finer)
        .join(adaptive_rekey(pb, "b_", GRID, hot, levels_finer), "key")
        .count()
    )

    # --- identity gate: every variant returns the plain rows ---
    base = variants["plain_aqe"][0]().localCheckpoint()
    diffs = {
        name: variants[name][0]()
        .join(base, ["a_doc_id", "b_doc_id"], "left_anti")
        .count()
        for name in variants
        if name != "plain_aqe"
    }
    if any(diffs.values()) or len(set(counts.values())) != 1:
        print(json.dumps({"error": "identity gate FAILED", "diffs": diffs, "counts": counts}))
        sys.exit(1)

    out = {
        "n_a": n_a, "n_b": n_b, "cpus": cpus,
        "cluster_frac": cluster_frac, "cluster_diam": cluster_diam,
        "hot_threshold": hot_threshold, "n_salt": 16,
        "levels_finer": levels_finer,
        "walls_sec": walls, "walls_all_passes": passes,
        "cpu_controls_sec": controls,
        "output_rows": counts["plain_aqe"],
        "hot_cells": n_hot,
        "raw_candidates": {"plain_or_salted": raw_plain, "adaptive": raw_adaptive},
        "candidate_reduction_x": round(raw_plain / max(raw_adaptive, 1), 2),
        "salting_speedup_x": round(walls["plain_noaqe"] / walls["salted_noaqe"], 2),
        "adaptive_speedup_x": round(walls["plain_aqe"] / walls["adaptive_aqe"], 2),
        "identity": "ok",
    }
    line = json.dumps(out)
    with open(Path(__file__).resolve().parent.parent / "BENCH" / "polygon_skew.json", "w") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
