#!/usr/bin/env python
"""Skewed polygon-join scale run WITH hot-cell salting live
(round 5; VERDICT r4 'Next round' #3 — the salting knobs existed since
r4 but no published run exercised them on clustered data).

Input: corner-cut octagons derived from clustered lattice rects
(CLUSTER_FRAC packed into 3 hot spots of diameter CLUSTER_DIAM — the
dense-urban-tile skew of the north_star).  Measures polygon_join
(SAT refine, Arrow kernel) unsalted vs salted on the same input, plus
the expr refine for reference; outputs are verified IDENTICAL (counts +
anti-joins) before walls are published.

Prints one JSON line -> BENCH/polygon_skew.json + BENCH/BASELINE.md.
Env: POLY_SKEW_A (default 600000), POLY_SKEW_B (300000),
CLUSTER_FRAC (0.25), CLUSTER_DIAM (32.0), POLY_HOT_THRESHOLD (5000),
SPARK_GRAFT_CPUS (16).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from rtree_cpp_spark.functions.cells import Grid  # noqa: E402
from rtree_cpp_spark.operators.pip_join import octagons_from_rects, polygon_join  # noqa: E402

from adaptive_scale_run import synth_rects_clustered  # noqa: E402

GRID = Grid(6)


def timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    n_a = int(os.environ.get("POLY_SKEW_A", "600000"))
    n_b = int(os.environ.get("POLY_SKEW_B", "300000"))
    cluster_frac = float(os.environ.get("CLUSTER_FRAC", "0.25"))
    cluster_diam = float(os.environ.get("CLUSTER_DIAM", "32.0"))
    hot_threshold = int(os.environ.get("POLY_HOT_THRESHOLD", "5000"))
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

    ops = {
        "unsalted_kernel": lambda: polygon_join(oa, ob, GRID, refine="kernel"),
        "salted_kernel": lambda: polygon_join(
            oa, ob, GRID, refine="kernel", hot_threshold=hot_threshold, n_salt=16
        ),
        "salted_expr": lambda: polygon_join(
            oa, ob, GRID, hot_threshold=hot_threshold, n_salt=16
        ),
    }
    walls: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name, make in ops.items():
        make().count()  # warm
        best = float("inf")
        for _ in range(2):
            w, n = timed_count(make())
            best = min(best, w)
            counts[name] = n
        walls[name] = best

    base = ops["unsalted_kernel"]().localCheckpoint()
    diffs = {
        name: ops[name]().join(base, ["a_doc_id", "b_doc_id"], "left_anti").count()
        for name in ("salted_kernel", "salted_expr")
    }
    if any(diffs.values()) or len(set(counts.values())) != 1:
        print(json.dumps({"error": "identity gate FAILED", "diffs": diffs, "counts": counts}))
        sys.exit(1)

    out = {
        "n_a": n_a, "n_b": n_b, "cpus": cpus,
        "cluster_frac": cluster_frac, "cluster_diam": cluster_diam,
        "hot_threshold": hot_threshold, "n_salt": 16,
        "walls_sec": walls, "output_rows": counts["unsalted_kernel"],
        "salting_speedup_x": round(walls["unsalted_kernel"] / walls["salted_kernel"], 2),
        "identity": "ok",
    }
    line = json.dumps(out)
    with open(Path(__file__).resolve().parent.parent / "BENCH" / "polygon_skew.json", "w") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
