#!/usr/bin/env python
"""Skewed-data scale evidence for the MIXED-RESOLUTION adaptive join
(round 5; VERDICT r4 'Next round' #1).

Salting re-shards a hot cell's nA x nB candidate cross-product over more
tasks but cannot shrink it; subdividing hot cells ``levels_finer``
deeper makes candidates meet at a finer resolution, so pairs that never
share a fine cell are never generated.  This run measures exactly that
on clustered data:

- candidate pairs BEFORE the exact refine, plain/salted key (identical
  counts — salting only re-keys) vs adaptive mixed keys;
- end-to-end walls for spatial_join (AQE only), spatial_join_salted,
  and spatial_join_adaptive on the same input;
- identity: all three variants' outputs are verified equal (counts +
  anti-joins) before any wall is published.

Input: deterministic lattice rects, ``CLUSTER_FRAC`` of them packed
into 3 hot spots of diameter ``CLUSTER_DIAM`` (dense-urban-tile skew,
north_star), the rest uniform over [0,1024)^2 — Spark-native exprs of
the row id, identical at any parallelism.

Prints one JSON line; curated results go to BENCH/adaptive_scale.json
and BENCH/BASELINE.md.  Env: ADAPT_SCALE_A (default 1000000),
ADAPT_SCALE_B (500000), CLUSTER_FRAC (0.2), CLUSTER_DIAM (24.0),
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
from rtree_cpp_spark.operators.spatial_join import (  # noqa: E402
    _a_side,
    _adaptive_candidates,
    _b_side,
    spatial_join,
    spatial_join_adaptive,
    spatial_join_salted,
)

GRID = Grid(6)  # 64x64 cells of 16.0 over [0,1024)^2 (gate grid)
CLUSTERS = ((200.0, 200.0), (600.0, 500.0), (850.0, 850.0))


def synth_rects_clustered(
    spark: SparkSession, n: int, prefix: str, seed: int,
    cluster_frac: float, cluster_diam: float, max_dim: float = 1.0,
):
    """Lattice rects, ``cluster_frac`` packed into 3 hot spots."""
    def u(s):  # uniform [0,1) from the row id, lattice-safe
        return F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(s)), 1_000_000) / 1e6

    ux = F.floor(u(seed + 2) * 4000) * F.lit(0.25)
    uy = F.floor(u(seed + 3) * 4000) * F.lit(0.25)
    ci = F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(seed + 4)), 3)
    ccx = (
        F.when(ci == 0, CLUSTERS[0][0]).when(ci == 1, CLUSTERS[1][0]).otherwise(CLUSTERS[2][0])
    )
    ccy = (
        F.when(ci == 0, CLUSTERS[0][1]).when(ci == 1, CLUSTERS[1][1]).otherwise(CLUSTERS[2][1])
    )
    off_x = F.floor((u(seed + 5) - 0.5) * cluster_diam * 4) * F.lit(0.25)
    off_y = F.floor((u(seed + 6) - 0.5) * cluster_diam * 4) * F.lit(0.25)
    is_cl = u(seed + 1) < F.lit(cluster_frac)
    x = F.when(is_cl, ccx + off_x).otherwise(ux)
    y = F.when(is_cl, ccy + off_y).otherwise(uy)
    w = (F.pmod(F.col("id"), int(max_dim * 4)) + 1).cast("double") * 0.25
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("doc_id"),
        x.alias("min_x"), y.alias("min_y"),
        (x + w).alias("max_x"), (y + w).alias("max_y"),
    )


def timed_count(df) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    n_a = int(os.environ.get("ADAPT_SCALE_A", "1000000"))
    n_b = int(os.environ.get("ADAPT_SCALE_B", "500000"))
    cluster_frac = float(os.environ.get("CLUSTER_FRAC", "0.2"))
    cluster_diam = float(os.environ.get("CLUSTER_DIAM", "24.0"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    hot_threshold = int(os.environ.get("ADAPT_HOT_THRESHOLD", "5000"))
    levels_finer = int(os.environ.get("ADAPT_LEVELS_FINER", "3"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("adaptive-scale-run")
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    a = synth_rects_clustered(spark, n_a, "aa", 23, cluster_frac, cluster_diam).localCheckpoint()
    b = synth_rects_clustered(spark, n_b, "bb", 71, cluster_frac, cluster_diam).localCheckpoint()

    # candidate pairs pre-refine: the structural quantity subdivision
    # shrinks and salting cannot (salting re-keys the SAME pairs)
    plain_cand = _a_side(a, GRID).join(_b_side(b, GRID), "cell").count()
    adapt_cand = _adaptive_candidates(
        a, b, GRID, hot_threshold=hot_threshold, levels_finer=levels_finer
    ).count()

    ops = {
        "plain": lambda: spatial_join(a, b, GRID),
        "salted": lambda: spatial_join_salted(
            a, b, GRID, hot_threshold=hot_threshold, n_salt=16
        ),
        "adaptive": lambda: spatial_join_adaptive(
            a, b, GRID, hot_threshold=hot_threshold, levels_finer=levels_finer
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

    # identity gate: every variant emits the same pair set
    base = ops["plain"]().localCheckpoint()
    diffs = {
        name: ops[name]().join(base, ["a_doc_id", "b_doc_id"], "left_anti").count()
        for name in ("salted", "adaptive")
    }
    same_counts = len(set(counts.values())) == 1
    if any(diffs.values()) or not same_counts:
        print(json.dumps({"error": "identity gate FAILED", "diffs": diffs, "counts": counts}))
        sys.exit(1)

    out = {
        "n_a": n_a, "n_b": n_b, "cpus": cpus,
        "cluster_frac": cluster_frac, "cluster_diam": cluster_diam,
        "hot_threshold": hot_threshold, "levels_finer": levels_finer,
        "candidate_pairs_plain_or_salted": plain_cand,
        "candidate_pairs_adaptive": adapt_cand,
        "candidate_reduction_x": round(plain_cand / max(adapt_cand, 1), 2),
        "walls_sec": walls, "output_rows": counts["plain"],
        "identity": "ok",
    }
    line = json.dumps(out)
    with open(Path(__file__).resolve().parent.parent / "BENCH" / "adaptive_scale.json", "w") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
