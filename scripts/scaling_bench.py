#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so per the brief the same
join+tiling job runs at two parallelism levels — local[8] and local[32]
— on byte-identical input, and we report throughput at both plus
efficiency = T(32)/(4 * T(8)).

Each level runs in its own subprocess (one JVM per master).  The input
(interleaved docs with geo spans, FIXTURES.md distribution incl. the
30% hot-cluster skew) is synthesized once to a shared parquet dir by a
parallelism-independent generator, so both runs read identical bytes.

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUN_ONE = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.spatial_join import spatial_join_salted
from rtree_cpp_spark.operators.tiles import cover_tiles
from rtree_cpp_spark.sources.extract import rects_only

cpus = int(sys.argv[1]); a_dir = sys.argv[2]; b_dir = sys.argv[3]
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 16)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
grid = Grid({level})
a = rects_only(spark.read.parquet(a_dir))
b = rects_only(spark.read.parquet(b_dir))
t0 = time.perf_counter()
pairs = spatial_join_salted(a, b, grid, hot_threshold={hot_threshold}, n_salt=16,
                            sample_fraction=0.1).count()
tiles = cover_tiles(a, grid).count()
wall = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "wall_sec": wall, "pairs": pairs, "tiles": tiles,
                   "docs_per_sec": (pairs + tiles) / wall}}))
spark.stop()
"""


def synth_input(a_n: int, b_n: int, out_dir: str) -> tuple[str, str]:
    sys.path.insert(0, str(REPO))
    from pyspark.sql import SparkSession

    from rtree_cpp_spark.sources.synth import synth_docs_df_fast

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    a_dir = f"{out_dir}/docs_a"
    b_dir = f"{out_dir}/docs_b"
    synth_docs_df_fast(spark, "A", a_n, seed=42, num_partitions=64).write.mode("overwrite").parquet(a_dir)
    synth_docs_df_fast(spark, "B", b_n, seed=77, num_partitions=64).write.mode("overwrite").parquet(b_dir)
    spark.stop()
    return a_dir, b_dir


def run_level(cpus: int, a_dir: str, b_dir: str, level: int, hot_threshold: int) -> dict:
    script = RUN_ONE.format(repo=str(REPO), level=level, hot_threshold=hot_threshold)
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), a_dir, b_dir],
        capture_output=True, text=True, check=True, cwd=str(REPO),
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    res["subprocess_sec"] = round(time.perf_counter() - t0, 1)
    return res


def main() -> None:
    a_n = int(os.environ.get("SCALING_A_N", "400000"))
    b_n = int(os.environ.get("SCALING_B_N", "200000"))
    level = int(os.environ.get("SCALING_LEVEL", "7"))
    hot_threshold = int(os.environ.get("SCALING_HOT", "20000"))
    workdir = os.environ.get("SCALING_WORKDIR") or tempfile.mkdtemp(prefix="scaling_")
    a_dir, b_dir = synth_input(a_n, b_n, workdir)

    lo = run_level(8, a_dir, b_dir, level, hot_threshold)
    hi = run_level(32, a_dir, b_dir, level, hot_threshold)
    assert lo["pairs"] == hi["pairs"] and lo["tiles"] == hi["tiles"], "nondeterministic results!"
    efficiency = hi["docs_per_sec"] / (4.0 * lo["docs_per_sec"])
    summary = {
        "metric": "join_tiling_scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "local8_docs_per_sec": round(lo["docs_per_sec"], 1),
        "local32_docs_per_sec": round(hi["docs_per_sec"], 1),
        "local8_wall_sec": round(lo["wall_sec"], 2),
        "local32_wall_sec": round(hi["wall_sec"], 2),
        "pairs": lo["pairs"],
        "tiles": lo["tiles"],
        "docs_a": a_n,
        "docs_b": b_n,
        "grid_level": level,
    }
    print(json.dumps(summary))

    md = f"""# BENCH/BASELINE.md — measured sandbox numbers

Scaling criterion (BASELINE.json): throughput efficiency >= 0.8 from N to 4N
executors.  Sandbox evidence: the SAME salted spatial-join + cover-tiling job
on byte-identical synthesized input (A={a_n:,} docs, B={b_n:,} docs, seed-stable,
30% hot-cluster skew) at two parallelism levels.

| level | wall (s) | output rows (pairs+tiles) | docs/sec |
|---|---|---|---|
| local[8]  | {lo['wall_sec']:.2f} | {lo['pairs'] + lo['tiles']:,} | {lo['docs_per_sec']:,.1f} |
| local[32] | {hi['wall_sec']:.2f} | {hi['pairs'] + hi['tiles']:,} | {hi['docs_per_sec']:,.1f} |

**Scaling efficiency = throughput(local[32]) / (4 x throughput(local[8])) =
{efficiency:.3f}**

Config: grid level {level} (cell = {1024 / 2**level}), explicit hot-cell salting
(threshold {hot_threshold:,}, 16 salts) + AQE skew-join; shuffle partitions = 2x cores;
results verified identical across both levels (pairs={lo['pairs']:,}, tiles={lo['tiles']:,}).
Throughput counts output-side rows of the join+tiling job over end-to-end wall
time including shuffle, excluding one-time synthesis (BASELINE.md protocol).
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)


if __name__ == "__main__":
    main()
