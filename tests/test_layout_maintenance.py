"""Incremental layout maintenance: upsert / delete / density re-tiling
(the distributed analog of the reference's dead-code dynamic path,
Node.cpp:53-111) — partition-local rewrites only."""

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.plans import layout

GRID = Grid(6)


@pytest.fixture()
def table(spark, rects_a_pdf, tmp_path):
    path = str(tmp_path / "tbl")
    layout.write_layout(spark.createDataFrame(rects_a_pdf), path, GRID)
    return path


def _part_files(path: str) -> dict[str, set]:
    out = {}
    for d in os.listdir(path):
        if d.startswith("coarse_cell="):
            out[d] = set(os.listdir(os.path.join(path, d)))
    return out


def test_upsert_replaces_and_inserts(spark, rects_a_pdf, table):
    mod = rects_a_pdf.head(5).copy()
    # expand symmetrically: centers (and thus cells) unchanged, geometry changed
    mod["min_x"] -= 0.25
    mod["max_x"] += 0.25
    new = pd.DataFrame(
        {
            "doc_id": ["N1", "N2", "N3"],
            "min_x": [1.0, 500.0, 900.0],
            "min_y": [1.0, 500.0, 900.0],
            "max_x": [2.0, 501.0, 901.0],
            "max_y": [2.0, 501.0, 901.0],
        }
    )
    changes = pd.concat([mod, new], ignore_index=True)
    before = _part_files(table)
    res = layout.upsert_layout(spark, spark.createDataFrame(changes), table, GRID)
    after = _part_files(table)

    got = layout.read_layout(spark, table).toPandas()
    assert len(got) == len(rects_a_pdf) + 3
    assert got["doc_id"].is_unique
    # replaced geometry is the new one
    g5 = got.set_index("doc_id").loc[mod["doc_id"]]
    assert (g5["min_x"].to_numpy() == mod.set_index("doc_id")["min_x"].to_numpy()).all()
    # only the affected coarse partitions were rewritten
    affected_dirs = {f"coarse_cell={p}" for p in res["affected_partitions"]}
    for d, files in before.items():
        if d not in affected_dirs:
            assert after[d] == files, f"untouched partition {d} was rewritten"


def test_delete_and_emptied_partition(spark, rects_a_pdf, table):
    full = layout.read_layout(spark, table).toPandas()
    # wipe one entire coarse partition + a few docs elsewhere
    victim_part = int(full["coarse_cell"].mode()[0])
    whole_part = full[full["coarse_cell"] == victim_part]
    others = full[full["coarse_cell"] != victim_part].head(4)
    to_del = pd.concat([whole_part, others])[
        ["doc_id", "min_x", "min_y", "max_x", "max_y"]
    ]
    res = layout.delete_from_layout(spark, spark.createDataFrame(to_del), table, GRID)
    assert victim_part in res["emptied_partitions"]
    got = layout.read_layout(spark, table).toPandas()
    assert len(got) == len(full) - len(to_del)
    assert not set(to_del["doc_id"]) & set(got["doc_id"])
    assert not os.path.exists(os.path.join(table, f"coarse_cell={victim_part}"))


def test_upsert_then_query_consistency(spark, rects_a_pdf, table):
    """After maintenance the layout still answers queries correctly."""
    new = pd.DataFrame(
        {
            "doc_id": ["Q1"],
            "min_x": [100.0], "min_y": [100.0], "max_x": [101.0], "max_y": [101.0],
        }
    )
    layout.upsert_layout(spark, spark.createDataFrame(new), table, GRID)
    from rtree_cpp_spark.operators.range_query import range_query

    q = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": ["R"], "min_x": [99.0], "min_y": [99.0], "max_x": [102.0], "max_y": [102.0]}
        )
    )
    data = layout.read_layout(spark, table).select(
        "doc_id", "min_x", "min_y", "max_x", "max_y"
    )
    hits = range_query(data, q, GRID).toPandas()
    assert "Q1" in set(hits["doc_id"])


def test_maybe_retile_on_drift(spark, rects_a_pdf, tmp_path):
    path = str(tmp_path / "fine")
    fine = Grid(8)
    layout.write_layout(spark.createDataFrame(rects_a_pdf), path, fine)
    # 400 docs over a 256x256 grid: median occupancy ~1 << target/band
    g2 = layout.maybe_retile(spark, path, fine, levels=[2, 3, 4, 5, 6, 7, 8])
    assert g2.level < fine.level
    got = layout.read_layout(spark, path).toPandas()
    assert sorted(got["doc_id"]) == sorted(rects_a_pdf["doc_id"])
    # within band now: a second call is a no-op returning the same grid
    g3 = layout.maybe_retile(spark, path, g2, levels=[2, 3, 4, 5, 6, 7, 8])
    assert g3.level == g2.level


def test_pruned_range_query_matches_and_prunes(spark, rects_a_pdf, table):
    """MBR-stats partition pruning (reference root-level MBR pruning,
    RTreeBulkLoad.cpp:154-156): same rows as the unpruned query, fewer
    partitions read, and the isin reaches the scan as PartitionFilters."""
    import io
    from contextlib import redirect_stdout

    from rtree_cpp_spark.operators.range_query import range_query, range_query_layout

    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "query_id": ["q0", "q1"],
                "min_x": [1.0, 200.0],
                "min_y": [1.0, 150.0],
                "max_x": [60.0, 260.0],
                "max_y": [60.0, 210.0],
            }
        )
    )
    got = range_query_layout(spark, table, queries, GRID)
    exp = range_query(
        spark.createDataFrame(rects_a_pdf), queries, GRID
    )
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, exp.collect()))
    assert g == e and len(g) > 0
    # real pruning happened (exclusion-based: some partitions proven disjoint)
    excluded = layout.excluded_partitions_for_queries(spark, table, queries.toPandas())
    total = layout.read_partition_stats(spark, table).count()
    assert 0 < len(excluded) < total
    # missing sidecar degrades to "prune nothing", never to dropped rows
    assert layout.excluded_partitions_for_queries(spark, table + "_nope", queries.toPandas()) == []
    # and it reached the scan as a partition filter (zero I/O for pruned dirs)
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain(True)
    assert "PartitionFilters" in buf.getvalue()
    assert "coarse_cell" in buf.getvalue().split("PartitionFilters", 1)[1][:400]


def test_stats_sidecar_tracks_delete(spark, rects_a_pdf, table):
    """Deleting every doc of a coarse partition drops its stats row, so
    queries over that region prune to nothing."""
    victims_cells = layout.read_layout(spark, table).where(F.col("coarse_cell") == 0)
    victims = victims_cells.select("doc_id", "min_x", "min_y", "max_x", "max_y").toPandas()
    if len(victims) == 0:
        pytest.skip("partition 0 empty in fixture")
    layout.delete_from_layout(spark, spark.createDataFrame(victims), table, GRID)
    st = layout.read_partition_stats(spark, table).toPandas()
    assert 0 not in set(st["coarse_cell"])
    # stats still consistent with data for a surviving partition
    data = layout.read_layout(spark, table).toPandas()
    p = int(st["coarse_cell"].iloc[0])
    sub = data[data["coarse_cell"] == p]
    row = st[st["coarse_cell"] == p].iloc[0]
    assert row["n_docs"] == len(sub)
    assert row["mbr_min_x"] == sub["min_x"].min()
    assert row["mbr_max_y"] == sub["max_y"].max()


def test_legacy_layout_partial_sidecar_never_drops_rows(spark, rects_a_pdf, table):
    """Upserting into a layout whose sidecar predates the stats feature
    (simulated by deleting it) leaves a PARTIAL sidecar — exclusion-based
    pruning must still return every matching row."""
    import shutil

    from rtree_cpp_spark.operators.range_query import range_query, range_query_layout

    shutil.rmtree(layout.stats_path(table))  # legacy layout: no sidecar
    mod = rects_a_pdf.head(3).copy()
    layout.upsert_layout(spark, spark.createDataFrame(mod), table, GRID)
    st = layout.read_partition_stats(spark, table).toPandas()
    data_parts = layout.read_layout(spark, table).select("coarse_cell").distinct().count()
    assert 0 < len(st) < data_parts  # sidecar really is partial
    queries = spark.createDataFrame(
        pd.DataFrame(
            {"query_id": ["all"], "min_x": [0.0], "min_y": [0.0],
             "max_x": [1024.0], "max_y": [1024.0]}
        )
    )
    got = sorted(r.doc_id for r in range_query_layout(spark, table, queries, GRID).collect())
    exp = sorted(r.doc_id for r in range_query(
        layout.read_layout(spark, table).select("doc_id", "min_x", "min_y", "max_x", "max_y"),
        queries, GRID).collect())
    assert got == exp and len(got) > 0


def test_heal_completes_interrupted_swap(spark, rects_a_pdf, table):
    """Simulate a crash between a partition dir's delete and its rename:
    the staged copy survives; heal_layout moves it in and the table is
    whole again."""
    import shutil

    full = layout.read_layout(spark, table).toPandas()
    victim = int(full["coarse_cell"].mode()[0])
    staging = layout._swap_staging(table)
    # craft the crash state: staging holds the victim's (new) data +
    # _SUCCESS; the live dir is already deleted
    os.makedirs(staging, exist_ok=True)
    open(os.path.join(staging, "_SUCCESS"), "w").close()
    shutil.move(
        os.path.join(table, f"coarse_cell={victim}"),
        os.path.join(staging, f"coarse_cell={victim}"),
    )
    assert layout.read_layout(spark, table).where(
        F.col("coarse_cell") == victim
    ).count() == 0  # partition is gone, as after the crash
    healed = layout.heal_layout(spark, table)
    assert healed == [victim]
    assert not os.path.exists(staging)
    got = layout.read_layout(spark, table).toPandas()
    assert sorted(got["doc_id"]) == sorted(full["doc_id"])
    # idempotent + no-op without staging
    assert layout.heal_layout(spark, table) == []
    # a staging dir WITHOUT _SUCCESS is a dead partial write: dropped
    os.makedirs(os.path.join(staging, "coarse_cell=9999"), exist_ok=True)
    assert layout.heal_layout(spark, table) == []
    assert not os.path.exists(staging)


def test_heal_completes_interrupted_retile(spark, rects_a_pdf, tmp_path):
    """Crash between the retile's table delete and rename: the committed
    __retiling rewrite (data + sidecar) is renamed in by heal_layout."""
    import shutil

    path = str(tmp_path / "tbl2")
    layout.write_layout(spark.createDataFrame(rects_a_pdf), path, GRID)
    full = sorted(layout.read_layout(spark, path).toPandas()["doc_id"])
    # craft the crash state: a committed retile staging, table deleted
    shutil.move(path, path + "__retiling")
    shutil.move(layout.stats_path(path), layout.stats_path(path + "__retiling"))
    assert not os.path.exists(path)
    layout.heal_layout(spark, path)
    assert sorted(layout.read_layout(spark, path).toPandas()["doc_id"]) == full
    assert os.path.exists(layout.stats_path(path))
    assert not os.path.exists(path + "__retiling")
