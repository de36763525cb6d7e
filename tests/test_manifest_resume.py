import pytest
from pyspark.sql import functions as F

from rtree_cpp_spark.functions.cells import Grid
from rtree_cpp_spark.operators.tiles import primary_tiles
from rtree_cpp_spark.plans import manifest


@pytest.fixture()
def tiles_df(spark, rects_a_pdf):
    df = primary_tiles(spark.createDataFrame(rects_a_pdf), Grid(3))
    return df


def test_resumable_write_full(spark, tiles_df, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    res = manifest.resumable_write(tiles_df, out, "cell", man, "run1", "tiles", keys_per_batch=8)
    assert res["output_rows"] == tiles_df.count()
    assert not res["skipped_keys"]
    got = spark.read.parquet(out)
    assert got.count() == tiles_df.count()
    # manifest has one done row per key
    m = manifest.read_manifest(spark, man)
    keys = tiles_df.select("cell").distinct().count()
    assert m.where(F.col("status") == "done").count() == keys


def test_resume_after_crash(spark, tiles_df, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    # crash after the first batch
    with pytest.raises(RuntimeError, match="injected failure"):
        manifest.resumable_write(
            tiles_df, out, "cell", man, "run2", "tiles", keys_per_batch=8, fail_after_batches=1
        )
    done_before = set(manifest.done_keys(spark, man, "run2", "tiles"))
    assert 0 < len(done_before) <= 8
    # resume: completed keys skipped, final output identical to a full run
    res = manifest.resumable_write(tiles_df, out, "cell", man, "run2", "tiles", keys_per_batch=8)
    assert set(res["skipped_keys"]) == done_before
    got = spark.read.parquet(out).toPandas().sort_values(["cell", "doc_id"]).reset_index(drop=True)
    exp = tiles_df.toPandas().sort_values(["cell", "doc_id"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["cell"].tolist() == exp["cell"].tolist()


def test_rerun_is_noop(spark, tiles_df, tmp_path):
    out = str(tmp_path / "out")
    man = str(tmp_path / "manifest")
    manifest.resumable_write(tiles_df, out, "cell", man, "run3", "tiles")
    res = manifest.resumable_write(tiles_df, out, "cell", man, "run3", "tiles")
    assert not res["written_keys"]
    assert res["output_rows"] == 0
