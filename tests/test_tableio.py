"""TableIO snapshot/commit/rollback semantics (the Iceberg-contract fallback)."""

import os
import shutil
import tempfile

import pytest

from auto_archiver_spark.plans.tableio import TableIO, WaveCheckpoint


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="aas_tio_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_append_and_read(spark, root):
    io = TableIO(root)
    io.commit(spark.range(5).toDF("id"), "t", wave=0)
    io.commit(spark.range(5, 8).toDF("id"), "t", wave=1)
    assert io.read(spark, "t").count() == 8


def test_overwrite_resets_visibility(spark, root):
    io = TableIO(root)
    io.commit(spark.range(5).toDF("id"), "t", wave=0)
    io.commit(spark.range(2).toDF("id"), "t", wave=1, mode="overwrite")
    io.commit(spark.range(10, 13).toDF("id"), "t", wave=2)
    assert io.read(spark, "t").count() == 5  # 2 + 3


def test_read_or_empty(spark, root):
    io = TableIO(root)
    df = io.read_or_empty(spark, "missing", "id long")
    assert df.count() == 0 and df.columns == ["id"]
    with pytest.raises(FileNotFoundError):
        io.read(spark, "missing")


def test_rollback_drops_newer_snapshots(spark, root):
    io = TableIO(root)
    s1 = io.commit(spark.range(5).toDF("id"), "t", wave=0)
    io.commit(spark.range(3).toDF("id"), "t", wave=1)
    io.rollback_to("t", s1)
    assert io.read(spark, "t").count() == 5
    assert not os.path.exists(os.path.join(root, "t", "snap-00002"))


def test_checkpoint_recover_truncates_all_tables(spark, root):
    io, cp = TableIO(root), WaveCheckpoint(root)
    sa = io.commit(spark.range(4).toDF("id"), "a", wave=0)
    sb = io.commit(spark.range(6).toDF("id"), "b", wave=0)
    cp.commit_wave(0, {"a": sa, "b": sb})
    io.commit(spark.range(99).toDF("id"), "a", wave=1)  # un-checkpointed
    state = cp.recover(io)
    assert state["wave"] == 0
    assert io.read(spark, "a").count() == 4
    assert io.read(spark, "b").count() == 6


def test_orphan_dir_invisible(spark, root):
    io = TableIO(root)
    io.commit(spark.range(4).toDF("id"), "t", wave=0)
    os.makedirs(os.path.join(root, "t", "snap-00999"))
    assert io.read(spark, "t").count() == 4
