"""Torn-wave blob vacuum end-to-end (r6 VERDICT #6): a task dies mid-wave
with the payload sidecar on (fault-injected inside the fetch UDF), the
wave's blob files are left on disk with no committed row referencing them,
``vacuum_blobs`` reclaims exactly those orphans, and a resumed run still
fingerprints identical to an uninterrupted one — the remove_orphan_files +
time-travel-rollback semantics of an Iceberg deployment, over the flat
sidecar layout (plans/blobs.py)."""

import glob
import hashlib
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from auto_archiver_spark.plans.blobs import materialize_bytes, vacuum_blobs
from auto_archiver_spark.plans.tableio import TableIO, WaveCheckpoint
from auto_archiver_spark.plans.wave import CrawlConfig, run_crawl
from auto_archiver_spark.sources.fixture import frontier_seed_df, host_policy_df

N = 140
CFG = dict(wave_seconds=20.0, fetch_partitions=8)


def _run(spark, root, **extra):
    io, cp = TableIO(root), WaveCheckpoint(root)
    stats = run_crawl(
        spark, io, cp, frontier_seed_df(spark, N), host_policy_df(spark),
        CrawlConfig(**CFG, **extra),
    )
    return io, stats


def _fingerprint(spark, io, table, drop=()):
    df = io.read(spark, table).drop(*drop)
    cols = sorted(df.columns)
    return sorted(tuple(str(x) for x in r) for r in df.select(*cols).collect())


def _disk_blobs(root):
    return {
        os.path.relpath(p, root)
        for p in glob.glob(os.path.join(root, "blobs", "**", "*"), recursive=True)
        if os.path.isfile(p)
    }


def test_torn_wave_orphans_vacuumed_resume_identical(spark):
    root_a = tempfile.mkdtemp(prefix="aas_vac_a_")
    root_b = tempfile.mkdtemp(prefix="aas_vac_b_")
    try:
        io_a, stats_a = _run(spark, root_a)  # uninterrupted
        assert len(stats_a) >= 2  # the crash wave below must exist

        # crash mid-wave-1: blob appends land (and partial sidecars are
        # renamed into place by the writer's close hook) but no wave-1 table
        # commit ever happens
        with pytest.raises(Exception, match="injected mid-wave fetch crash"):
            _run(spark, root_b, crash_during_fetch_wave=1)
        io_b, cp_b = TableIO(root_b), WaveCheckpoint(root_b)

        # recovery rolls back to the wave-0 checkpoint
        state = cp_b.recover(io_b)
        assert state is not None and state["wave"] == 0

        # the torn wave left orphan blob files on disk
        disk = _disk_blobs(root_b)
        orphans = {p for p in disk if not p.startswith("blobs/wave=0/")}
        assert orphans, "injected crash should leave wave-1 blob orphans"
        referenced = {
            r[0]
            for r in io_b.read(spark, "images")
            .select("blob_file").filter(F.col("blob_file").isNotNull())
            .distinct().collect()
        }
        assert referenced and all(p.startswith("blobs/wave=0/") for p in referenced)

        # vacuum reclaims exactly the unreferenced files (tmp grace off: no
        # concurrent wave in this test), keeps every referenced one
        res = vacuum_blobs(spark, io_b, grace_sec=0.0)
        after = _disk_blobs(root_b)
        assert after == referenced, (after - referenced, referenced - after)
        assert res["removed"] == len(disk) - len(referenced)
        assert res["bytes_freed"] > 0

        # resume completes the crawl; every table fingerprints identical to
        # the uninterrupted run (blob refs are deterministic, so the rerun
        # wave recreates byte-identical sidecar files)
        io_b2, _ = _run(spark, root_b)
        for table in ("images", "archive_results", "url_seen", "seed_state"):
            drop = ("processed_at", "ts") if table == "archive_results" else (
                ("date",) if table == "seed_state" else ()
            )
            assert _fingerprint(spark, io_a, table, drop) == _fingerprint(
                spark, io_b2, table, drop
            ), f"table {table} differs after torn-wave resume"

        # payload integrity through the whole tear/vacuum/resume cycle:
        # re-attached bytes hash to the committed row hash
        img = materialize_bytes(
            io_b2.read(spark, "images").filter(F.col("blob_file").isNotNull()).limit(5),
            root_b,
        ).select("bytes", "sha256").collect()
        assert img
        for r in img:
            assert "SHA-256:" + hashlib.sha256(r.bytes).hexdigest() == r.sha256
    finally:
        shutil.rmtree(root_a, ignore_errors=True)
        shutil.rmtree(root_b, ignore_errors=True)
