"""Checkpoint-resume: crash after wave k, restart, final state identical to an
uninterrupted run (BASELINE.md "resume correctness"; reference analog is the
resumable gsheet status cell, gsheet_feeder_db.py:115-126)."""

import os
import shutil
import tempfile

from auto_archiver_spark.plans.tableio import TableIO, WaveCheckpoint
from auto_archiver_spark.plans.wave import CrawlConfig, run_crawl
from auto_archiver_spark.sources.fixture import frontier_seed_df, host_policy_df

N = 140
CFG = dict(wave_seconds=20.0, fetch_partitions=8)


def _table_fingerprint(spark, io, table, drop=()):
    df = io.read(spark, table).drop(*drop)
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return sorted(tuple(str(x) for x in r) for r in rows)


def _run(spark, root, stop_after=None):
    io, cp = TableIO(root), WaveCheckpoint(root)
    stats = run_crawl(
        spark,
        io,
        cp,
        frontier_seed_df(spark, N),
        host_policy_df(spark),
        CrawlConfig(**CFG),
        stop_after_wave=stop_after,
    )
    return io, cp, stats


def test_kill_and_resume_equals_uninterrupted(spark):
    root_a = tempfile.mkdtemp(prefix="aas_resume_a_")
    root_b = tempfile.mkdtemp(prefix="aas_resume_b_")
    try:
        io_a, _, _ = _run(spark, root_a)  # uninterrupted

        io_b, _, s1 = _run(spark, root_b, stop_after=0)  # "crash" after wave 0
        assert len(s1) == 1
        # simulate a torn post-crash state: an orphan snapshot dir with no
        # manifest entry must be invisible to the resumed run
        orphan = os.path.join(root_b, "images", "snap-99999")
        os.makedirs(orphan, exist_ok=True)
        io_b2, _, s2 = _run(spark, root_b)  # resume
        assert s2[0].wave == 1

        for table in ("images", "archive_results", "url_seen", "metrics", "seed_state"):
            drop = ("processed_at", "ts", "seconds", "lineage_partition") if table in (
                "archive_results",
                "metrics",
            ) else (("date",) if table == "seed_state" else ())  # date = wall clock
            assert _table_fingerprint(spark, io_a, table, drop) == _table_fingerprint(
                spark, io_b2, table, drop
            ), f"table {table} differs after resume"
    finally:
        shutil.rmtree(root_a, ignore_errors=True)
        shutil.rmtree(root_b, ignore_errors=True)


def test_recover_rolls_back_uncheckpointed_commits(spark):
    root = tempfile.mkdtemp(prefix="aas_rollback_")
    try:
        io, cp, _ = _run(spark, root, stop_after=0)
        # simulate: wave 1 committed some tables but the checkpoint never landed
        extra = io.read(spark, "url_seen").limit(1)
        io.commit(extra, "url_seen", wave=1)
        n_after_partial = io.read(spark, "url_seen").count()
        state = cp.recover(io)
        assert state["wave"] == 0
        assert io.read(spark, "url_seen").count() == n_after_partial - 1
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_resume_without_sidecar_persists_full_bloom(spark):
    """Round-2 ADVICE (high): resuming a checkpoint that predates the Bloom
    sidecar (url_seen exists, url_seen_bloom doesn't) must persist the FULL
    rebuilt sidecar, not just the wave delta — otherwise later waves probe an
    incomplete bitmap and re-admit previously-seen URLs."""
    from pyspark.sql import functions as F

    from auto_archiver_spark.operators.bloom import BloomSidecar
    from auto_archiver_spark.operators.frontier import N_BUCKETS

    root = tempfile.mkdtemp(prefix="aas_bloom_migrate_")
    try:
        io, cp = TableIO(root), WaveCheckpoint(root)
        # wave 0 ran before the sidecar existed (use_bloom off)
        run_crawl(
            spark, io, cp, frontier_seed_df(spark, N), host_policy_df(spark),
            CrawlConfig(use_bloom=False, **CFG), stop_after_wave=0,
        )
        assert io.exists("url_seen") and not io.exists("url_seen_bloom")
        # resume with the sidecar toggled on -> legacy full-build branch
        run_crawl(
            spark, io, cp, frontier_seed_df(spark, N), host_policy_df(spark),
            CrawlConfig(use_bloom=True, **CFG),
        )
        assert io.exists("url_seen_bloom")
        # every key ever admitted (incl. wave 0, pre-sidecar) must be bloom-
        # positive: probe the whole url_seen table against the persisted sidecar
        seen = io.read(spark, "url_seen").select("url_hash")
        assert seen.count() == seen.select("url_hash").distinct().count()
        bloom = BloomSidecar.from_table(io.read(spark, "url_seen_bloom"), N_BUCKETS)
        missed = bloom.might_contain_col(seen).filter(~F.col("maybe_seen")).count()
        assert missed == 0, f"{missed} url_seen keys missing from persisted sidecar"
    finally:
        shutil.rmtree(root, ignore_errors=True)
