"""Physical-plan shape assertions — the scale contract, checked in CI:

* parquet scans get predicate pushdown + column pruning (PushedFilters /
  ReadSchema narrower than the table),
* the politeness dimension joins as BroadcastHashJoin (J5 — never shuffles
  the frontier),
* content dedup of the payload table never exchanges the bytes column,
* the URL canonicalization chain stays inside WholeStageCodegen (no Python
  in the hot path).
"""

import pytest
from pyspark.sql import functions as F

from auto_archiver_spark.operators.dedup import dedup_content_keep_first
from auto_archiver_spark.operators.frontier import canonicalize, politeness_admission, seed_filter
from auto_archiver_spark.sources.fixture import frontier_seed_df, host_policy_df, images_df

SF = "/root/testdata/sf0.001"


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_parquet_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)" in plan
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_policy_join_is_broadcast(spark):
    fr = canonicalize(seed_filter(frontier_seed_df(spark, 100)))
    adm = politeness_admission(fr, host_policy_df(spark))
    plan = _plan(adm)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1  # only the host window


def test_content_dedup_never_shuffles_bytes(spark):
    imgs = images_df(spark, 60, partitions=4).withColumn(
        "sha256", F.sha2(F.col("bytes"), 256)
    )
    deduped = dedup_content_keep_first(imgs, key="sha256", id_col="image_id")
    plan = _plan(deduped)
    # the only hash exchange is the skinny winners aggregation; the payload
    # side reaches the join through BroadcastExchange
    assert "BroadcastExchange" in plan
    sections = [
        s for s in plan.split("Exchange hashpartitioning") if "bytes" in s.split("\n")[0]
    ]
    assert not sections, "bytes column crossed a hash exchange"


def test_canonicalize_is_whole_stage_codegen(spark):
    fr = canonicalize(seed_filter(frontier_seed_df(spark, 100)))
    plan = _plan(fr, "simple")
    assert "*(" in plan  # simple mode marks WholeStageCodegen stages as *(N)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_prior_dedup_has_no_corpus_broadcast(spark, tmp_path):
    """The cross-wave content dedup must NOT broadcast the committed corpus:
    the only BroadcastExchange allowed builds from the wave-sized winner set
    (round-1 scale-killer: broadcast of every sha256 ever committed)."""
    from auto_archiver_spark.plans.tableio import TableIO

    io = TableIO(str(tmp_path))
    imgs = images_df(spark, 40, partitions=2).withColumn(
        "sha256", F.sha2(F.col("bytes"), 256)
    ).withColumn("_uid", F.xxhash64("image_id"))
    # simulate two prior committed waves of seen hashes (the skinny table)
    io.commit(imgs.limit(10).select("sha256"), "sha_seen", 0)
    io.commit(imgs.limit(20).select("sha256"), "sha_seen", 1)

    sha_seen = io.read(spark, "sha_seen")
    deduped = dedup_content_keep_first(imgs, key="sha256", id_col="_uid")
    fresh = (
        deduped.select("sha256", "_uid").join(sha_seen, "sha256", "left_anti").select("_uid")
    )
    out = deduped.join(F.broadcast(fresh), "_uid", "left_semi")
    plan = _plan(out)
    # every BroadcastExchange subtree must be wave-derived (contains the
    # anti-join), never a bare scan of the committed sha_seen snapshots
    for section in plan.split("BroadcastExchange")[1:]:
        head = section.split("\n\n")[0]
        assert "sha_seen" not in head.split("LeftAnti")[0] or "LeftAnti" in head
    # and the committed table is only ever the *probe* side of an anti-join
    assert "LeftAnti" in plan
    # bytes never cross a hash exchange here either
    sections = [
        s for s in plan.split("Exchange hashpartitioning") if "bytes" in s.split("\n")[0]
    ]
    assert not sections, "bytes column crossed a hash exchange"


def test_bloom_probe_is_bucket_aligned_no_driver_bitmaps(spark):
    """The sidecar probe plan cogroups on the bucket key (FlatMapCoGroups);
    nothing in the plan collects bitmaps to the driver, and the only
    exchanges hash on the bucket id."""
    from auto_archiver_spark.operators.bloom import BloomSidecar
    from auto_archiver_spark.operators.frontier import dedup_in_wave

    fr = dedup_in_wave(canonicalize(seed_filter(frontier_seed_df(spark, 120))))
    seen = fr.limit(30).select("url_hash")
    sidecar = BloomSidecar.build(seen, n_buckets=16)
    probed = sidecar.might_contain_col(fr)
    plan = _plan(probed, "simple")
    assert "FlatMapCoGroupsInPandas [_bucket" in plan
    # bucket-aligned: the cogroup exchanges hash on _bucket / bucket only
    cogroup_exchanges = [
        s.split("\n")[0] for s in plan.split("Exchange hashpartitioning(")[1:]
    ]
    assert any("_bucket" in s or "bucket" in s for s in cogroup_exchanges)
    # no broadcast of the sidecar, no driver-side collect in the plan
    assert "BroadcastExchange" not in plan


def test_ivf_index_scan_prunes_partitions(spark, tmp_path):
    """A persisted IVF index probe must prune at the PARTITION level — the
    scan's PartitionFilters carry the bucket predicate, so non-probed
    buckets are never listed/read."""
    from auto_archiver_spark.operators.similarity import (
        ivf_topk_from_index,
        train_centroids,
        write_ivf_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = train_centroids(emb, n_centroids=8)
    idx = str(tmp_path / "ivf")
    write_ivf_index(emb, cents, idx)
    q = list(emb.select("embedding").first()[0])
    topk = ivf_topk_from_index(spark, idx, cents, q, k=5, nprobe=2)
    plan = _plan(topk)
    part_section = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "ivf_bucket" in part_section and "in" in part_section.lower()
    assert len(topk.collect()) == 5


def test_url_query_pushdown_end_to_end(spark):
    from auto_archiver_spark.queries import q_url_canonicalize

    plan = _plan(q_url_canonicalize(spark, SF), "simple")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_seed_state_bucket_filter_prunes_partitions(spark, tmp_path):
    """The partition-replace writeback's bucket-filtered read must prune at
    the directory level (PartitionFilters in the scan), so per-wave merges
    scan O(touched buckets), not the whole seed table."""
    from auto_archiver_spark.operators.writeback import init_seed_state
    from auto_archiver_spark.plans.tableio import TableIO

    io = TableIO(str(tmp_path))
    seed = frontier_seed_df(spark, 400)
    io.commit(init_seed_state(seed), "seed_state", wave=0, mode="overwrite",
              partition_by="wb_bucket")
    pruned = io.read(spark, "seed_state").filter(F.col("wb_bucket").isin([3, 9]))
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "wb_bucket" in plan.split("PartitionFilters")[1].split("]")[0]
    # and the scan actually lists a fraction of the files
    n_all = io.read(spark, "seed_state").count()
    n_sub = pruned.count()
    assert 0 < n_sub < n_all


def test_train_centroids_runs_no_count_job(spark, monkeypatch):
    """r3 VERDICT #7: the default centroid build must not run an implicit
    full count() job before sampling — the no-fraction path takes a bounded
    head from every partition instead. Contract-asserted by making count()
    explode."""
    from pyspark.sql import DataFrame

    from auto_archiver_spark.operators.similarity import train_centroids

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    def boom(self):
        raise AssertionError("count() job inside train_centroids")

    monkeypatch.setattr(DataFrame, "count", boom)
    cents = train_centroids(emb, n_centroids=8)
    assert len(cents) == 8 and cents.shape[1] > 1


def test_robots_parse_stays_native(spark):
    """The robots.txt parse fold is pure Catalyst — no Python eval in the
    plan (policy refresh must be a narrow JVM projection at any scale)."""
    from auto_archiver_spark.queries import q_robots_parse

    plan = _plan(q_robots_parse(spark, SF), "simple")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_embedding_near_dup_no_cartesian(spark):
    """The embedding near-dup candidate stage must be a bucket equi-join —
    no CartesianProduct / BroadcastNestedLoopJoin anywhere in the plan."""
    from auto_archiver_spark.queries import q_embedding_near_dup

    plan = _plan(q_embedding_near_dup(spark, SF), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_tsq_build_stays_native(spark):
    """The RFC 3161 request build (F17 hot half — per archived row-group) is
    a constant hex skeleton around sha2(): no Python eval, no exchange —
    one WholeStageCodegen projection."""
    from auto_archiver_spark.operators.trust import timestamp_requests

    df = spark.createDataFrame(
        [(1, ["SHA-256:aa"], 7)], "url_hash long, hashes array<string>, nonce long"
    )
    plan = _plan(timestamp_requests(df), "simple")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan


def test_gdrive_upsert_single_shuffle_no_python(spark):
    """K7 folder-tree upsert: the whole find-or-create walk is prefix
    explode + distinct + anti-join — pure JVM, and the only hash exchanges
    are the distinct on the skinny prefix table (pre/post-agg of the same
    key), never a per-level loop or Python eval."""
    from auto_archiver_spark.operators.gdrive import upsert_folder_tree

    keys = spark.createDataFrame([("a/b/f.jpg",), ("a/c/g.jpg",)], "key string")
    existing = spark.createDataFrame([("a",)], "path string")
    plan = _plan(upsert_folder_tree(keys, existing), "simple")
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_curation_kernels_stay_native(spark):
    """The corpus-curation tier (c4_clean, gopher_repetition, winnowing)
    must be pure Catalyst projections — no Python eval, no exchange."""
    from auto_archiver_spark.queries import (
        q_c4_clean,
        q_gopher_repetition,
        q_winnowing,
        q_ytdlp_metadata,
    )

    for q in (q_c4_clean, q_gopher_repetition, q_winnowing, q_ytdlp_metadata):
        plan = _plan(q(spark, SF), "simple")
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, q
        assert "Exchange" not in plan, q


def test_decontaminate_broadcasts_dict_single_doc_shuffle(spark):
    """q_decontaminate's scale shape: the benchmark shingle dictionary is
    the BROADCAST side of the gram join (eval sets are tiny at any corpus
    scale); the corpus side shuffles only on doc_id for the overlap count —
    never on the exploded gram stream, and no Python eval anywhere."""
    from auto_archiver_spark.queries import q_decontaminate

    plan = _plan(q_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # exchanges: doc_id aggregations (partial/final pairs collapse to the
    # same key) — the exploded gram column must not be a shuffle key
    gram_exchanges = [
        s for s in plan.split("Exchange hashpartitioning")[1:]
        if s.split("\n")[0].lstrip("(").startswith("[g")
    ]
    assert not gram_exchanges, "gram column crossed a hash exchange"


def test_pii_and_sampling_stay_native_no_exchange(spark):
    """pii_scrub and stratified_sample are single narrow projections —
    zero exchanges, zero Python."""
    from auto_archiver_spark.queries import q_pii_scrub, q_stratified_sample

    for q in (q_pii_scrub, q_stratified_sample):
        plan = _plan(q(spark, SF), "simple")
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, q
        assert "Exchange" not in plan, q


def test_domain_rebalance_broadcasts_rates_no_corpus_shuffle(spark):
    """domain_rebalance: the k-row rate table reaches the corpus through a
    BroadcastExchange; the only hash exchange is the tiny source-count
    aggregation — the corpus itself is never shuffled, and no Python."""
    from auto_archiver_spark.queries import q_domain_rebalance

    plan = _plan(q_domain_rebalance(spark, SF), "simple")
    assert "BroadcastExchange" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # hash exchanges: the groupBy(source) partial/final agg only (the
    # window over the k-row counts runs single-partition)
    assert plan.count("Exchange hashpartitioning") <= 1
