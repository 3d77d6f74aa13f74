"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same config block is what we'd ship in
spark-defaults on a 1000-executor cluster: AQE on (runtime coalesce +
skew-join splitting), Arrow enabled for every pandas UDF boundary, and a
bounded Arrow batch size because the ``bytes`` image column makes rows heavy
(SURVEY.md §4 "chunked hashing" analog).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "auto-archiver-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    inherit_master: bool = False,
) -> SparkSession:
    """``inherit_master=True`` is the spark-submit path: the master (and
    executor topology) comes from the launcher —
    ``spark-submit --master yarn|k8s|local[N] --py-files dist/….zip`` — and
    this factory only contributes the engine config block
    (tools/submit_crawl.py)."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = SparkSession.builder.appName(app)
    if not inherit_master:
        builder = builder.master(f"local[{cores}]")
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image bytes make rows heavy: cap Arrow batches so a fetch/enrich
        # batch of 512x384 RGB rows stays well under executor memory
        # (overridable: peak per-task allocation = batch_rows x row_bytes,
        # the lever for allocation-rate-sensitive hosts)
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "256"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # image payloads are already-compressed PNG: zstd passes them through
        # cheaply where snappy/dictionary paths burn CPU on incompressible data
        .config("spark.sql.parquet.compression.codec", "zstd")
        # vectorized-reader batch rows. r8: the old global 128 (sized for the
        # legacy inline-image-bytes tables, where 4096 x ~140KB binary cells
        # allocate ~570MB of OnHeapColumnVector PER TASK) taxed every skinny
        # scan in the engine — decoding 1M-row numeric/string tables in
        # 128-row batches measured ~2x slower than the 4096 default. Default
        # back to 4096 for ordinary tables; the ONE consumer of wide-binary
        # parquet rows (run_crawl with bytes_sidecar=False, the legacy A/B
        # path) pins the small value around its own actions (plans/wave.py).
        .config(
            "spark.sql.parquet.columnarReaderBatchSize",
            os.environ.get("SPARK_GRAFT_PARQUET_BATCH", "4096"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # gate queries that *depend* on either value also pin it themselves
        # (lazy plans execute after the query fn returns, so save/restore
        # around the body can't work — per-query pinning is the deterministic
        # alternative; see q_metadata_merge / q_timestamp_format)
        .config("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
        .getOrCreate()
    )
