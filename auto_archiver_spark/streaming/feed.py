"""Structured Streaming ingest for seed rows (engine addition).

The reference is purely batch/sequential — no watermarks, windows, or
stateful streaming exist anywhere in it (SURVEY.md §2.9), and the north rule
demands a *batch-iterative* frontier, so the crawl loop itself stays batch
(plans/wave.py). This module covers the complementary ingest path: seed rows
arriving continuously (a live Google-Sheet poller / queue in production,
a file source here) are canonicalized incrementally and appended to a staging
table that the next wave picks up.

``foreachBatch`` is the deliberate sink choice: each micro-batch reuses the
exact batch canonicalization (operators/frontier.py) and commits through the
same TableIO snapshot layer — one code path, two arrival modes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators.frontier import canonicalize, seed_filter
from ..sources.fixture import FRONTIER_SEED_SCHEMA

STAGING_TABLE = "frontier_staging"


def stream_seed_ingest(
    spark: SparkSession,
    input_dir: str,
    io,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """readStream(csv seed files) -> filter+canonicalize -> TableIO staging.

    Returns the StreamingQuery. With ``trigger_once`` the query drains the
    backlog and stops — the mode a wave driver would call between waves.
    """
    raw = (
        spark.readStream.schema(FRONTIER_SEED_SCHEMA)
        .option("header", "true")
        .csv(input_dir)
    )
    canon = canonicalize(seed_filter(raw.fillna({"status": "", "url": ""})))

    def sink(batch_df, batch_id: int):
        if not batch_df.isEmpty():
            io.commit(
                batch_df.withColumn("ingest_batch", F.lit(batch_id)),
                STAGING_TABLE,
                wave=-1,
            )

    writer = canon.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
