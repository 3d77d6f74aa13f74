"""Streaming politeness state — the custom stateful-operator tier (§2.10).

The crawl loop itself is batch-iterative (north rule; plans/wave.py). This
module is the streaming twin for deployments where seeds arrive continuously:

* ``windowed_host_metrics`` — per-host arrival counts over event-time
  tumbling windows with a watermark, so late seed rows are folded in until
  the watermark passes (then dropped) — the standard late-data pattern.
* ``stateful_host_admission`` — ``applyInPandasWithState``: a per-host
  token-budget kept in GroupState across micro-batches AND across restarts
  (state lives in the streaming checkpoint). Each batch admits rows while
  the host's cumulative spend is under its budget — the streaming
  formulation of the wave driver's politeness admission (O2), with the
  budget consumed monotonically instead of per-wave.

Both consume the canonicalized seed stream from streaming/feed.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

ADMISSION_OUTPUT = StructType(
    [
        StructField("host", StringType()),
        StructField("batch_rows", LongType()),
        StructField("admitted", LongType()),
        StructField("total_spent", LongType()),
    ]
)
_STATE = StructType([StructField("spent", LongType())])


def windowed_host_metrics(
    seed_stream: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "10 minutes",
    window: str = "1 minute",
) -> DataFrame:
    """Event-time windowed per-host arrival counts with late-data handling."""
    return (
        seed_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col("host"))
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .select(F.col("w.start").alias("window_start"), "host", "n_urls")
    )


def stateful_host_admission(seed_stream: DataFrame, budget_per_host: int) -> DataFrame:
    """Per-host cumulative admission over the stream's lifetime.

    GroupState carries ``spent`` per host; a restart resumes it from the
    checkpoint — the streaming analog of the wave driver's resumable
    politeness state.
    """

    def admit(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        spent = state.get[0] if state.exists else 0
        rows = sum(len(p) for p in pdfs)
        admitted = max(0, min(budget_per_host - spent, rows))
        spent += admitted
        state.update((spent,))
        yield pd.DataFrame(
            [{"host": key[0], "batch_rows": rows, "admitted": admitted,
              "total_spent": spent}]
        )

    return seed_stream.groupBy("host").applyInPandasWithState(
        admit, ADMISSION_OUTPUT, _STATE, "append", GroupStateTimeout.NoTimeout
    )
