"""K3 API sink — POST one JSON document per archive result, with acks.

Reference: modules/api_db/api_db.py:14-57 — ``done()`` POSTs the result JSON
to an HTTP endpoint (auth header, per-result payload); ``fetch()`` (the
cache-read path) is the J2 cached-merge, covered by the anti-join/coalesce
operators.

Spark design: the classic ``foreachPartition`` HTTP-sink idiom, upgraded to
**sink-with-acks**: a ``mapInPandas`` pass serializes each row to JSON
JVM-side (``to_json`` — vectorized, not per-row Python), opens ONE transport
per partition (connection reuse), POSTs in bounded batches, and returns
``(url_hash, status_code)`` ack rows — delivery is observable and joinable
(e.g. retry the non-2xx slice next wave) instead of fire-and-forget.

Idempotency: every payload carries ``url_hash`` as its deduplication key, so
Spark task retries become server-side upserts — the sink is exactly-once in
effect under at-least-once execution.

The sandbox has no network; the transport is injected (any picklable
``fn(endpoint, payloads: list[str]) -> list[int]``). Tests inject a
filesystem-recording fake; a real deployment passes a requests/httpx session
factory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ACK_SCHEMA = "url_hash long, status_code int"


def post_results(
    results: DataFrame,
    endpoint: str,
    transport: Callable[[str, list[str]], list[int]],
    batch_size: int = 64,
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """POST each result row as JSON; returns the ack DataFrame.

    ``payload_cols`` selects what is serialized (default: everything except
    heavy/binary columns is the caller's responsibility — pass a skinny
    projection)."""
    cols = payload_cols or [c for c in results.columns if c != "url_hash"]
    payload = results.select(
        "url_hash", F.to_json(F.struct(*[F.col(c) for c in cols])).alias("payload")
    )

    def send(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-partition init: one transport/session for the whole partition
        for pdf in batches:
            for i in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[i : i + batch_size]
                codes = transport(endpoint, list(chunk["payload"]))
                yield pd.DataFrame(
                    {"url_hash": chunk["url_hash"].to_numpy(), "status_code": codes}
                )

    return payload.mapInPandas(send, ACK_SCHEMA)
