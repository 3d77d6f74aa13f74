"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship frontier-admission query at sf0.001;
``queries``/``oracle_sql`` expose the operator catalog (one entry per
implemented operator family from SURVEY.md §2 plus the training-data tier) —
implementations live in auto_archiver_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from auto_archiver_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: frontier admission (O2) —
    the per-host politeness-window ranking at the heart of the crawl loop."""
    return Q.q_frontier_admission(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLE)
