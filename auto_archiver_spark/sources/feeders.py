"""Feeder sources (SURVEY.md §2.1 S1-S4): DataFrame constructors for the
seed shapes the reference supports.

* S1 CLI feeder (modules/cli_feeder/cli_feeder.py:14-18): explicit URL list.
* S2 CSV feeder (modules/csv_feeder/csv_feeder.py:12-38): CSV files, URL
  column picked by name or positional index, invalid URLs dropped.
* S3 sheet feeder (modules/gsheet_feeder_db/gsheet_feeder_db.py:53-100): the
  frontier_seed table + seed_filter/canonicalize in operators/frontier.py.
* S4 Atlos feeder (modules/atlos_feeder_db_storage/atlos_feeder_db_storage
  .py:45-61): cursor-paginated REST scan of source material -> in batch, a
  JSON-lines table scan with the same row predicate (pagination vanishes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.url_exprs import archivable_url_expr


def cli_feeder(spark: SparkSession, urls: list[str]) -> DataFrame:
    """S1: one row per CLI URL, enumeration order preserved via row_idx."""
    return spark.createDataFrame(
        [("cli", i + 1, u, "", "") for i, u in enumerate(urls)],
        "sheet string, row_idx long, url string, status string, folder string",
    )


def csv_feeder(
    spark: SparkSession,
    paths: list[str] | str,
    url_column: str | int | None = None,
    header: bool = True,
) -> DataFrame:
    """S2: read CSV(s); pick the URL column by name, by index, or default to
    the first column; keep only archivable URLs (the reference skips invalid
    rows, csv_feeder.py:30-36)."""
    df = spark.read.csv(paths, header=header, inferSchema=False)
    if isinstance(url_column, str):
        col = F.col(url_column)
    elif isinstance(url_column, int):
        col = F.col(df.columns[url_column])
    else:
        col = F.col(df.columns[0])
    out = (
        df.select(col.alias("url"))
        .filter(F.col("url").isNotNull())
        .filter(archivable_url_expr(F.col("url")))
        .withColumn("sheet", F.lit("csv"))
        .withColumn("row_idx", F.monotonically_increasing_id() + 1)
        .withColumn("status", F.lit(""))
        .withColumn("folder", F.lit(""))
    )
    return out.select("sheet", "row_idx", "url", "status", "folder")


def atlos_row_predicate() -> "F.Column":
    """S4 admission predicate (atlos_feeder_db_storage.py:53-59):
    non-empty source_url AND not already processed AND visible AND not
    mid-pipeline. Pure pushdown-able boolean algebra."""
    return (
        F.col("source_url").isNotNull()
        & (F.col("source_url") != "")
        & ~F.coalesce(F.col("metadata.auto_archiver.processed"), F.lit(False))
        & (F.col("visibility") == "visible")
        & ~F.col("status").isin("processing", "pending")
    )


def atlos_feeder(spark: SparkSession, path: str) -> DataFrame:
    """S4: scan an Atlos source-material dump (JSON lines, one object per
    material — the batch twin of the paginated /api/v2/source_material scan)
    and yield frontier rows keyed by atlos_id."""
    raw = spark.read.json(path)
    return (
        raw.filter(atlos_row_predicate())
        .select(
            F.lit("atlos").alias("sheet"),
            F.col("id").cast("long").alias("row_idx"),
            F.col("source_url").alias("url"),
            F.lit("").alias("status"),
            F.lit("").alias("folder"),
        )
    )
