"""Seed-table writeback — the reference's GSheet "db" commit as a MERGE.

Reference semantics (modules/gsheet_feeder_db/gsheet_feeder_db.py:132-198,
207-214): when a URL finishes, the feeder row in the seed sheet receives a
batch of cell updates — status, archive location, date, title, text,
timestamp, hash, pdq-hash CSV, thumbnail — where every cell EXCEPT status is
written only if currently empty (``batch_if_valid`` guards on
``not self.gsheet.get_cell(...)``), and each cell value is capped at 50 000
chars (gworksheet.py:105, O6).

Spark mapping: ``MERGE INTO seed USING results ON key WHEN MATCHED THEN
UPDATE SET col = CASE WHEN target.col = '' THEN source.col ELSE target.col
END`` — on Iceberg this is a row-level MERGE commit; on the TableIO fallback
the merged seed snapshot is rewritten (same contract, coarser granularity).
The join is an equi-join on (sheet, row_idx) — broadcast-able when the wave's
results are small relative to the seed, hash-join otherwise; either way the
seed side never needs more than one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELL_CAP = 50_000  # gworksheet.py:105 truncation


def writeback_merge(
    seed: DataFrame,
    results: DataFrame,
    key_cols: list[str],
    fill_cols: list[str],
    overwrite_cols: list[str] = (),
    cell_cap: int = CELL_CAP,
) -> DataFrame:
    """Only-fill-empty MERGE of ``results`` into ``seed`` keyed by
    ``key_cols``.

    * ``fill_cols``: written only where the seed cell is NULL/blank
      (reference ``batch_if_valid`` guard) and the new value is non-null.
    * ``overwrite_cols``: always take the new value when one exists
      (the status cell: started → "Archive in progress" → final status,
      gsheet_feeder_db.py:115-126).
    * every written value is truncated to ``cell_cap - 1`` chars (O6).

    ``results`` must be unique per key (dedup upstream — the wave driver's
    frontier is already deduped per url_hash, and (sheet,row_idx) is unique
    by construction).
    """
    upd_cols = list(fill_cols) + list(overwrite_cols)
    r = results.select(
        *key_cols, *[F.col(c).alias(f"_new_{c}") for c in upd_cols]
    )
    out = seed.join(r, list(key_cols), "left")
    for c in upd_cols:
        new = F.substring(F.col(f"_new_{c}").cast("string"), 1, cell_cap - 1)
        cur = F.col(c)
        if c in overwrite_cols:
            merged = F.coalesce(new, cur)
        else:
            empty = cur.isNull() | (F.trim(cur) == "")
            merged = F.when(empty & new.isNotNull(), new).otherwise(cur)
        out = out.withColumn(c, merged)
    return out.drop(*[f"_new_{c}" for c in upd_cols])


STATE_COLS = ["date", "title", "hash", "pdq"]  # gsheet result cells we model

# row-bucket partitioning of the seed-state table: each wave rewrites only
# the buckets its results touch (TableIO.commit_replace), so the writeback
# commit is O(wave), not O(seed) — at 10^10 seed rows a full-table rewrite
# per wave would dominate the whole job (round-2 VERDICT #5). Iceberg analog:
# MERGE INTO over a bucket(sheet,row_idx)-partitioned table.
WB_BUCKETS = 64


def wb_bucket_expr():
    """Deterministic row bucket from the writeback key (sheet, row_idx)."""
    return F.pmod(F.xxhash64("sheet", "row_idx"), F.lit(WB_BUCKETS)).cast("int")


def init_seed_state(seed: DataFrame) -> DataFrame:
    """Wave-0 seed-state: the feeder columns plus blank result cells
    (a fresh worksheet has the header but empty archive columns), bucketed
    for partition-replace writeback."""
    out = seed
    for c in STATE_COLS:
        out = out.withColumn(c, F.lit("").cast("string"))
    return out.withColumn("wb_bucket", wb_bucket_expr())


def wave_writeback(seed_state: DataFrame, results: DataFrame) -> DataFrame:
    """Apply one wave's archive results to the seed-state table.

    Mirrors the reference's done() cell batch (gsheet_feeder_db.py:132-198):
    status always updated; date/title/hash/pdq only fill blanks
    (A8 pdq CSV cell: gsheet_feeder_db.py:164-171).
    """
    enriched = results.select(
        "sheet",
        "row_idx",
        "status",
        F.date_format("processed_at", "yyyy-MM-dd'T'HH:mm:ssXXX").alias("date"),
        "title",
        F.try_element_at(F.col("media"), F.lit(1))["hash"].alias("hash"),
        F.array_join(
            F.transform(F.col("media"), lambda m: m["phash"].cast("string")), ","
        ).alias("pdq"),
    )
    return writeback_merge(
        seed_state,
        enriched,
        key_cols=["sheet", "row_idx"],
        fill_cols=STATE_COLS,
        overwrite_cols=["status"],
    )
