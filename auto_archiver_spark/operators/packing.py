"""Sequence packing for pretraining: concat-and-chunk documents into
fixed token-budget training sequences.

The standard GPT-style packing: documents are concatenated in a
deterministic order and the token stream is cut every ``budget`` tokens;
a document whose span crosses a cut is split across consecutive
sequences. The operator computes, per document, where its tokens land:
the within-shard start offset, the first and last sequence index it
touches, and how many sequences it spans.

Scale shape (100 TB): packing is sequential by nature, so the corpus is
split into deterministic SHARDS (``pmod(doc_id, n_shards)``) and packed
independently within each — one hash shuffle on the shard key, then a
per-shard sort + running sum, all JVM-side window expressions inside
WholeStageCodegen (no Python, no driver state, no iteration). Shard
count is the parallelism knob: each shard's sequence space is
independent, exactly how a multi-host tokenizer/packer fleet divides
work. Determinism: (shard, doc_id) is a total order, so reruns and
resumes produce identical assignments.

Zero-token documents are excluded (they occupy no tokens; including
them would make sequence indices depend on tie order).

No reference analog (the reference archives media, it does not build
training batches); this extends the LLM-data tier next to
dedup/decontaminate/stratified_sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count_expr


def pack_sequences(
    docs: DataFrame,
    budget: int,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: Column | None = None,
) -> DataFrame:
    """Assign each document its place in the packed token stream.

    Returns (id_col, shard, n_tokens, start_off, seq_first, seq_last,
    n_seqs): ``start_off`` is the document's first-token offset within its
    shard's concatenated stream, ``seq_first``/``seq_last`` the indices of
    the budget-sized sequences it starts/ends in, ``n_seqs`` how many it
    spans (>1 = split across a cut; oversize docs span many)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    ntok = (
        tokens_col if tokens_col is not None else token_count_expr(F.col(text_col))
    ).cast("long")
    d = (
        docs.select(
            F.col(id_col),
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
            ntok.alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    cum = F.sum("n_tokens").over(w)
    d = d.withColumn("start_off", (cum - F.col("n_tokens")).cast("long"))
    d = (
        d.withColumn("seq_first", F.expr(f"start_off DIV {budget}"))
        .withColumn(
            "seq_last", F.expr(f"(start_off + n_tokens - 1) DIV {budget}")
        )
    )
    return d.withColumn(
        "n_seqs", (F.col("seq_last") - F.col("seq_first") + F.lit(1)).cast("long")
    )


# Aspect-ratio bands in floor-milli units (1000*w/h), open-ended last band:
# tall 9:16-ish | portrait 3:4-ish | square-ish | landscape 4:3-ish | wide.
# Integer thresholds so both engines band identically (no float boundaries).
ASPECT_BANDS_MILLI = (563, 800, 1250, 1778)


def aspect_bucket_batches(
    images: DataFrame,
    batch_size: int = 64,
    n_shards: int = 32,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Aspect-ratio bucketing + fixed-size batch assignment for image
    training (the SDXL-style loader layout, computed declaratively).

    Each image lands in an integer aspect band (``floor(1000*w/h)`` vs
    ``ASPECT_BANDS_MILLI``), then in a deterministic shard within the band
    (``pmod(id, n_shards)``) — batching is sequential per (bucket, shard),
    exactly how per-worker loaders divide a bucket, so the row_number
    window shuffles on a (bucket, shard) key that scales with the shard
    knob rather than piling a whole band onto one partition. ``batch_idx``
    / ``batch_row`` are the image's cut position; ``batch_full`` = 0 marks
    the tail batch a drop-last loader would discard. Zero/negative
    dimensions are excluded. All arithmetic integer → deterministic and
    engine-portable."""
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    d = images.select(
        F.col(id_col),
        F.col(w_col).cast("long").alias("w"),
        F.col(h_col).cast("long").alias("h"),
    ).filter((F.col("w") > 0) & (F.col("h") > 0))
    ar = F.expr("(1000 * w) DIV h")
    bucket = (
        F.when(ar < ASPECT_BANDS_MILLI[0], 0)
        .when(ar < ASPECT_BANDS_MILLI[1], 1)
        .when(ar < ASPECT_BANDS_MILLI[2], 2)
        .when(ar < ASPECT_BANDS_MILLI[3], 3)
        .otherwise(4)
    )
    d = d.withColumn("ar_milli", ar.cast("long")).withColumn(
        "bucket", bucket.cast("int")
    ).withColumn("shard", F.pmod(F.col(id_col), F.lit(n_shards)).cast("int"))
    w_order = Window.partitionBy("bucket", "shard").orderBy(id_col)
    pos = F.row_number().over(w_order) - F.lit(1)
    d = (
        d.withColumn("pos", pos.cast("long"))
        .withColumn("batch_idx", F.expr(f"pos DIV {batch_size}"))
        .withColumn("batch_row", F.pmod(F.col("pos"), F.lit(batch_size)).cast("long"))
    )
    w_batch = Window.partitionBy("bucket", "shard", "batch_idx")
    return d.withColumn(
        "batch_full",
        (F.count(F.lit(1)).over(w_batch) == batch_size).cast("int"),
    )
