"""Sequence packing (operators/packing.py): concat-and-chunk semantics vs
a python reference, and the scale contract (one shard shuffle, no Python,
WholeStageCodegen window)."""

import pytest
from pyspark.sql import functions as F

from auto_archiver_spark.operators.packing import pack_sequences


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_matches_python_reference(spark):
    rows = [
        # one shard (ids all % 4 == 1): tokens 3, 5, 2, 7, 1
        (1, "a b c"), (5, "a b c d e"), (9, "x y"), (13, "a b c d e f g"),
        (17, "z"),
        # another shard with an oversize doc (12 tokens > budget 8)
        (2, " ".join(f"t{i}" for i in range(12))),
        (6, "p q r"),
        # empty + whitespace-only docs are excluded
        (3, ""), (7, "   "),
    ]
    out = {
        r.doc_id: r.asDict()
        for r in pack_sequences(_docs(spark, rows), budget=8, n_shards=4).collect()
    }
    assert 3 not in out and 7 not in out

    # python reference: per shard, in doc_id order, running offset; chunk
    # every 8 tokens, docs split across cuts
    toks = {1: 3, 5: 5, 9: 2, 13: 7, 17: 1, 2: 12, 6: 3}
    expected = {}
    offs = {}
    for did in sorted(toks):
        sh = did % 4
        start = offs.get(sh, 0)
        offs[sh] = start + toks[did]
        expected[did] = {
            "shard": sh, "n_tokens": toks[did], "start_off": start,
            "seq_first": start // 8, "seq_last": (start + toks[did] - 1) // 8,
            "n_seqs": (start + toks[did] - 1) // 8 - start // 8 + 1,
        }
    for did, exp in expected.items():
        got = out[did]
        for k, v in exp.items():
            assert got[k] == v, (did, k, got, exp)
    # the oversize doc spans two sequences from offset 0 at budget 8
    assert out[2]["n_seqs"] == 2
    # chunk-boundary doc: id 13 starts at 3+5+2=10 -> seq 1, ends at 16 -> seq 2
    assert (out[13]["seq_first"], out[13]["seq_last"]) == (1, 2)


def test_pack_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [(1, "a")]), budget=0)


def test_aspect_buckets_semantics(spark):
    from auto_archiver_spark.operators.packing import aspect_bucket_batches

    # one shard (n_shards=1) so batch order is globally deterministic
    rows = [
        (1, 900, 1600),   # ar 562 -> band 0 (just under the 563 edge)
        (2, 563, 1000),   # ar 563 -> band 1 (edge is exclusive below)
        (3, 1000, 1000),  # ar 1000 -> band 2
        (4, 1777, 1000),  # ar 1777 -> band 3
        (5, 1778, 1000),  # ar 1778 -> band 4
        (6, 1000, 999),   # ar 1001 -> band 2
        (7, 0, 100),      # excluded
        (8, 100, 0),      # excluded
        (9, 1200, 1200),  # band 2
    ]
    df = spark.createDataFrame(rows, "image_id long, w long, h long")
    out = {
        r.image_id: r.asDict()
        for r in aspect_bucket_batches(df, batch_size=2, n_shards=1).collect()
    }
    assert 7 not in out and 8 not in out
    assert [out[i]["bucket"] for i in (1, 2, 3, 4, 5)] == [0, 1, 2, 3, 4]
    # band 2 holds ids 3, 6, 9 in id order: batch 0 = (3, 6) full, batch 1
    # = (9,) the drop-last tail
    assert (out[3]["batch_idx"], out[3]["batch_row"], out[3]["batch_full"]) == (0, 0, 1)
    assert (out[6]["batch_idx"], out[6]["batch_row"], out[6]["batch_full"]) == (0, 1, 1)
    assert (out[9]["batch_idx"], out[9]["batch_row"], out[9]["batch_full"]) == (1, 0, 0)


def test_aspect_buckets_plan_one_shuffle_no_python(spark):
    from auto_archiver_spark.operators.packing import aspect_bucket_batches

    df = spark.range(0, 2000).select(
        F.col("id").alias("image_id"),
        (F.lit(256) + F.pmod(F.col("id") * 13, F.lit(1024))).alias("w"),
        (F.lit(256) + F.pmod(F.col("id") * 7, F.lit(1024))).alias("h"),
    )
    plan = _plan(aspect_bucket_batches(df), mode="simple")
    # the second window's (bucket, shard, batch_idx) clustering is satisfied
    # by the first's (bucket, shard) partitioning — one exchange total
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_plan_one_shuffle_no_python(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w "), F.col("id").cast("string")).alias("text"),
    )
    plan = _plan(pack_sequences(df, budget=2048, n_shards=32), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1  # the shard shuffle
    assert "Exchange rangepartitioning" not in plan  # no global sort
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan  # the running sum is a JVM window, not Python
