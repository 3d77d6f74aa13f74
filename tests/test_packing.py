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
