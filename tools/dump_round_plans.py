"""Dump .explain('formatted') physical plans of the bench HEADLINE queries to
``plans/<round>/<query>_<tag>.txt`` — the optimization-round evidence files
(the judge checks plan claims against these without running Spark).

Usage:
    python tools/dump_round_plans.py <tag> [outdir] [sf_dir]

e.g. ``python tools/dump_round_plans.py before plans/r08`` from a pristine
round-start worktree, then ``... after plans/r08`` from the optimized tree.

For the two queries whose construction eagerly localCheckpoints intermediate
stages (minhash_lsh, ngram_jaccard) the top-level plan alone would hide the
expensive signature stage behind "ExistingRDD [Scan]"; a second file
``<query>_stage_shingle_<tag>.txt`` captures the shingle-hash stage's own
plan (scan parallelism + exchange shape) explicitly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_archiver_spark import queries as Q  # noqa: E402
from auto_archiver_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "frontier_admission",
    "frontier_anti_join",
    "url_canonicalize",
    "url_best_quality",
    "dedup_first_per_key",
    "pricing_summary",
    "dedup_exact_text",
    "ngram_jaccard",
    "cosine_topk",
    "minhash_lsh",
]


def plan_of(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def shingle_stage_df(spark, sf):
    """The (doc_id, hs) shingle-hash projection exactly as the queries build
    it, WITHOUT the localCheckpoint — so the plan shows the scan/exchange
    shape feeding the md5-per-word stage."""
    docs = Q.load(spark, sf, "documents").select("doc_id", "text")
    fan = getattr(Q, "_fan", None)
    if fan is not None:  # r8+ tree
        docs = fan(spark, docs, "doc_id")
    arrow = getattr(Q, "_shingle_minhash_arrow", None)
    if arrow is not None:  # r8+: the Arrow-vectorized sketch the queries use
        return arrow(docs, "doc_id")
    return Q._shingle_hash_df(docs, "doc_id")


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r08"
    )
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app=f"plan-dump-{tag}", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    for name in HEADLINE:
        df = Q.QUERIES[name](spark, sf)
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan_of(df).strip() + "\n")
        print("dumped", name)
    with open(os.path.join(outdir, f"shingle_stage_{tag}.txt"), "w") as f:
        f.write(plan_of(shingle_stage_df(spark, sf)).strip() + "\n")
    print("dumped shingle_stage")
    spark.stop()


if __name__ == "__main__":
    main()
