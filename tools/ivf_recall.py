"""IVF ANN recall@k vs the brute-force cosine baseline (r4 verdict #6).

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1): trains IVF
centroids (1 and 2 Lloyd iterations), buckets the embedding table, and for a
panel of query vectors reports mean recall@10 of ivf_topk vs cosine_topk for
nprobe in {1, 2, 4, 8}, plus the scanned-fraction each nprobe implies (the
partition-pruning win that motivates IVF at 100 TB).

Usage: python tools/ivf_recall.py [n_queries]
Prints one JSON line; paste the table into BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from auto_archiver_spark.operators.similarity import (  # noqa: E402
    assign_buckets,
    cosine_topk,
    ivf_topk,
    train_centroids,
)
from auto_archiver_spark.session import get_spark  # noqa: E402

K = 10
N_CENTROIDS = 16
NPROBES = (1, 2, 4, 8)


def main() -> None:
    n_queries = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .localCheckpoint()
    )
    queries = [
        [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id") % 251 == 3).limit(n_queries).collect()
    ]
    exact = {
        tuple(q): [r.vec_id for r in cosine_topk(emb, q, K).collect()] for q in queries
    }

    out = {"sf_dir": sf_dir, "k": K, "n_centroids": N_CENTROIDS, "n_queries": len(queries)}
    for iters in (1, 2):
        cents = train_centroids(emb, n_centroids=N_CENTROIDS, lloyd_iters=iters)
        bucketed = assign_buckets(emb, cents).localCheckpoint()
        sizes = {
            r.ivf_bucket: r.cnt
            for r in bucketed.groupBy("ivf_bucket").agg(F.count("*").alias("cnt")).collect()
        }
        total = sum(sizes.values())
        for nprobe in NPROBES:
            recalls, scanned = [], []
            for q in queries:
                got = {r.vec_id for r in ivf_topk(bucketed, cents, q, K, nprobe).collect()}
                recalls.append(len(got & set(exact[tuple(q)])) / K)
                from auto_archiver_spark.operators.similarity import _probe_buckets

                probe = _probe_buckets(cents, q, nprobe)
                scanned.append(sum(sizes.get(b, 0) for b in probe) / total)
            out[f"recall@{K}_iters{iters}_nprobe{nprobe}"] = round(
                sum(recalls) / len(recalls), 4
            )
            out[f"scanned_frac_iters{iters}_nprobe{nprobe}"] = round(
                sum(scanned) / len(scanned), 4
            )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
