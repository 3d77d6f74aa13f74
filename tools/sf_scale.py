"""Synthesize an sf1-scale copy (10x rows) of the sf0.1 test tables so the
headline queries can be measured one decade up (r5 verdict #6: catch plans
that are accidentally super-linear while still cheap at sf0.1).

Replicates each parquet table K times with key shifts so cardinalities and
join/grouping structure scale linearly:

  * documents: doc_id shifted by k*stride; text gets a per-replica word
    prepended so the near-dup structure (minhash/ngram/simhash candidates)
    scales ~linearly instead of creating 10-way exact-duplicate cliques
    (which would blow candidate pair counts quadratically and measure a
    different problem than "same query, more data").
  * embeddings: vec_id shifted; embedding rotated by replica index
    (deterministic element roll) so top-k structure stays non-degenerate.
  * lineitem/orders: order keys shifted by k*stride to preserve the
    join/agg key distribution.

Derived deterministically from the driver's testdata — no external data.
Usage: python tools/sf_scale.py [src_sf_dir] [dst_dir] [k]
       (defaults /root/testdata/sf0.1 /dev/shm/sf1 10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from auto_archiver_spark.session import get_spark  # noqa: E402

STRIDE = 1_000_000_000


def scaled(df, k: int, table: str):
    out = df
    if table == "documents":
        out = out.withColumn("doc_id", F.col("doc_id") + F.lit(k * STRIDE))
        if k > 0:
            out = out.withColumn(
                "text", F.concat(F.lit(f"replica{k} "), F.col("text"))
            )
    elif table == "embeddings":
        out = out.withColumn("vec_id", F.col("vec_id") + F.lit(k * STRIDE))
        if k > 0:
            # deterministic roll: move the first k elements to the back
            out = out.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", k + 1, F.size("embedding") - k),
                    F.slice("embedding", 1, k),
                ),
            )
    elif table == "lineitem":
        out = out.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * STRIDE))
    elif table == "orders":
        out = out.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * STRIDE))
    elif table == "events":
        out = out.withColumn("event_id", F.col("event_id") + F.lit(k * STRIDE))
    return out


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark(app="aas-sfscale", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(dst, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        if t in ("region", "nation"):  # tiny dims: keep as-is
            big = df
        else:
            big = scaled(df, 0, t)
            for k in range(1, reps):
                big = big.unionByName(scaled(df, k, t))
        big.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(t, spark.read.parquet(f"{dst}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
