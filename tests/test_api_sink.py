"""K3 API sink: payload shape, batching, acks (filesystem-recording
transport stands in for HTTP — the sandbox has no network)."""

import glob
import json
import os
import uuid

from pyspark.sql import functions as F

from auto_archiver_spark.plans.api_sink import post_results

_REC_DIR = "/tmp/aas_api_sink_test"


def _recording_transport(endpoint, payloads):
    os.makedirs(_REC_DIR, exist_ok=True)
    for p in payloads:
        with open(os.path.join(_REC_DIR, uuid.uuid4().hex), "w") as f:
            f.write(json.dumps({"endpoint": endpoint, "payload": p}))
    return [200] * len(payloads)


def test_post_results_acks_and_payloads(spark):
    for f in glob.glob(_REC_DIR + "/*"):
        os.remove(f)
    results = spark.range(0, 57, numPartitions=4).select(
        F.col("id").alias("url_hash"),
        F.concat(F.lit("https://e.com/p/"), F.col("id").cast("string")).alias("url"),
        F.lit("success").alias("status"),
        (F.col("id") * 10).alias("total_bytes"),
    )
    acks = post_results(
        results, "https://api.example/submit", _recording_transport, batch_size=10
    ).collect()
    assert len(acks) == 57
    assert all(a.status_code == 200 for a in acks)
    assert {a.url_hash for a in acks} == set(range(57))

    recs = [json.load(open(p)) for p in glob.glob(_REC_DIR + "/*")]
    assert len(recs) == 57
    assert all(r["endpoint"] == "https://api.example/submit" for r in recs)
    one = json.loads(next(r["payload"] for r in recs if '"url":"https://e.com/p/7"' in r["payload"]))
    # url_hash is NOT in the payload body (it's the idempotency key column);
    # the rest of the projection is
    assert one == {"url": "https://e.com/p/7", "status": "success", "total_bytes": 70}
