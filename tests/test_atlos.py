"""K8 Atlos logic halves: done/failed payload documents and upload dedup
(atlos_feeder_db_storage.py:65-105,122-128)."""

import json

from pyspark.sql import functions as F

from auto_archiver_spark.operators.atlos import atlos_done_payload, atlos_upload_plan, iso_ts


def test_done_and_failed_payloads(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = spark.createDataFrame(
        [
            ("a1", "success", "https://x/1", "2024-01-02 03:04:05", None),
            ("a2", "nothing archived", "https://x/2", "2024-01-02 03:04:05", "timeout"),
            (None, "success", "https://x/3", "2024-01-02 03:04:05", None),
            ("", "success", "https://x/4", "2024-01-02 03:04:05", None),
        ],
        "atlos_id string, status string, url string, ts_raw string, error string",
    ).withColumn("archived_at", iso_ts(F.to_timestamp("ts_raw")))
    out = atlos_done_payload(rows, result_cols=["url", "archived_at"]).collect()
    docs = {r.atlos_id: json.loads(r.payload) for r in out}
    # id-less rows skipped (reference logs + skips, :67-69)
    assert set(docs) == {"a1", "a2"}
    assert docs["a1"] == {
        "metadata": {
            "processed": True,
            "status": "success",
            "results": {"url": "https://x/1", "archived_at": "2024-01-02T03:04:05"},
        }
    }
    assert docs["a2"] == {
        "metadata": {"processed": True, "status": "error", "error": "timeout"}
    }


def test_upload_dedup_anti_join(spark):
    media = spark.createDataFrame(
        [("a1", "h1"), ("a1", "h2"), ("a2", "h1"), ("a2", "h3")],
        "atlos_id string, sha256 string",
    )
    existing = spark.createDataFrame(
        [("a1", "h1"), ("a2", "h3"), ("a3", "h2")], "atlos_id string, sha256 string"
    )
    need = {(r.atlos_id, r.sha256) for r in atlos_upload_plan(media, existing).collect()}
    # h2 exists only under a3 -> a1/h2 still needs upload (per-material key)
    assert need == {("a1", "h2"), ("a2", "h1")}
