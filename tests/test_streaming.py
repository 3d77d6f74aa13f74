"""Streaming seed ingest: incremental canonicalization through foreachBatch
into the TableIO staging table, exactly-once across restarts; plus the
stateful politeness operator (applyInPandasWithState) with checkpoint-
persistent per-host GroupState."""

import shutil
import tempfile

from pyspark.sql import functions as F

from auto_archiver_spark.functions.urls import north_norm
from auto_archiver_spark.plans.tableio import TableIO
from auto_archiver_spark.streaming.feed import STAGING_TABLE, stream_seed_ingest


def _write_seed_csv(d, name, rows):
    lines = ["sheet,row_idx,url,status,folder"]
    lines += [",".join(str(x) for x in r) for r in rows]
    (d / name).write_text("\n".join(lines) + "\n")


def test_stream_ingest_canonicalizes(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    _write_seed_csv(
        inp,
        "a.csv",
        [
            ("ws1", 1, "https://WWW.Example.COM/p/1?utm_source=x&id=1", "", "f"),
            ("ws1", 2, "ftp://bad/x", "", "f"),
            ("ws1", 3, "https://ok.example/p/3", "done", "f"),
            ("ws1", 4, "https://ok.example/p/4?b=2&a=1", "", "f"),
        ],
    )
    root = tempfile.mkdtemp(prefix="aas_stream_")
    try:
        io = TableIO(root)
        q = stream_seed_ingest(spark, str(inp), io, f"{root}/_ckpt")
        q.awaitTermination(120)
        rows = {r.url: r.url_norm for r in io.read(spark, STAGING_TABLE).collect()}
        assert rows == {
            "https://WWW.Example.COM/p/1?utm_source=x&id=1": north_norm(
                "https://WWW.Example.COM/p/1?utm_source=x&id=1"
            ),
            "https://ok.example/p/4?b=2&a=1": "https://ok.example/p/4?a=1&b=2",
        }
        # second file arrives; restart drains only the new one (exactly-once)
        _write_seed_csv(inp, "b.csv", [("ws2", 1, "https://ok.example/p/9", "", "")])
        q2 = stream_seed_ingest(spark, str(inp), io, f"{root}/_ckpt")
        q2.awaitTermination(120)
        all_rows = io.read(spark, STAGING_TABLE).collect()
        assert len(all_rows) == 3
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_stateful_host_admission_persists_across_restart(spark, tmp_path):
    """GroupState (per-host cumulative spend) lives in the streaming
    checkpoint: a restarted query continues consuming the SAME budget."""
    from auto_archiver_spark.operators.frontier import canonicalize, seed_filter
    from auto_archiver_spark.sources.fixture import FRONTIER_SEED_SCHEMA
    from auto_archiver_spark.streaming.politeness import stateful_host_admission

    inp = tmp_path / "in"
    inp.mkdir()
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "acks")

    def drain(tag):
        raw = (
            spark.readStream.schema(FRONTIER_SEED_SCHEMA)
            .option("header", "true")
            .csv(str(inp))
        )
        canon = canonicalize(seed_filter(raw.fillna({"status": "", "url": ""})))
        out = stateful_host_admission(canon, budget_per_host=3)

        def sink(batch_df, batch_id):
            if not batch_df.isEmpty():
                batch_df.withColumn("tag", F.lit(tag)).write.mode("append").parquet(out_dir)

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r.host: r
            for r in spark.read.parquet(out_dir).filter(F.col("tag") == tag).collect()
        }

    _write_seed_csv(
        inp, "a.csv", [("ws1", i, f"https://h1.example/p/{i}", "", "f") for i in range(1, 3)]
    )
    first = drain("adm1")
    assert first["h1.example"].admitted == 2 and first["h1.example"].total_spent == 2

    # restart with 4 more rows for the same host: only 1 budget slot remains
    _write_seed_csv(
        inp, "b.csv", [("ws1", i, f"https://h1.example/p/{i}", "", "f") for i in range(10, 14)]
    )
    second = drain("adm2")
    r = second["h1.example"]
    assert r.batch_rows == 4 and r.admitted == 1 and r.total_spent == 3


def test_windowed_host_metrics(spark, tmp_path):
    """Event-time tumbling windows with a watermark over the seed stream."""
    from auto_archiver_spark.operators.frontier import canonicalize, seed_filter
    from auto_archiver_spark.sources.fixture import FRONTIER_SEED_SCHEMA
    from auto_archiver_spark.streaming.politeness import windowed_host_metrics

    inp = tmp_path / "win_in"
    inp.mkdir()
    _write_seed_csv(
        inp,
        "a.csv",
        [("ws1", i, f"https://h{i % 2}.example/p/{i}", "", "f") for i in range(6)],
    )
    raw = (
        spark.readStream.schema(FRONTIER_SEED_SCHEMA)
        .option("header", "true")
        .csv(str(inp))
    )
    canon = canonicalize(seed_filter(raw.fillna({"status": "", "url": ""}))).withColumn(
        "ingest_ts", F.lit("2024-05-05 12:00:30").cast("timestamp")
    )
    q = (
        windowed_host_metrics(canon)
        .writeStream.format("memory")
        .queryName("winm")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM winm").collect()
    got = {(str(r.window_start), r.host): r.n_urls for r in rows}
    assert got == {
        ("2024-05-05 12:00:00", "h0.example"): 3,
        ("2024-05-05 12:00:00", "h1.example"): 3,
    }
