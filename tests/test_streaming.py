"""Streaming seed ingest: incremental canonicalization through foreachBatch
into the TableIO staging table, exactly-once across restarts."""

import shutil
import tempfile

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
