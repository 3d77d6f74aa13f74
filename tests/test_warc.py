"""S5 WARC demux: from-scratch parser + Spark binaryFile source, asserting
the reference's record-loop semantics (response-only, P6 relevance filter,
per-archive first-wins dedup (A3), media mimetypes, screenshot resources,
twitter best-quality rewrite)."""

import gzip
import os

from auto_archiver_spark.sources.warc import (
    build_http_response,
    build_warc_record,
    extract_media_records,
    parse_warc,
    scan_warc_media,
)


def _sample_warc() -> bytes:
    recs = [
        build_warc_record(
            "warcinfo", "urn:warcinfo", b"software: test\r\n", "application/warc-fields"
        ),
        # relevant image — kept
        build_warc_record(
            "response",
            "https://site.example/a.jpg",
            build_http_response(b"JPGDATA1", "image/jpeg"),
        ),
        # duplicate URL — dropped (A3 first wins)
        build_warc_record(
            "response",
            "https://site.example/a.jpg",
            build_http_response(b"JPGDATA2", "image/jpeg"),
        ),
        # irrelevant URL (favicon) — dropped by P6
        build_warc_record(
            "response",
            "https://site.example/favicon.ico",
            build_http_response(b"ICO", "image/x-icon"),
        ),
        # HTML — dropped by mimetype filter
        build_warc_record(
            "response",
            "https://site.example/page.html",
            build_http_response(b"<html/>", "text/html"),
        ),
        # twitter media — best-quality rewrite recorded
        build_warc_record(
            "response",
            "https://pbs.twimg.com/media/abc?name=small",
            build_http_response(b"TWDATA", "image/jpeg"),
        ),
        # video — kept
        build_warc_record(
            "response",
            "https://site.example/v.mp4",
            build_http_response(b"MP4DATA", "video/mp4"),
        ),
        # screenshot resource record
        build_warc_record(
            "resource", "urn:screenshot:p1", b"PNGBYTES", "image/png"
        ),
    ]
    return b"".join(recs)


def test_parse_warc_roundtrip_plain_and_gzip():
    raw = _sample_warc()
    assert len(list(parse_warc(raw))) == 8
    # gzip per-member concatenation, as browsertrix writes and the
    # reference byte-concatenates (wacz_extractor_enricher.py:189-196)
    gz = b"".join(gzip.compress(raw[i : i + 500]) for i in range(0, len(raw), 500))
    assert len(list(parse_warc(gz))) == 8


def test_extract_media_records_semantics():
    media = extract_media_records(_sample_warc())
    urls = [m["record_url"] for m in media]
    assert urls == [
        "https://site.example/a.jpg",
        "https://pbs.twimg.com/media/abc?name=small",
        "https://site.example/v.mp4",
        "urn:screenshot:p1",
    ]
    by_url = {m["record_url"]: m for m in media}
    assert by_url["https://site.example/a.jpg"]["payload"] == b"JPGDATA1"  # first wins
    assert (
        by_url["https://pbs.twimg.com/media/abc?name=small"]["best_url"]
        == "https://pbs.twimg.com/media/abc?name=orig"
    )
    assert by_url["urn:screenshot:p1"]["is_screenshot"] is True
    assert not extract_media_records(_sample_warc(), extract_screenshots=False)[-1][
        "is_screenshot"
    ]


def test_scan_warc_media_spark_source(spark, tmp_path):
    for i, blob in enumerate([_sample_warc(), gzip.compress(_sample_warc())]):
        with open(os.path.join(tmp_path, f"cap-{i}.warc" + (".gz" if i else "")), "wb") as f:
            f.write(blob)
    df = scan_warc_media(spark, str(tmp_path))
    rows = df.collect()
    # 4 media rows per archive, 2 archives; per-archive dedup only
    assert len(rows) == 8
    assert {r.content_type for r in rows} == {"image/jpeg", "video/mp4", "image/png"}
    assert all(r.archive for r in rows)
    mp4 = [r for r in rows if r.content_type == "video/mp4"]
    assert all(bytes(r.payload) == b"MP4DATA" for r in mp4)
