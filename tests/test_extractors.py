"""X5/X6 extractor parse kernels — golden pages/documents incl. the
reference's edge cases (seconds-only duration, unquoted url(), video XOR
images precedence, media-nested embeds)."""

import json

from pyspark.sql import functions as F

from auto_archiver_spark.operators.extractors import bluesky_parse_cols, telegram_parse_cols


def _tg(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(*telegram_parse_cols(F.col("html"))).collect()[0]


def test_telegram_video_wins_and_duration_forms(spark):
    r = _tg(
        spark,
        '<time datetime="2024-01-01T10:00:00+00:00">1:23</time>'
        '<video class="v" src="https://cdn.tg/v9.mp4"></video>'
        '<div class="tgme_widget_message_photo_wrap" '
        "style=\"background-image:url('https://cdn.tg/ignored.jpg')\"></div>",
    )
    assert r.status == "telegram: success"
    assert r.video_url == "https://cdn.tg/v9.mp4"
    assert r.duration_s == 83.0  # 1:23 -> 1*60+23 (telegram_extractor.py:66-70)
    assert r.ts == "2024-01-01T10:00:00+00:00"

    r2 = _tg(spark, '<time>90</time><video src="v.mp4"></video>')
    assert r2.duration_s == 90.0  # seconds-only branch


def test_telegram_photos_and_unquoted_url(spark):
    r = _tg(
        spark,
        '<div class="tgme_widget_message_photo_wrap a" '
        'style="background-image:url(https://cdn.tg/p1.jpg)"></div>'
        '<div class="tgme_widget_message_photo_wrap" '
        "style=\"background-image:url('https://cdn.tg/p2.jpg')\"></div>",
    )
    assert r.status == "telegram: success" and r.video_url is None
    assert list(r.image_urls) == ["https://cdn.tg/p1.jpg", "https://cdn.tg/p2.jpg"]
    assert r.duration_s is None

    r2 = _tg(spark, "<html><body>deleted</body></html>")
    assert r2.status == "nothing archived" and list(r2.image_urls) == []


def test_bluesky_embeds_incl_media_nesting(spark):
    post = {
        "author": {"did": "did:plc:abc"},
        "record": {
            "text": "hello world",
            "createdAt": "2024-06-06T00:00:00Z",
            "embed": {
                "images": [{"image": {"ref": {"$link": "cidA"}}}],
                "media": {
                    "images": [{"image": {"ref": {"$link": "cidB"}}}],
                    "video": {"ref": {"$link": "cidV"}},
                },
            },
        },
    }
    df = spark.createDataFrame([(json.dumps(post),)], "j string")
    r = df.select(*bluesky_parse_cols(F.col("j"))).collect()[0]
    assert r.title == "hello world" and r.author_did == "did:plc:abc"
    base = "https://bsky.social/xrpc/com.atproto.sync.getBlob?cid="
    assert list(r.media_urls) == [
        base + "cidA&did=did:plc:abc",
        base + "cidB&did=did:plc:abc",
        base + "cidV&did=did:plc:abc",
    ]
