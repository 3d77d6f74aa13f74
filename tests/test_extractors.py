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


# ---- X4 twitter ------------------------------------------------------------------


def _tw(spark, doc: dict):
    from auto_archiver_spark.operators.extractors import twitter_parse_cols

    df = spark.createDataFrame([(json.dumps(doc),)], "j string")
    return df.select(*twitter_parse_cols(F.col("j"))).collect()[0]


def _vid(*variants):
    return {
        "type": "video",
        "video_info": {"variants": [{"url": u, "content_type": ct} for u, ct in variants]},
    }


def test_twitter_choose_variant_fold(spark):
    """generic_extractor/twitter.py:17-30 — sequential, OR-comparison fold."""
    # biggest WxH mp4 wins regardless of order; non-mp4 never beats a pick
    r = _tw(spark, {
        "user": {"name": "A"}, "created_at": "Sun Feb 08 18:45:33 +0000 2026",
        "full_text": "t", "entities": {"media": [_vid(
            ("https://v.tw/a/320x180/a.mp4", "video/mp4"),
            ("https://v.tw/pl/x.m3u8", "application/x-mpegURL"),
            ("https://v.tw/a/1280x720/b.mp4", "video/mp4"),
        )]},
    })
    assert [m.src for m in r.media] == ["https://v.tw/a/1280x720/b.mp4"]
    assert r.title == "A - t" and r.status == "twitter: success"
    assert str(r.ts) == "2026-02-08 18:45:33"

    # the reference's OR quirk: (100x900) then (800x100) -> w=800>100 replaces
    r = _tw(spark, {
        "user": {"name": "A"}, "created_at": "Sun Feb 08 18:45:33 +0000 2026",
        "full_text": "t", "entities": {"media": [_vid(
            ("https://v.tw/a/100x900/a.mp4", "video/mp4"),
            ("https://v.tw/a/800x100/b.mp4", "video/mp4"),
        )]},
    })
    assert [m.src for m in r.media] == ["https://v.tw/a/800x100/b.mp4"]

    # mp4 without parseable dims never replaces; lone non-mp4 is kept
    r = _tw(spark, {
        "user": {"name": "A"}, "created_at": "Sun Feb 08 18:45:33 +0000 2026",
        "full_text": "t", "entities": {"media": [_vid(
            ("https://v.tw/pl/x.m3u8", "application/x-mpegURL"),
            ("https://v.tw/nodims/a.mp4", "video/mp4"),
        )]},
    })
    assert [(m.src, m.mimetype) for m in r.media] == [
        ("https://v.tw/pl/x.m3u8", "application/x-mpegURL")
    ]


def test_twitter_photo_gif_and_textonly(spark):
    base = {"user": {"name": "Bo"}, "created_at": "Mon Mar 01 00:00:01 +0000 2027",
            "full_text": "hi"}
    r = _tw(spark, {**base, "entities": {"media": [
        {"type": "photo", "media_url_https": "https://pbs.twimg.com/media/abc?name=small"},
        _vid(("https://v.tw/g/1.mp4", "video/mp4"), ("https://v.tw/g/2.mp4", "video/mp4"))
        | {"type": "animated_gif"},
    ]}})
    assert [(m.src, m.mimetype) for m in r.media] == [
        ("https://pbs.twimg.com/media/abc?name=orig", "image/jpeg"),  # P8 rewrite (:149)
        ("https://v.tw/g/1.mp4", "video/mp4"),  # gif takes variants[0] (:156-158)
    ]
    r = _tw(spark, {**base, "entities": {"media": []}})
    assert r.status == "twitter-ytdl" and r.media == []  # :141-144
    assert r.content == "hi"


# ---- X10 wayback -----------------------------------------------------------------


def test_wayback_kernels(spark):
    from auto_archiver_spark.operators.extractors import (
        wayback_status_cols,
        wayback_submit_payload,
    )

    rows = spark.createDataFrame(
        [
            ('{"status":"success","timestamp":"20260101120033",'
             '"original_url":"https://a/x","job_id":"j1"}', "https://a/x"),
            ('{"status":"pending","job_id":"j2"}', "https://b/y"),
            ('{"status":"error","status_ext":"error:blocked-url","job_id":"j3"}',
             "https://c/z"),
            ('{"status":"error","status_ext":"error:weird","job_id":"j4"}',
             "https://d/w"),
            ("not json at all", "https://e/v"),
        ],
        "doc string, url string",
    )
    out = rows.select("url", *wayback_status_cols(F.col("doc"), F.col("url"))).collect()
    by = {r.url: r for r in out}
    # success -> archive URL (wayback_extractor_enricher.py:88-90)
    assert by["https://a/x"].wayback == (
        "https://web.archive.org/web/20260101120033/https://a/x"
    )
    assert by["https://a/x"].ok is True
    # pending -> check-status URL (:104-107 batch analog)
    assert by["https://b/y"].wayback == "https://web.archive.org/save/status/j2"
    # blocked/unauthorized -> status_ext recorded (:96-98)
    assert by["https://c/z"].wayback == "error:blocked-url"
    # other errors and unparseable bodies -> failed (:92-102)
    assert by["https://d/w"].wayback == "failed"
    assert by["https://e/v"].wayback == "failed"
    # every row carries the /web/*/ check column (:109)
    assert all(r.check_wayback == f"https://web.archive.org/web/*/{r.url}" for r in out)

    pay = rows.select(
        wayback_submit_payload(F.col("url")).alias("p1"),
        wayback_submit_payload(F.col("url"), F.lit("7d")).alias("p2"),
    ).first()
    assert pay.p1 == {"url": "https://a/x"}
    assert pay.p2 == {"url": "https://a/x", "if_not_archived_within": "7d"}


# ---- X11 instagram ---------------------------------------------------------------


def test_instagram_media_pick_and_cleanup(spark):
    from auto_archiver_spark.operators.extractors import (
        instagram_cleanup_map,
        instagram_media_cols,
    )

    docs = [
        # video wins over thumbnail on the same item
        '{"id":"i1","code":"c1","taken_at":"1700000000","caption_text":"hi",'
        '"video_url":"https://ig/v.mp4","thumbnail_url":"https://ig/t.jpg"}',
        # image-only; pk fallback for id, taken_at_ts fallback for date
        '{"pk":"p2","code":"c2","taken_at_ts":"1700000001",'
        '"thumbnail_url":"https://ig/t2.jpg"}',
        # carousel fallback takes the FIRST resource and ITS id (:318-323)
        '{"code":"c3","carousel_media":[{"pk":"r1","thumbnail_url":"https://ig/r1.jpg"},'
        '{"pk":"r2","video_url":"https://ig/r2.mp4"}]}',
        '{"code":"c4"}',  # nothing to pick
    ]
    df = spark.createDataFrame([(d,) for d in docs], "j string")
    rows = df.select(*instagram_media_cols(F.col("j"))).collect()
    assert [(r.post_url, r.media_src, r.media_kind, r.media_id, r.taken_at) for r in rows] == [
        ("https://www.instagram.com/p/c1/", "https://ig/v.mp4", "video", "i1", "1700000000"),
        ("https://www.instagram.com/p/c2/", "https://ig/t2.jpg", "image", "p2", "1700000001"),
        ("https://www.instagram.com/p/c3/", "https://ig/r1.jpg", "image", "r1", None),
        ("https://www.instagram.com/p/c4/", None, None, None, None),
    ]
    # cleanup_dict analog: geometry keys + empty-ish values dropped (:77-90)
    m = spark.createDataFrame(
        [({"x": "5", "width": "9", "name": "a", "empty": "", "z": "0", "keep": "v"},)],
        "m map<string,string>",
    )
    out = m.select(instagram_cleanup_map(F.col("m")).alias("c")).first().c
    assert out == {"name": "a", "keep": "v"}


# ---- X8 antibot VK sanitize ------------------------------------------------------


def test_antibot_vk_sanitize(spark):
    """dropins/vk.py:38-46 — ordered first-match rewrite, vk.com-gated."""
    from auto_archiver_spark.operators.extractors import antibot_sanitize_expr

    cases = [
        ("https://vk.com/page_name?w=wall-123456_7890", "https://vk.com/wall-123456_7890"),
        ("https://vk.com/feed?z=video-1_2_abc", "https://vk.com/video-1_2_abc"),
        ("https://vk.com/x?z=clip-11_22", "https://vk.com/clip-11_22"),
        ("https://vk.com/a?z=photo-33_44", "https://vk.com/photo-33_44"),
        # wall wins over video when both present (declaration order, :42)
        ("https://vk.com/q?w=wall-1_2&z=video-3_4", "https://vk.com/wall-1_2"),
        ("https://vk.com/no_modal_here", "https://vk.com/no_modal_here"),
        ("https://other.example/wall-1_2", "https://other.example/wall-1_2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.s for r in df.select(antibot_sanitize_expr(F.col("url")).alias("s")).collect()]
    assert got == [want for _, want in cases]


def test_ytdlp_metadata_kernel(spark):
    """X2 add_metadata core (generic_extractor.py:297-348): title fallback
    chain, priors win iff truthy, falsy timestamp/view_count dropped,
    epoch rendered as UTC isoformat."""
    from pyspark.sql import functions as F

    from auto_archiver_spark.operators.extractors import ytdlp_metadata_cols

    rows = [
        (1, '{"title":"T","fulltitle":"FT","timestamp":1650000123}', None, None, None),
        (2, '{"fulltitle":"FT only"}', None, None, None),
        (3, '{"title":"T","description":"D","timestamp":5}', "PRIOR", "PC",
         "2020-01-01T00:00:00+00:00"),
        (4, '{"timestamp":0,"view_count":0,"uploader":""}', None, None, None),
        (5, "{}", "", None, None),  # empty-string prior is falsy like the reference
    ]
    df = spark.createDataFrame(
        rows, "id long, j string, pt string, pc string, pts string"
    )
    out = {r["id"]: r for r in df.select(
        "id", *ytdlp_metadata_cols(F.col("j"), F.col("pt"), F.col("pc"), F.col("pts"))
    ).collect()}
    assert out[1]["title"] == "T" and out[1]["ts_iso"] == "2022-04-15T05:22:03+00:00"
    assert out[2]["title"] == "FT only"
    # truthy priors always win
    assert out[3]["title"] == "PRIOR" and out[3]["content"] == "PC"
    assert out[3]["ts_iso"] == "2020-01-01T00:00:00+00:00"
    # falsy values dropped like the reference's `if v:` / `if timestamp:`
    assert out[4]["ts_iso"] is None and out[4]["view_count"] is None
    assert out[4]["uploader"] is None
    assert out[5]["title"] == "" and out[5]["content"] == ""
