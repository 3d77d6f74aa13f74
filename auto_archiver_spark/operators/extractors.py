"""Platform extractor parse kernels — the network-free halves of X5/X6.

The reference's platform extractors mix transport (requests/yt-dlp — out of
scope in a sandboxed engine) with *parsing*, which is pure text/JSON algebra
and ports exactly:

* X6 Telegram embed page (modules/telegram_extractor/telegram_extractor.py:
  17-76): ``<time datetime>`` timestamp; ``<video src>`` wins, else every
  ``url(...)`` inside ``tgme_widget_message_photo_wrap`` style attributes;
  video duration from the first ``<time>`` text (``mm:ss`` or seconds).
* X5 Bluesky post (modules/generic_extractor/bluesky.py:9-83): title =
  ``record.text``, timestamp = ``record.createdAt``; embeds are images XOR a
  video (both also possible under ``embed.media``), each resolved to the
  ``getBlob?cid={$link}&did={author.did}`` URL template.

Everything here is native Catalyst (regexp over HTML, from_json over the
post document) — the fetch UDF plugs these in per route (P4 routing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# ---- X6: Telegram embed HTML ------------------------------------------------------

_TG_TIME_DT = r'<time[^>]*datetime="([^"]+)"'
_TG_VIDEO = r'<video[^>]*src="([^"]+)"'
_TG_PHOTO = r'class="tgme_widget_message_photo_wrap[^"]*"[^>]*style="[^"]*url\(\'?([^\'\)]+)'
_TG_TIME_TXT = r"<time[^>]*>([0-9:.]+)</time>"


def telegram_parse_cols(html: Column) -> list[Column]:
    """Columns (ts, video_url, image_urls, duration_s, status) from one
    Telegram ``?embed=1`` page. Mirrors telegram_extractor.py:36-76: a
    ``<video>`` wins; else photo-wrap images; neither -> nothing archived."""
    ts = F.nullif(F.regexp_extract(html, _TG_TIME_DT, 1), F.lit(""))
    video = F.nullif(F.regexp_extract(html, _TG_VIDEO, 1), F.lit(""))
    images = F.regexp_extract_all(html, F.lit(_TG_PHOTO), F.lit(1))
    dur_txt = F.regexp_extract(html, _TG_TIME_TXT, 1)
    mins = F.split(dur_txt, ":").getItem(0)
    secs = F.split(dur_txt, ":").getItem(1)
    duration = F.when(
        dur_txt.contains(":"),
        mins.cast("double") * 60 + secs.cast("double"),
    ).otherwise(dur_txt.try_cast("double"))
    status = F.when(video.isNotNull() | (F.size(images) > 0), "telegram: success").otherwise(
        F.lit("nothing archived")
    )
    return [
        ts.alias("ts"),
        video.alias("video_url"),
        images.alias("image_urls"),
        F.when(video.isNotNull(), duration).alias("duration_s"),
        status.alias("status"),
    ]


# ---- X5: Bluesky post JSON --------------------------------------------------------

_LINK = StructType([StructField("$link", StringType())])
_IMG = StructType([StructField("image", StructType([StructField("ref", _LINK)]))])
_VID = StructType([StructField("ref", _LINK)])
BSKY_POST_SCHEMA = StructType(
    [
        StructField("author", StructType([StructField("did", StringType())])),
        StructField(
            "record",
            StructType(
                [
                    StructField("text", StringType()),
                    StructField("createdAt", StringType()),
                    StructField(
                        "embed",
                        StructType(
                            [
                                StructField("images", ArrayType(_IMG)),
                                StructField("video", _VID),
                                StructField(
                                    "media",
                                    StructType(
                                        [
                                            StructField("images", ArrayType(_IMG)),
                                            StructField("video", _VID),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)

_BLOB = "https://bsky.social/xrpc/com.atproto.sync.getBlob?cid="


def bluesky_parse_cols(post_json: Column) -> list[Column]:
    """Columns (title, created_at, author_did, media_urls) from a raw
    getPostThread post document (bluesky.py:9-54 semantics: images from
    embed.images + embed.media.images, video from embed.video XOR
    embed.media.video, all via the getBlob URL template)."""
    p = F.from_json(post_json, BSKY_POST_SCHEMA)
    did = p["author"]["did"]
    embed = p["record"]["embed"]
    arr = lambda c: F.coalesce(c, F.array().cast(ArrayType(_IMG)))  # noqa: E731
    image_links = F.concat(arr(embed["images"]), arr(embed["media"]["images"]))
    img_cids = F.transform(image_links, lambda i: i["image"]["ref"]["$link"])
    vid_cids = F.array_compact(
        F.array(embed["video"]["ref"]["$link"], embed["media"]["video"]["ref"]["$link"])
    )
    urls = F.transform(
        F.concat(img_cids, vid_cids),
        lambda cid: F.concat(F.lit(_BLOB), cid, F.lit("&did="), did),
    )
    return [
        p["record"]["text"].alias("title"),
        p["record"]["createdAt"].alias("created_at"),
        did.alias("author_did"),
        urls.alias("media_urls"),
    ]
