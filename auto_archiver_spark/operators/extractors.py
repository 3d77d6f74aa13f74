"""Platform extractor parse kernels — the network-free halves of X4/X5/X6/X10/X11.

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
* X4 Twitter (modules/generic_extractor/twitter.py): fxtwitter-normalized
  tweet JSON -> author/title/timestamp + per-media (src, mimetype) with the
  sequential best-variant fold and the P8 photo rewrite.
* X10 Wayback SPN (modules/wayback_extractor_enricher): submit payload and
  the status-poll decision surface (success/pending/blocked/failed cells).
* X11 Instagram API (modules/instagram_api_extractor): item-JSON media pick
  (video over thumbnail, carousel/resources fallback) + cleanup_dict analog.

Everything here is native Catalyst (regexp over HTML, from_json over the
post document) — the fetch UDF plugs these in per route (P4 routing).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

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


# ---- X4: Twitter (fxtwitter-normalized) post JSON ---------------------------------

_VARIANT = StructType(
    [
        StructField("url", StringType()),
        StructField("content_type", StringType()),
    ]
)
TW_POST_SCHEMA = StructType(
    [
        StructField("user", StructType([StructField("name", StringType())])),
        StructField("created_at", StringType()),
        StructField("full_text", StringType()),
        StructField(
            "entities",
            StructType(
                [
                    StructField(
                        "media",
                        ArrayType(
                            StructType(
                                [
                                    StructField("type", StringType()),
                                    StructField("media_url_https", StringType()),
                                    StructField(
                                        "video_info",
                                        StructType(
                                            [StructField("variants", ArrayType(_VARIANT))]
                                        ),
                                    ),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)

_WH_RE = r"/(\d+)x(\d+)/"  # generic_extractor/twitter.py:21 (\/(\d+)x(\d+)\/)


def choose_variant_expr(variants: Column) -> Column:
    """The reference's sequential best-variant fold
    (generic_extractor/twitter.py:17-30), bit-exact as an ``aggregate``:

    * ``video/mp4`` variants with a ``/WxH/`` path segment replace the pick
      when ``w > best_w OR h > best_h`` (both dims then update);
    * mp4 variants *without* parseable dims never replace anything;
    * non-mp4 variants are taken only while no pick exists yet.

    Returns struct(url, content_type) — null url when no variants.
    """
    acc0 = F.struct(
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("string").alias("ct"),
        F.lit(0).alias("w"),
        F.lit(0).alias("h"),
    )

    def step(acc, var):
        w = F.regexp_extract(var["url"], _WH_RE, 1).try_cast("int")
        h = F.regexp_extract(var["url"], _WH_RE, 2).try_cast("int")
        is_mp4 = var["content_type"] == "video/mp4"
        better = is_mp4 & w.isNotNull() & ((w > acc["w"]) | (h > acc["h"]))
        first_other = (~is_mp4) & acc["url"].isNull()
        return (
            F.when(
                better,
                F.struct(
                    var["url"].alias("url"), var["content_type"].alias("ct"),
                    w.alias("w"), h.alias("h"),
                ),
            )
            .when(
                first_other,
                F.struct(
                    var["url"].alias("url"), var["content_type"].alias("ct"),
                    acc["w"].alias("w"), acc["h"].alias("h"),
                ),
            )
            .otherwise(acc)
        )

    picked = F.aggregate(F.coalesce(variants, F.array().cast(ArrayType(_VARIANT))), acc0, step)
    return F.struct(picked["url"].alias("url"), picked["ct"].alias("content_type"))


# created_at format "Sun Feb 08 18:45:00 +0000 2026"
# (generic_extractor/twitter.py:131: "%a %b %d %H:%M:%S %z %Y").
# Spark's parser rejects week-based 'E' patterns, so the weekday token is
# stripped first — faithful to strptime, which never cross-validates %a
# against the date anyway.
_TW_TS_FMT = "MMM dd HH:mm:ss xx yyyy"


def twitter_parse_cols(post_json: Column) -> list[Column]:
    """Columns (author, title, content, ts, status, media) from one
    fxtwitter-normalized tweet document (generic_extractor/twitter.py
    create_metadata, :120-169):

    * title = ``author - full_text`` (:139), content = full_text;
    * timestamp from created_at via the twitter date format (:131);
    * per-media (src, mimetype): photo -> best-quality media_url_https +
      image/jpeg (:149-151); video -> choose_variant (:152-155);
      animated_gif -> variants[0] (:156-158);
    * no media -> status 'twitter-ytdl', else 'twitter: success' (:141-144).
    """
    from ..functions.url_exprs import twitter_best_quality_expr  # noqa: PLC0415

    p = F.from_json(post_json, TW_POST_SCHEMA)
    author = p["user"]["name"]
    text = F.coalesce(p["full_text"], F.lit(""))
    ts = F.to_timestamp(
        F.regexp_replace(p["created_at"], r"^[A-Za-z]{3} ", ""), _TW_TS_FMT
    )
    media = F.coalesce(
        p["entities"]["media"], F.array().cast(TW_POST_SCHEMA["entities"].dataType["media"].dataType)
    )

    def entry(m):
        photo = F.struct(
            twitter_best_quality_expr(m["media_url_https"]).alias("src"),
            F.lit("image/jpeg").alias("mimetype"),
        )
        chosen = choose_variant_expr(m["video_info"]["variants"])
        video = F.struct(chosen["url"].alias("src"), chosen["content_type"].alias("mimetype"))
        g = F.try_element_at(m["video_info"]["variants"], F.lit(1))
        gif = F.struct(g["url"].alias("src"), g["content_type"].alias("mimetype"))
        return (
            F.when(m["type"] == "photo", photo)
            .when(m["type"] == "video", video)
            .when(m["type"] == "animated_gif", gif)
        )

    media_out = F.filter(F.transform(media, entry), lambda e: e.isNotNull())
    status = F.when(F.size(media_out) == 0, "twitter-ytdl").otherwise(F.lit("twitter: success"))
    return [
        author.alias("author"),
        F.concat(author, F.lit(" - "), text).alias("title"),
        text.alias("content"),
        ts.alias("ts"),
        status.alias("status"),
        media_out.alias("media"),
    ]


# ---- X10: Wayback SPN submit/status ------------------------------------------------

WAYBACK_STATUS_SCHEMA = StructType(
    [
        StructField("status", StringType()),
        StructField("status_ext", StringType()),
        StructField("timestamp", StringType()),
        StructField("original_url", StringType()),
        StructField("job_id", StringType()),
    ]
)

_WB = "https://web.archive.org"


def wayback_submit_payload(url: Column, if_not_archived_within: Column | None = None) -> Column:
    """The /save POST form body (wayback_extractor_enricher.py:43-49):
    ``url`` always; ``if_not_archived_within`` only when configured."""
    base = F.create_map(F.lit("url"), url)
    if if_not_archived_within is None:
        return base
    return F.when(
        if_not_archived_within.isNull(), base
    ).otherwise(
        F.map_concat(
            base, F.create_map(F.lit("if_not_archived_within"), if_not_archived_within)
        )
    )


def wayback_status_cols(status_json: Column, url: Column) -> list[Column]:
    """Decision surface of the SPN status poll
    (wayback_extractor_enricher.py:83-110):

    * ``status == "success"`` -> wayback cell =
      ``https://web.archive.org/web/{timestamp}/{original_url}``;
    * ``status == "pending"`` -> cell = the ``/save/status/{job_id}`` check
      URL (the batch analog of "timeout reached, enrich the job_id");
    * blocked/unauthorized ``status_ext`` -> cell = the status_ext (:96-98);
    * any other failure -> cell = "failed";
    plus the ``check wayback`` column ``/web/*/{url}`` every row gets (:109).
    """
    s = F.from_json(status_json, WAYBACK_STATUS_SCHEMA)
    success_url = F.concat(
        F.lit(_WB + "/web/"), s["timestamp"], F.lit("/"), s["original_url"]
    )
    check_status = F.concat(F.lit(_WB + "/save/status/"), s["job_id"])
    blocked = s["status_ext"].isin("error:blocked-url", "error:unauthorized")
    cell = (
        F.when(s["status"] == "success", success_url)
        .when(s["status"] == "pending", check_status)
        .when(blocked, s["status_ext"])
        .otherwise(F.lit("failed"))
    )
    return [
        cell.alias("wayback"),
        F.concat(F.lit(_WB + "/web/*/"), url).alias("check_wayback"),
        (s["status"] == "success").alias("ok"),
    ]


# ---- X11: Instagram API item JSON -------------------------------------------------

_IG_SUB = StructType(
    [
        StructField("id", StringType()),
        StructField("pk", StringType()),
        StructField("thumbnail_url", StringType()),
        StructField("video_url", StringType()),
    ]
)
IG_ITEM_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("pk", StringType()),
        StructField("code", StringType()),
        StructField("taken_at", StringType()),
        StructField("taken_at_ts", StringType()),
        StructField("caption_text", StringType()),
        StructField("thumbnail_url", StringType()),
        StructField("video_url", StringType()),
        StructField("carousel_media", ArrayType(_IG_SUB)),
        StructField("resources", ArrayType(_IG_SUB)),
    ]
)

# cleanup_dict (instagram_api_extractor.py:77-90): geometry keys dropped,
# empty-ish values dropped
_IG_DROP_KEYS = ("x", "y", "width", "height")
_IG_EMPTY_VALUES = ("", "0", "0.0", "null", "[]", "{}")


def instagram_cleanup_map(m: Column) -> Column:
    """``cleanup_dict`` semantics on a flat map<string,string>: drop the
    geometry keys and every empty-ish value (the recursive dict version
    repeats this per nesting level; a columnar pipeline applies it per
    exploded level)."""
    return F.map_filter(
        m,
        lambda k, v: ~k.isin(*_IG_DROP_KEYS)
        & v.isNotNull()
        & ~v.isin(*_IG_EMPTY_VALUES),
    )


def instagram_media_cols(item_json: Column) -> list[Column]:
    """Columns (post_url, media_src, media_kind, media_id, taken_at,
    caption) from one Instagram API item document
    (instagram_api_extractor.py:302-380):

    * post URL from ``code`` (:315-316);
    * the item's ``video_url`` wins, else ``thumbnail_url``; when the main
      item has neither, the FIRST element of ``resources`` (alias
      ``carousel_media``) provides the media — and its own id (:318-323,
      :352-371);
    * ``media_id`` = id else pk of whichever item provided the media;
      ``taken_at`` falls back to ``taken_at_ts`` (:360-361).
    """
    p = F.from_json(item_json, IG_ITEM_SCHEMA)
    res = F.coalesce(p["resources"], p["carousel_media"], F.array().cast(ArrayType(_IG_SUB)))
    first = F.try_element_at(res, F.lit(1))
    main_src = F.coalesce(p["video_url"], p["thumbnail_url"])
    sub_src = F.coalesce(first["video_url"], first["thumbnail_url"])
    src = F.coalesce(main_src, sub_src)
    kind = (
        F.when(p["video_url"].isNotNull(), "video")
        .when(p["thumbnail_url"].isNotNull(), "image")
        .when(first["video_url"].isNotNull(), "video")
        .when(first["thumbnail_url"].isNotNull(), "image")
    )
    media_id = F.when(
        main_src.isNotNull(), F.coalesce(p["id"], p["pk"])
    ).otherwise(F.coalesce(first["id"], first["pk"]))
    return [
        F.when(
            p["code"].isNotNull(),
            F.concat(F.lit("https://www.instagram.com/p/"), p["code"], F.lit("/")),
        ).alias("post_url"),
        src.alias("media_src"),
        kind.alias("media_kind"),
        media_id.alias("media_id"),
        F.coalesce(p["taken_at"], p["taken_at_ts"]).alias("taken_at"),
        p["caption_text"].alias("caption"),
    ]


# ---- X8: antibot dropin routing + VK sanitize -------------------------------------

# VkDropin url patterns (antibot_extractor_enricher/dropins/vk.py:15-18),
# applied in declaration order — first match wins (:38-46)
_VK_PATTERNS = (
    r"(wall.{0,1}\d+_\d+)",
    r"(video.{0,1}\d+_\d+(?:_\w+)?)",
    r"(clip.{0,1}\d+_\d+)",
    r"(photo.{0,1}\d+_\d+)",
)


def antibot_sanitize_expr(url: Column) -> Column:
    """X8's deterministic half — the antibot module's per-dropin
    ``sanitize_url`` dispatch (antibot_extractor_enricher.py:64-68: first
    suitable dropin rewrites; others are identity). Only the VK dropin
    rewrites (dropins/vk.py:38-46): modal URLs like
    ``https://vk.com/page?w=wall-123_456`` become
    ``https://vk.com/wall-123_456``; the browser-automation half is out of
    scope. Native Catalyst — an ordered first-match over the four patterns,
    gated on the dropin's ``suitable`` substring check."""
    first = None
    for pat in _VK_PATTERNS:
        m = F.nullif(F.regexp_extract(url, pat, 1), F.lit(""))
        first = m if first is None else F.coalesce(first, m)
    is_vk = url.contains("vk.com")
    return F.when(
        is_vk & first.isNotNull(), F.concat(F.lit("https://vk.com/"), first)
    ).otherwise(url)


# ---- X2: yt-dlp info-dict -> Metadata mapping (add_metadata kernel) ---------------

_YTDLP_INFO_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("fulltitle", StringType()),
        StructField("description", StringType()),
        StructField("timestamp", LongType()),
        StructField("upload_date", StringType()),
        StructField("uploader", StringType()),
        StructField("view_count", LongType()),
        StructField(
            "comments",
            ArrayType(
                StructType(
                    [
                        StructField("text", StringType()),
                        StructField("author", StringType()),
                        StructField("timestamp", LongType()),
                    ]
                )
            ),
        ),
    ]
)


def _iso_utc(epoch: Column) -> Column:
    # datetime.fromtimestamp(ts, tz=utc).isoformat() shape; session tz is UTC
    return F.concat(F.from_unixtime(epoch, "yyyy-MM-dd'T'HH:mm:ss"), F.lit("+00:00"))


def ytdlp_metadata_cols(
    info_json: Column,
    prior_title: Column,
    prior_content: Column,
    prior_ts_iso: Column,
) -> list[Column]:
    """X2's deterministic core — the generic yt-dlp extractor's info-dict →
    Metadata mapping (generic_extractor.py:297-348 ``add_metadata``), with
    the network fetch out of scope:

    * title: keep a truthy prior, else ``title``, else ``fulltitle``,
      else '' (:305-306 pop-with-fallback);
    * content: keep a truthy prior, else ``description`` (:310-311);
    * timestamp: iff unset and truthy, epoch → UTC isoformat (:327-330);
    * upload_date: ``%Y%m%d`` → UTC date (:332-335);
    * comments → (author, text, UTC timestamp) list (:313-325);
    * remaining truthy keys survive the keys_to_clean projection (:337-343,
      P15 kernel) — represented by ``uploader``/``view_count``: NULL when
      falsy, like the ``if v:`` guard.

    Native Catalyst: one from_json + conditional projections."""
    d = F.from_json(info_json, _YTDLP_INFO_SCHEMA)
    has_prior_title = prior_title.isNotNull() & (prior_title != "")
    has_prior_content = prior_content.isNotNull() & (prior_content != "")
    title = (
        F.when(has_prior_title, prior_title)
        .when(d["title"].isNotNull(), d["title"])
        .otherwise(F.coalesce(d["fulltitle"], F.lit("")))
    )
    content = (
        F.when(has_prior_content, prior_content)
        .when(d["description"].isNotNull(), d["description"])
        .otherwise(F.lit(""))
    )
    ts = F.when(prior_ts_iso.isNotNull(), prior_ts_iso).otherwise(
        F.when((d["timestamp"].isNotNull()) & (d["timestamp"] != 0), _iso_utc(d["timestamp"]))
    )
    upload_date = F.to_date(d["upload_date"], "yyyyMMdd").cast("string")
    comments = F.when(
        d["comments"].isNotNull(),
        F.array_join(
            F.transform(
                d["comments"],
                lambda c: F.concat_ws(
                    ":", c["author"], c["text"], _iso_utc(c["timestamp"])
                ),
            ),
            "|",
        ),
    )
    uploader = F.when((d["uploader"].isNotNull()) & (d["uploader"] != ""), d["uploader"])
    view_count = F.when(
        (d["view_count"].isNotNull()) & (d["view_count"] != 0), d["view_count"]
    )
    return [
        title.alias("title"),
        content.alias("content"),
        ts.alias("ts_iso"),
        upload_date.alias("upload_date"),
        comments.alias("comments_csv"),
        uploader.alias("uploader"),
        view_count.alias("view_count"),
    ]
