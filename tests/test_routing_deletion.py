"""P4 extractor routing and P13 deletion detection units."""

from pyspark.sql import functions as F

from auto_archiver_spark.operators.deletion import GENERIC, INDICATORS, detect_deletion_cols
from auto_archiver_spark.operators.routing import DEFAULT_ROUTES, route_expr


def _routes_of(spark, urls, routes=None):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select("url", route_expr(F.col("url"), routes).alias("r")).collect()
    return {r.url: r.r for r in rows}


def test_default_route_dispatch(spark):
    got = _routes_of(
        spark,
        [
            "https://x.com/media/1",
            "https://twitter.com/status/2",
            "https://t.me/chan/3",
            "https://www.instagram.com/p/4",
            "https://bsky.app/profile/p/5",
            "https://media.site/gallery/6",
            "https://blog.example.org/p/7",
            "ftp://not.http/8",
        ],
    )
    assert got["https://x.com/media/1"] == "twitter"
    assert got["https://twitter.com/status/2"] == "twitter"
    assert got["https://t.me/chan/3"] == "telegram"
    assert got["https://www.instagram.com/p/4"] == "instagram"
    assert got["https://bsky.app/profile/p/5"] == "bluesky"
    assert got["https://media.site/gallery/6"] == "gallery"
    assert got["https://blog.example.org/p/7"] == "generic"
    assert got["ftp://not.http/8"] is None  # no extractor suitable


def test_route_order_changes_winner(spark):
    """The reference tries extractors in CONFIGURED order (orchestrator
    :632-640) — a URL matching two patterns routes to whichever is first."""
    url = "https://x.com/gallery/9"  # matches both twitter and gallery
    tw_first = [r for r in DEFAULT_ROUTES]
    gal_first = sorted(DEFAULT_ROUTES, key=lambda r: r[0] != "gallery")
    assert _routes_of(spark, [url], tw_first)[url] == "twitter"
    assert _routes_of(spark, [url], gal_first)[url] == "gallery"


def _detect(spark, url, html=None, title=None, error=None):
    df = spark.createDataFrame([(url, html, title, error)], "u string, h string, t string, e string")
    return df.select(
        *detect_deletion_cols(F.col("u"), F.col("h"), F.col("t"), F.col("e"))
    ).collect()[0]


def test_deletion_platform_specific_phrases(spark):
    r = _detect(spark, "https://x.com/s/1", html="... This Tweet has been deleted ...")
    assert r.is_deleted and r.platform == "twitter"
    assert r.indicator == "This Tweet has been deleted" and r.source == "html_content"
    # same phrase on a non-twitter platform: not in its table, not generic
    r2 = _detect(spark, "https://vk.com/s/1", html="... This Tweet has been deleted ...")
    assert not r2.is_deleted and r2.platform == "vk"


def test_deletion_generic_and_unknown_platform(spark):
    r = _detect(spark, "https://random.example/s/1", html="content no longer available here")
    assert r.is_deleted and r.platform == "unknown"
    assert r.indicator == "no longer available"


def test_deletion_source_priority_html_beats_title(spark):
    """detect_deletion checks html before title before error (:181-200)."""
    r = _detect(
        spark,
        "https://www.youtube.com/watch?v=1",
        html="Video unavailable",
        title="Page Not Found",
        error="access denied",
    )
    assert r.source == "html_content" and r.indicator == "Video unavailable"
    r2 = _detect(
        spark, "https://www.youtube.com/watch?v=1", title="Page Not Found", error="x"
    )
    assert r2.source == "page_title"


def test_deletion_first_phrase_in_table_order_wins(spark):
    """Within one source, the FIRST phrase of the platform list wins —
    matching the reference's sequential scan of the indicator list."""
    html = "Try searching for something else ... This Tweet is unavailable"
    r = _detect(spark, "https://twitter.com/s/1", html=html)
    idx = {p: i for i, p in enumerate(INDICATORS["twitter"] + GENERIC)}
    assert r.indicator == "Try searching for something else"
    assert idx[r.indicator] < idx["This Tweet is unavailable"]
