"""F5 metadata extraction: real header parsing over the fixture payloads +
native basket selection."""

from pyspark.sql import functions as F

from auto_archiver_spark.functions.exif import basket_expr, image_metadata, image_metadata_udf
from auto_archiver_spark.sources.fixture import image_record, images_df


def test_image_metadata_parses_real_headers():
    rec = image_record(3)  # png row (3 % 3 == 0)
    meta = image_metadata(rec["bytes"])
    assert meta["format"] == "png"
    assert int(meta["width"]) == rec["w"] and int(meta["height"]) == rec["h"]
    assert meta["bit_depth"] == "8" and meta["color_type"] == "2"
    assert meta["chunks"].startswith("IHDR") and meta["chunks"].endswith("IEND")
    assert int(meta["bytes"]) == len(rec["bytes"])
    rec2 = image_record(1)  # jpeg/QJPG row
    assert image_metadata(rec2["bytes"])["format"] == "qjpg"


def test_metadata_udf_and_baskets(spark):
    imgs = images_df(spark, 24, partitions=2)
    enriched = imgs.select(
        "image_id", "w", "h", "fmt", image_metadata_udf(F.col("bytes")).alias("meta")
    )
    rows = enriched.select(
        "image_id",
        "w",
        "h",
        "fmt",
        basket_expr(F.col("meta"), "geometry").alias("geom"),
        basket_expr(F.col("meta"), "format").alias("fmt_basket"),
    ).collect()
    assert len(rows) == 24
    for r in rows:
        assert int(r.geom["width"]) == r.w and int(r.geom["height"]) == r.h
        assert set(r.geom.keys()) == {"width", "height"}
        expect_fmt = "png" if r.fmt == "png" else "qjpg"
        assert r.fmt_basket["format"] == expect_fmt
        assert "width" not in r.fmt_basket  # basket filter really filters


def test_media_kind_predicates(spark):
    """F7 (media.py:99-106): mimetype-prefix kind tests."""
    from auto_archiver_spark.functions.metadata_exprs import (
        is_audio_expr,
        is_image_expr,
        is_video_expr,
    )

    df = spark.createDataFrame(
        [("image/png",), ("image/jpeg",), ("video/mp4",), ("audio/ogg",),
         ("text/html",), (None,)],
        "mt string",
    )
    rows = df.select(
        "mt",
        is_image_expr(F.col("mt")).alias("i"),
        is_video_expr(F.col("mt")).alias("v"),
        is_audio_expr(F.col("mt")).alias("a"),
    ).collect()
    got = {r.mt: (r.i, r.v, r.a) for r in rows}
    assert got["image/png"] == (True, False, False)
    assert got["video/mp4"] == (False, True, False)
    assert got["audio/ogg"] == (False, False, True)
    assert got["text/html"] == (False, False, False)
    assert got[None] == (False, False, False)
