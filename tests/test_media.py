"""J4 media explode/re-collect round trip (core/metadata.py:152-162,
core/media.py:37-55): order-preserving identity, empty parents survive,
robust to shuffle arrival order."""

from pyspark.sql import functions as F

from auto_archiver_spark.operators.media import explode_media, recollect_media


def _parents(spark):
    rows = [
        (1, [("a", 10), ("b", 20), ("c", 30)]),
        (2, []),
        (3, [("z", 1)]),
        (4, [(f"m{i}", i) for i in range(25)]),  # enough to straddle partitions
    ]
    return spark.createDataFrame(
        rows, "url_hash long, media array<struct<id:string,size:bigint>>"
    )


def test_round_trip_identity_and_order(spark):
    parents = _parents(spark)
    children = explode_media(parents).repartition(7)  # scramble arrival order
    back = recollect_media(children)
    got = {r.url_hash: [(m.id, m.size) for m in r.media] for r in back.collect()}
    want = {r.url_hash: [(m.id, m.size) for m in r.media] for r in parents.collect()}
    assert got == want  # includes url_hash=2 -> [] (empty parent survives)


def test_explode_process_recollect(spark):
    """The J4 use: per-child enricher between the halves keeps association."""
    parents = _parents(spark)
    children = explode_media(parents)
    processed = children.withColumn(
        "m",
        F.when(
            F.col("m").isNotNull(),
            F.struct(F.upper("m.id").alias("id"), (F.col("m.size") + 1).alias("size")),
        ),
    )
    back = recollect_media(processed)
    got = {r.url_hash: [(m.id, m.size) for m in r.media] for r in back.collect()}
    assert got[1] == [("A", 11), ("B", 21), ("C", 31)]
    assert got[2] == []
    assert got[4][:3] == [("M0", 1), ("M1", 2), ("M2", 3)]


def test_probe_media_categories(spark):
    """F8 decode-verify probe: valid containers report ok+dims; truncated/
    garbage report decode_error; null/empty report empty."""
    import numpy as np

    from auto_archiver_spark.functions.codec import encode_image
    from auto_archiver_spark.operators.media import probe_media

    px = np.zeros((5, 7, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_image(px, "png"))),
        (2, bytearray(encode_image(px, "jpeg"))),
        (3, bytearray(encode_image(px, "png")[:12])),
        (4, bytearray(b"not an image")),
        (5, None),
        (6, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "id long, bytes binary")
    got = {r.id: r for r in probe_media(df, ["id"]).collect()}
    for i in (1, 2):
        assert got[i].probe_ok and (got[i].probe_w, got[i].probe_h) == (7, 5)
        assert got[i].probe_err is None
    for i in (3, 4):
        assert not got[i].probe_ok and got[i].probe_err == "decode_error"
        assert got[i].probe_w is None
    for i in (5, 6):
        assert not got[i].probe_ok and got[i].probe_err == "empty"
