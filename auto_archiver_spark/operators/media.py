"""J4 — media ↔ result nested association: explode / process / re-collect.

The reference walks a result's nested media list imperatively
(core/metadata.py:152-162 ``add_media``/``get_media_by_id``;
core/media.py:37-55 ``all_inner_media`` one-level flatten) so that storages
and enrichers can process each media item individually and the result keeps
its ordered list. The Spark-native equivalent is an explode → per-child
transformation → ordered re-collect round trip:

* ``explode_media`` emits one child row per media element carrying the
  parent key and the element's original position — a narrow generator, no
  shuffle;
* ``recollect_media`` groups children back per parent and re-assembles the
  array **in original order** (sort by the carried position inside the
  aggregated list — deterministic regardless of shuffle arrival order).

One shuffle total (the groupBy), on the parent key the downstream writeback
join uses anyway. Parents with empty media survive the round trip via
``posexplode_outer`` + a null-compact at re-collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def explode_media(
    results: DataFrame, key_cols: list[str] | None = None, media_col: str = "media"
) -> DataFrame:
    """One row per media element: (*key_cols, pos, m). ``pos`` is the
    element's index in the parent array; parents with an empty/null array
    emit one row with null (pos, m) so re-collect restores them."""
    key_cols = key_cols or ["url_hash"]
    return results.select(
        *key_cols, F.posexplode_outer(media_col).alias("pos", "m")
    )


def recollect_media(
    children: DataFrame, key_cols: list[str] | None = None, media_col: str = "media"
) -> DataFrame:
    """Inverse of ``explode_media``: per parent, the media array re-assembled
    in original element order (children may arrive in any partition order —
    the carried ``pos`` is the sort key, not arrival order)."""
    key_cols = key_cols or ["url_hash"]
    ordered = F.transform(
        F.array_sort(
            F.filter(
                F.collect_list(F.struct("pos", "m")), lambda s: s["pos"].isNotNull()
            )
        ),
        lambda s: s["m"],
    )
    return children.groupBy(*key_cols).agg(ordered.alias(media_col))


def probe_media(df: DataFrame, id_cols: list[str], bytes_col: str = "bytes") -> DataFrame:
    """F8 valid-media probe (reference core/media.py:108-130: ffprobe stream
    check for videos, decode verify for images, size-threshold fallback when
    no prober exists): decode-verify each payload with the real codec and
    report (probe_ok, probe_w, probe_h, probe_err).

    ``probe_err`` is a coarse deterministic category — ``empty`` (null/zero
    bytes) or ``decode_error`` — never an exception message, so downstream
    filters and the cross-engine gate stay stable. Arrow-batched
    ``mapInPandas``; only the per-payload decode loops (payload decode is
    genuinely per-row work, like the fetch UDF)."""
    from collections.abc import Iterator  # noqa: PLC0415

    import pandas as pd  # noqa: PLC0415

    from ..functions.codec import decode_image  # noqa: PLC0415

    out_schema = StructType(
        list(df.select(*id_cols).schema.fields)
        + [
            StructField("probe_ok", BooleanType()),
            StructField("probe_w", IntegerType()),
            StructField("probe_h", IntegerType()),
            StructField("probe_err", StringType()),
        ]
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[id_cols].copy()
            n = len(pdf)
            ok = [False] * n
            w = [None] * n
            h = [None] * n
            err = [None] * n
            payloads = pdf[bytes_col].to_numpy()
            for i in range(n):
                b = payloads[i]
                if b is None or len(b) == 0:
                    err[i] = "empty"
                    continue
                try:
                    px = decode_image(bytes(b))
                    ok[i] = True
                    h[i], w[i] = int(px.shape[0]), int(px.shape[1])
                except Exception:  # noqa: BLE001 — any decode failure is the signal
                    err[i] = "decode_error"
            out["probe_ok"] = pd.Series(ok, index=pdf.index)
            out["probe_w"] = pd.Series(w, index=pdf.index, dtype="object")
            out["probe_h"] = pd.Series(h, index=pdf.index, dtype="object")
            out["probe_err"] = pd.Series(err, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(probe, out_schema)


_CURATION_SCHEMA = StructType(
    [
        StructField("img_w", IntegerType()),
        StructField("img_h", IntegerType()),
        StructField("mean_red_milli", LongType()),
        StructField("is_flat", BooleanType()),
        StructField("aspect_ok", BooleanType()),
        StructField("min_dim_ok", BooleanType()),
        StructField("img_err", StringType()),
    ]
)

# image-curation thresholds (LAION-style published filter shapes: aspect
# ratio within [1/4, 4], smallest side >= 32 px)
_ASPECT_MAX = 4.0
_MIN_DIM = 32


def image_curation(df: DataFrame, id_cols: list[str], bytes_col: str = "bytes") -> DataFrame:
    """Training-data image curation stats (engine tier; the reference
    archives media — a 100 TB image+caption corpus additionally filters
    them): per payload the decoded dimensions, an exact pixel statistic
    (floor(1000 * mean(red)) — integer arithmetic so the cross-engine gate
    has no float), a flat-image flag (zero information content), and the
    published aspect-ratio / min-dimension filter flags. Arrow-batched
    ``mapInPandas`` over the real codec; coarse error categories like
    probe_media."""
    from collections.abc import Iterator  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    from ..functions.codec import decode_image  # noqa: PLC0415

    src = df.select(*id_cols, bytes_col)
    out_schema = StructType([src.schema[c] for c in id_cols] + list(_CURATION_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[bytes_col]:
                if raw is None or len(raw) == 0:
                    rows.append((None, None, None, None, None, None, "empty"))
                    continue
                try:
                    px = decode_image(bytes(raw))
                    h, w = px.shape[:2]
                    red = px[:, :, 0].astype(np.int64)
                    mean_milli = int(1000 * int(red.sum()) // (h * w))
                    flat = bool((px == px[0, 0]).all())
                    aspect = w / h if h else 0.0
                    aspect_ok = bool(1.0 / _ASPECT_MAX <= aspect <= _ASPECT_MAX)
                    min_ok = bool(min(w, h) >= _MIN_DIM)
                    rows.append((w, h, mean_milli, flat, aspect_ok, min_ok, None))
                except (ValueError, IndexError, KeyError):
                    rows.append((None, None, None, None, None, None, "decode_error"))
            parsed = pd.DataFrame(
                rows, columns=[f.name for f in _CURATION_SCHEMA.fields], index=pdf.index
            )
            yield pd.concat([pdf[id_cols], parsed], axis=1)

    return src.mapInPandas(run, schema=out_schema)
