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
