"""K7 — GDrive-storage deterministic half: folder-tree upsert + URL
resolution as set algebra.

The reference walks each media key's folder chain imperatively per upload —
find-or-create every path segment under a root folder, then upload and
derive the share URL (`modules/gdrive_storage/gdrive_storage.py`:
``upload`` :84-93 find-or-create loop, ``_mkdir`` :180-186,
``get_cdn_url`` :57-76, and ``_get_id_from_parent_and_name`` :115-178 whose
duplicate policy is "return the LAST match" :164-168). The OAuth/Drive API
transport is declared external; what is portable is the tree algebra, and
per-row imperative find-or-create is exactly what does not scale — a wave
of 10^7 uploads would issue 10^7 sequenced API lookups.

Spark-native re-expression:

* every folder chain is derivable from the key alone: ``posexplode`` the
  path prefixes → the full folder dimension in ONE narrow pass, no
  per-level iteration (a prefix IS its own parent chain);
* "find or create" is a ``distinct`` + left-anti join against the existing
  folder dimension — one shuffle on the tiny folder table, idempotent
  across waves (re-running a wave creates nothing new);
* ids are content-addressed (md5 of the root-relative path) instead of
  server-assigned — deterministic, collision-checked at parity with the
  S3 content-addressing the engine already uses (K6), and what makes the
  upsert a pure set operation;
* duplicate (parent, name) rows — the reference's multi-match case —
  resolve by ``max_by(ord)``: last match wins, exactly :168.

At 100 TB: the folder dimension is minuscule next to the file table
(thousands of distinct prefixes vs billions of files) — resolution joins
broadcast it; the only shuffle is the distinct over exploded prefixes,
which AQE-coalesces to nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _drive_id(path_expr):
    """Deterministic 16-hex 'drive id' for a root-relative path (the
    content-addressed stand-in for the server-assigned Drive id)."""
    return F.substring(F.md5(path_expr), 1, 16)


def folder_prefixes(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """One row per (key, folder-chain prefix): ``path`` (root-relative
    folder path), ``parent_path`` ('' at the root), ``name``, ``depth``
    (1-based). Files at the root emit no rows — Drive keys are
    folder-scoped like the reference ("only support files saved in a
    folder for GD", gdrive_storage.py:59-61)."""
    segs = F.split(F.col(key_col), "/")
    parts = keys.select(
        key_col,
        F.slice(segs, 1, F.size(segs) - 1).alias("folders"),
    )
    return parts.select(
        key_col,
        F.posexplode("folders").alias("pos", "name"),
        F.col("folders"),
    ).select(
        key_col,
        F.array_join(F.slice("folders", 1, F.col("pos") + 1), "/").alias("path"),
        F.array_join(F.slice("folders", 1, F.col("pos")), "/").alias("parent_path"),
        "name",
        (F.col("pos") + 1).alias("depth"),
    )


def upsert_folder_tree(
    keys: DataFrame, existing: DataFrame | None = None, key_col: str = "key"
) -> DataFrame:
    """The folders that must be CREATED for this batch: distinct folder
    prefixes across all keys, minus those already in ``existing``
    (columns: path). Returns (path, parent_path, name, depth, folder_id,
    parent_id) — parent ids content-derived, root parent = 'root' like the
    reference's ``root_folder_id`` seed.

    Plan shape (test_plans.py): parent/name/depth are FUNCTIONS of the path,
    so the distinct runs on ``path`` alone — one hash exchange, whose
    partitioning the anti-join immediately reuses (distinct on all four
    columns would force a second re-shuffle on path for the join) — and the
    derived columns are a post-join projection."""
    dim = folder_prefixes(keys, key_col).select("path").distinct()
    if existing is not None:
        dim = dim.join(existing.select("path"), "path", "left_anti")
    segs = F.split(F.col("path"), "/")
    parent = F.when(
        F.size(segs) > 1, F.array_join(F.slice(segs, 1, F.size(segs) - 1), "/")
    ).otherwise(F.lit(""))
    return dim.select(
        "path",
        parent.alias("parent_path"),
        F.element_at(segs, -1).alias("name"),
        F.size(segs).alias("depth"),
        _drive_id(F.col("path")).alias("folder_id"),
        F.when(parent == "", F.lit("root"))
        .otherwise(_drive_id(parent))
        .alias("parent_id"),
    )


def resolve_drive_urls(keys: DataFrame, key_col: str = "key") -> DataFrame:
    """Per file key: leaf folder path/id, file id, and the share URL the
    reference derives (``get_cdn_url`` :76
    ``https://drive.google.com/file/d/{file_id}/view?usp=sharing``).
    Root-level keys (no folder) get a null folder and no URL, mirroring the
    reference's folder-only support."""
    segs = F.split(F.col(key_col), "/")
    folder_path = F.array_join(F.slice(segs, 1, F.size(segs) - 1), "/")
    has_folder = F.size(segs) > 1
    file_id = _drive_id(F.concat(F.lit("file:"), F.col(key_col)))
    return keys.withColumn(
        "folder_path", F.when(has_folder, folder_path)
    ).withColumn(
        "folder_id", F.when(has_folder, _drive_id(folder_path))
    ).withColumn(
        "file_id", F.when(has_folder, file_id)
    ).withColumn(
        "cdn_url",
        F.when(
            has_folder,
            F.concat(F.lit("https://drive.google.com/file/d/"), file_id,
                     F.lit("/view?usp=sharing")),
        ),
    )


def pick_last_match(matches: DataFrame, group_cols: list[str], ord_col: str = "ord") -> DataFrame:
    """Duplicate-name resolution: among several files/folders with the same
    (parent, name), keep the one with the highest ``ord_col`` — the
    reference returns ``items[-1]`` of the API listing
    (gdrive_storage.py:164-168). One map-side-combinable agg, no window."""
    others = [c for c in matches.columns if c not in group_cols]
    return matches.groupBy(*group_cols).agg(
        *[F.max_by(c, ord_col).alias(c) for c in others]
    )
