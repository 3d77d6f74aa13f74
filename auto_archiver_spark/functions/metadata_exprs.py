"""Metadata-row scalar operators: A10 is_empty, P15 keys_to_clean,
F14 JSON dump, F19 archive duration — all native Column algebra.

Reference semantics:
  * A10 ``Metadata.is_empty`` (core/metadata.py:98-102): no success AND no
    media AND no metadata keys beyond the bookkeeping set.
  * P15 ``keys_to_clean`` (modules/generic_extractor/generic_extractor.py:
    224-295): drop ~60 noisy yt-dlp keys before persisting. The drop list is
    a data table FROM the reference — it IS the behavior being ported.
  * F14 JSON dump (modules/json_enricher/json_enricher.py:10-17): serialize
    the result row; content compared as parsed JSON, layout free.
  * F19 archive duration (modules/meta_enricher/meta_enricher.py:46-50):
    seconds between processing start and end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# metadata.py:99-101 — keys excluded from the "meaningful" test
BOOKKEEPING_KEYS = (
    "_processed_at",
    "url",
    "original_url",
    "total_bytes",
    "total_size",
    "archive_duration_seconds",
)

# generic_extractor.py:229-286 base_keys (deduplicated)
KEYS_TO_CLEAN = (
    "formats", "thumbnail", "display_id", "epoch", "requested_downloads",
    "duration_string", "thumbnails", "http_headers", "webpage_url_basename",
    "webpage_url_domain", "extractor", "extractor_key", "playlist",
    "playlist_index", "protocol", "requested_subtitles", "format_id",
    "acodec", "vcodec", "ext", "_has_drm", "filesize", "audio_ext",
    "video_ext", "vbr", "abr", "resolution", "dynamic_range", "aspect_ratio",
    "cookies", "format", "quality", "preference", "artists", "channel_id",
    "subtitles", "tbr", "url", "original_url", "automatic_captions",
    "playable_in_embed", "live_status", "_format_sort_fields", "chapters",
    "requested_formats", "format_note", "audio_channels", "asr", "fps",
    "was_live", "is_live", "heatmap", "age_limit", "stretched_ratio",
)


def is_empty_expr(status: Column, media: Column, metadata: Column) -> Column:
    """A10: NOT is_success AND media empty AND no meaningful metadata keys.
    ``metadata`` is the map<string,string> overflow column."""
    meaningful = F.filter(
        F.map_keys(metadata), lambda k: ~k.isin(*BOOKKEEPING_KEYS)
    )
    return (
        ~F.coalesce(status, F.lit("")).contains("success")
        & (F.size(F.coalesce(media, F.array())) == 0)
        & (F.size(meaningful) == 0)
    )


def clean_metadata_expr(metadata: Column) -> Column:
    """P15: drop the noisy yt-dlp keys from the metadata map (map_filter —
    native, no shuffle, prunes before the sink)."""
    return F.map_filter(metadata, lambda k, _v: ~k.isin(*KEYS_TO_CLEAN))


def kept_keys_expr(keys: Column) -> Column:
    """P15 on a key-array shape: surviving keys, sorted (for stable output)."""
    return F.array_sort(F.filter(keys, lambda k: ~k.isin(*KEYS_TO_CLEAN)))


def json_dump_expr(*cols: Column) -> Column:
    """F14: compact JSON of the given aliased columns (to_json(struct(...)));
    key order = argument order, matching the reference's dict dump."""
    return F.to_json(F.struct(*cols))


def archive_duration_expr(start_ts: Column, end_ts: Column) -> Column:
    """F19: whole seconds between start and end of processing."""
    return (F.unix_timestamp(end_ts) - F.unix_timestamp(start_ts)).cast("long")


# F7 media-kind predicates (core/media.py:99-106: mimetype prefix tests)


def is_image_expr(mimetype: Column) -> Column:
    return F.coalesce(mimetype, F.lit("")).startswith("image")


def is_video_expr(mimetype: Column) -> Column:
    return F.coalesce(mimetype, F.lit("")).startswith("video")


def is_audio_expr(mimetype: Column) -> Column:
    return F.coalesce(mimetype, F.lit("")).startswith("audio")
