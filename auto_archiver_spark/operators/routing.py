"""P4 extractor routing — `suitable`/`match_link` regex dispatch as a column.

Reference: core/extractor.py:43-62 — each extractor declares URL regexes;
the orchestrator tries extractors *in configured order* and the first whose
pattern matches handles the URL (then X3 first-success falls through to the
next on failure, orchestrator.py:632-640). The yt-dlp IE enumeration
(generic_extractor.py:171-190) is the same shape with a catch-all tail.

Spark design: routing is a pure ``when(url rlike p1, 'e1').when(...)``
CASE chain — codegen'd, order-preserving, no UDF. The per-route fetch then
becomes either (a) one fetch UDF parameterized by the route column, or
(b) per-route filtered branches unioned back; the engine uses (a) in the
wave driver and exposes ``first_success`` (operators/merge.py) for the
multi-attempt merge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# default route table (order matters — first match wins, like the
# orchestrator's configured extractor order). Patterns are re.search-style
# (unanchored), mirroring match_link's re.match on ``https?://...`` patterns.
DEFAULT_ROUTES: list[tuple[str, str]] = [
    ("twitter", r"^https?://(www\.)?(twitter\.com|x\.com|t\.co|pbs\.twimg\.com)/"),
    ("telegram", r"^https?://t\.me/"),
    ("instagram", r"^https?://(www\.)?instagram\.com/"),
    ("bluesky", r"^https?://(www\.)?bsky\.app/"),
    ("gallery", r"^https?://[^/]+/gallery/"),
    # catch-all generic (yt-dlp) extractor — always last
    ("generic", r"^https?://"),
]


def route_expr(url: Column, routes: list[tuple[str, str]] | None = None) -> Column:
    """First-matching-route column; NULL when nothing (not even the
    catch-all) matches — the orchestrator's 'no extractor suitable' case."""
    out = F.lit(None).cast("string")
    for name, pattern in reversed(routes or DEFAULT_ROUTES):
        out = F.when(url.rlike(pattern), F.lit(name)).otherwise(out)
    return out
