"""URL algebra — Python kernel (reference-parity semantics).

This module is the single source of truth for URL semantics. Every function
here has a matching native-Catalyst Column builder in ``url_exprs.py``; the
pytest suite asserts the two agree on the reference's golden truth tables.

Reference semantics studied (NOT copied) from bellingcat/auto-archiver:
  * tracker stripping        src/auto_archiver/utils/url.py:55-60   (P2)
  * URL validity gate        src/auto_archiver/utils/url.py:12-45   (P1)
  * auth-wall detection      src/auto_archiver/utils/url.py:63-71   (P5)
  * relevance filter         src/auto_archiver/utils/url.py:82-138  (P6)
  * query strip              src/auto_archiver/utils/url.py:74-79   (P7)
  * twitter best quality     src/auto_archiver/utils/url.py:141-153 (P8)
  * media best quality       src/auto_archiver/utils/url.py:156-176 (P9)
  * domain extraction        src/auto_archiver/utils/url.py:48-52   (P10)
Golden cases: reference tests/utils/test_urls.py:14-197.

The *north-rule* canonicalization (``north_norm``) is this engine's own
frontier-key normalization: lowercase scheme+host, strip tracking params,
lexicographically sort the surviving query pairs, drop the fragment. It is
deliberately defined as pure string algebra (split/sort/join — NO percent
re-encoding) so that the exact same computation is expressible as native
Catalyst expressions (see ``url_exprs.north_norm_expr``) and in ANSI SQL for
the DuckDB oracle. The reference-exact ``strip_trackers`` (which *does*
re-encode via urlencode, e.g. ``%20`` -> ``+``) is kept separately for golden
parity.
"""

from __future__ import annotations

import ipaddress
import re
from urllib.parse import parse_qsl, urlencode, urlparse, urlunparse

# Tracking params dropped by the reference's clean() (utils/url.py:56).
TRACKER_PARAMS = frozenset(
    ("utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content", "fbclid", "gclid")
)

# Auth-walled URL patterns (utils/url.py:6-9): telegram private channels, instagram.
_AUTHWALL_PATTERNS = (
    re.compile(r"https?://t\.me/c/.+/\d+"),
    re.compile(r"https?://(www\.)?instagram\.com"),
)

# Irrelevant-media URL markers (utils/url.py:90-118): every inner tuple is an
# AND of substring tests; any tuple matching -> irrelevant. Data table, cited.
IRRELEVANT_MARKERS: tuple[tuple[str, ...], ...] = (
    ("favicon",),
    ("twimg.com/profile_images",),
    ("twimg.com", "default_profile_images"),
    ("https://scontent.cdninstagram.com/", "150x150"),
    ("https://static.cdninstagram.com/rsrc.php/",),
    ("https://telegram.org/img/emoji/",),
    ("https://www.youtube.com/s/gaming/emoji/",),
    ("https://yt3.ggpht.com", "default-user="),
    ("https://www.youtube.com/s/search/audio/",),
    ("https://ok.ru/res/i/",),
    ("https://vk.com/emoji/",),
    ("vk.com/images/",),
    ("vk.com/images/reaction/",),
    ("wikipedia.org/static",),
    ("styles.redditmedia.com",),
    ("emoji.redditmedia.com",),
    ("static.licdn.com",),
)

# Suffixes that are never archivable media (utils/url.py:121-128).
IRRELEVANT_SUFFIXES = (".svg", ".ico", ".m3u8", ".mpd", ".ism")

# --- P1: validity gate -------------------------------------------------------


def url_invalid_reason(url: str) -> str | None:
    """Why a URL must be rejected, or None if archivable.

    Same decision surface as the reference's check_url_or_raise
    (utils/url.py:12-45): http(s) only, non-empty host, no localhost, and for
    IP-literal hosts: globally-reachable, non-reserved, non-link-local,
    non-private.
    """
    if not url.startswith(("http://", "https://")):
        return "scheme"
    parsed = urlparse(url)
    host = parsed.hostname
    if not host:
        return "empty-host"
    if host == "localhost":
        return "localhost"
    try:
        ip = ipaddress.ip_address(host)
    except ValueError:
        return None
    if not ip.is_global:
        return "ip-not-global"
    if ip.is_reserved:
        return "ip-reserved"
    if ip.is_link_local:
        return "ip-link-local"
    if ip.is_private:
        return "ip-private"
    return None


def is_archivable_url(url: str) -> bool:
    return url_invalid_reason(url) is None


# --- P2: reference-exact tracker strip ---------------------------------------


def strip_trackers(url: str) -> str:
    """Reference-exact clean() parity (utils/url.py:55-60).

    Drops tracker query params, re-encodes the survivors with urlencode
    (order preserved; note ``%20`` normalizes to ``+``), leaves the fragment
    untouched.
    """
    parts = urlparse(url)
    survivors = [(k, v) for k, v in parse_qsl(parts.query) if k not in TRACKER_PARAMS]
    return urlunparse(parts._replace(query=urlencode(survivors)))


# --- north-rule canonicalization (frontier key) -------------------------------

# String-level URL anatomy, shared bit-for-bit with url_exprs.py regexes.
_RE_SCHEME_NETLOC_PATH = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)")
_RE_QUERY = re.compile(r"\?([^#]*)")


def north_norm(url: str) -> str:
    """North-rule frontier canonicalization (engine-defined, see module doc).

    lowercase scheme+netloc, '' path -> '/', drop tracker params, sort the
    surviving ``k=v`` strings lexicographically, drop the fragment. Pure
    string algebra (no percent re-encoding) so the native Catalyst twin in
    url_exprs.north_norm_expr computes the identical value.
    """
    m = _RE_SCHEME_NETLOC_PATH.match(url)
    if not m:
        return url
    scheme = m.group(1).lower()
    netloc = m.group(2).lower()
    path = m.group(3) or "/"
    qm = _RE_QUERY.search(url)
    query = qm.group(1) if qm else ""
    kept = sorted(
        p for p in query.split("&") if p and p.split("=", 1)[0] not in TRACKER_PARAMS
    )
    out = f"{scheme}://{netloc}{path}"
    if kept:
        out += "?" + "&".join(kept)
    return out


# --- P5 / P6 / P7 -------------------------------------------------------------


def is_auth_wall(url: str) -> bool:
    """P5 parity (utils/url.py:63-71)."""
    return any(p.match(url) for p in _AUTHWALL_PATTERNS)


def remove_query(url: str) -> str:
    """P7 parity (utils/url.py:74-79): strip the query, keep the fragment."""
    return urlunparse(urlparse(url)._replace(query=""))


def is_relevant_media_url(url: str) -> bool:
    """P6 parity (utils/url.py:82-138)."""
    stripped = remove_query(url)
    if stripped.endswith(IRRELEVANT_SUFFIXES):
        return False
    return not any(all(m in stripped for m in marker) for marker in IRRELEVANT_MARKERS)


# --- P8 / P9: best-quality rewrites -------------------------------------------

_RE_NAME_PARAM = re.compile(r"name=[^&]*")
_RE_WXH_BASENAME = re.compile(r"(.+)-\d+x\d+(\.[a-zA-Z0-9]+)$")


def twitter_best_quality_url(url: str) -> str:
    """P8 parity (utils/url.py:141-153): first ``name=...`` -> ``name=orig``."""
    parts = urlparse(url)
    if "name=" not in parts.query:
        return url
    return urlunparse(parts._replace(query=_RE_NAME_PARAM.sub("name=orig", parts.query, 1)))


def media_best_quality_url(url: str) -> str:
    """P9 parity (utils/url.py:156-176): twitter rewrite + basename -WxH strip."""
    parts = urlparse(url)
    if any(d in parts.netloc.replace("www", "") for d in ("twitter.com", "twimg.com", "x.com")):
        url = twitter_best_quality_url(url)
        parts = urlparse(url)
    segments = parts.path.split("/")
    m = _RE_WXH_BASENAME.match(segments[-1])
    if m:
        segments[-1] = m.group(1) + m.group(2)
        url = urlunparse(parts._replace(path="/".join(segments)))
    return url


# --- P10 ----------------------------------------------------------------------


def host_of(url: str) -> str:
    """P10 parity (utils/url.py:48-52): the netloc."""
    return urlparse(url).netloc
