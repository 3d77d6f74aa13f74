"""F15 HTML formatter — the render step as native string expressions.

Reference: modules/html_formatter/html_formatter.py:35-55 renders a Jinja
template over (url, title, media, metadata) into an HTML file, then the
SHA-256 of that HTML becomes the result's final media hash (feeding the K4
sheet cell). Layout parity is explicitly NOT required (SURVEY.md §2.8 F14/F15
— content compared, not bytes), so the engine renders a fixed deterministic
skeleton with proper escaping, entirely in Catalyst: ``replace`` chains for
escaping, ``transform``+``array_join`` for the media list, ``sha2`` for the
final-media hash. No Jinja, no Python, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def html_escape_expr(c: Column) -> Column:
    """Minimal-entity HTML escape (&, <, >) — identical on any SQL engine
    with literal replace()."""
    return F.replace(
        F.replace(
            F.replace(c, F.lit("&"), F.lit("&amp;")), F.lit("<"), F.lit("&lt;")
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )


def html_render_expr(url: Column, title: Column, media_labels: Column) -> Column:
    """Deterministic HTML document for one archive result; ``media_labels``
    is an array<string> of media descriptions (id / filename / hash)."""
    t = html_escape_expr(F.coalesce(title, F.lit("")))
    u = html_escape_expr(F.coalesce(url, F.lit("")))
    items = F.array_join(
        F.transform(
            media_labels, lambda m: F.concat(F.lit("<li>"), html_escape_expr(m), F.lit("</li>"))
        ),
        "",
    )
    return F.concat(
        F.lit("<!DOCTYPE html><html><head><title>"),
        t,
        F.lit("</title></head><body><h1><a href=\""),
        u,
        F.lit("\">"),
        t,
        F.lit("</a></h1><ul>"),
        items,
        F.lit("</ul></body></html>"),
    )


def html_hash_expr(html: Column) -> Column:
    """F15 -> F1: the rendered document's tagged SHA-256 (the value the
    reference writes into the sheet's hash cell when the formatter output is
    the final media)."""
    return F.concat(F.lit("SHA-256:"), F.sha2(html.cast("binary"), 256))
