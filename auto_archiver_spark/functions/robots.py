"""robots.txt parsing + matching — the politeness-policy half the north rule
names explicitly (robots.txt crawl-delay, per-domain budgets).

The reference has no robots handling at all (its politeness is the
sequential loop plus the telethon FloodWait sleep,
telethon_extractor.py:108-110); a web-scale frontier needs the real thing:
per-host robots.txt bodies are fetched rarely (once per host per TTL),
parsed into a tiny policy dim table, and broadcast-joined against every
wave (operators/frontier.py politeness_admission).

Semantics implemented (documented subset):

* RFC 9309 group selection: groups whose ``User-agent`` exactly matches the
  product token (case-insensitive) win; if no group matches, ``*`` groups
  apply. ALL matching groups' rules merge. Consecutive ``User-agent`` lines
  stack onto one group.
* ``#`` comments (anywhere in a line), blank lines, case-insensitive field
  names, whitespace tolerance.
* ``Disallow`` / ``Allow`` path rules; an empty ``Disallow:`` value means
  unrestricted (skipped). Matching implements RFC 9309 §2.2.2-§2.2.3 in
  full: ``*`` matches any character sequence, a TRAILING ``$`` anchors the
  end of the path (a mid-rule ``$`` is literal), everything else is a
  literal prefix. Precedence: the matching rule with the most octets (rule
  length, wildcards counted — RFC 9309 §2.2.2) wins; ``Allow`` wins length
  ties. Wildcard-free rules keep the native ``startsWith`` fast path;
  wildcard rules translate to an anchored regex inside the same Catalyst
  lambda (no Python).
* ``Crawl-delay`` (non-RFC but ubiquitous): seconds, fractional allowed;
  last *parseable* matched-group value wins (malformed values are ignored,
  they never clear an earlier valid delay); exported as ``crawl_delay_ms``.

Everything is native Catalyst (split / transform / aggregate folds — no
Python in the plan), so policy refresh is a narrow projection over a
(host, robots_txt) table at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_AGENT = "spark-archiver"

_ACC_SCHEMA_FIELDS = ("applies", "last_ua", "dis", "alw", "delay")


def _parsed_lines(text: Column) -> Column:
    """array<struct<field,value>> — comment-stripped, trimmed, lowercased
    field names; value keeps its case (paths are case-sensitive)."""
    lines = F.split(text, "\n")
    cleaned = F.transform(lines, lambda l: F.trim(F.regexp_replace(l, "#.*$", "")))
    return F.transform(
        F.filter(cleaned, lambda l: l.contains(":")),
        lambda l: F.struct(
            F.lower(F.trim(F.regexp_extract(l, r"^([^:]+):", 1))).alias("field"),
            F.trim(F.regexp_extract(l, r"^[^:]+:(.*)$", 1)).alias("value"),
        ),
    )


def parse_robots(
    df: DataFrame, text_col: str = "robots_txt", agent: str = DEFAULT_AGENT
) -> DataFrame:
    """Add ``robots_disallow``, ``robots_allow`` (array<string>) and
    ``crawl_delay_ms`` (nullable long) parsed from ``text_col``.

    Two projections by design: ``_parsed`` and ``_has_exact`` must be
    materialized columns before the fold references them inside lambda
    bodies — Spark does no CSE inside HOF lambdas, so inlining would
    re-parse the whole file per line (see BENCH.md round-4 §3)."""
    agent_l = agent.lower()
    with_parsed = df.withColumn("_parsed", _parsed_lines(F.col(text_col)))
    with_exact = with_parsed.withColumn(
        "_has_exact",
        F.exists(
            F.col("_parsed"),
            lambda p: (p["field"] == "user-agent") & (F.lower(p["value"]) == agent_l),
        ),
    )

    def step(acc: Column, ln: Column) -> Column:
        field, value = ln["field"], ln["value"]
        is_ua = field == F.lit("user-agent")
        ua_match = (F.lower(value) == agent_l) | (
            ~F.col("_has_exact") & (value == F.lit("*"))
        )
        # consecutive UA lines stack onto one group: OR the match in; a UA
        # line after rules starts a NEW group (replace, don't OR)
        applies = (
            F.when(is_ua & acc["last_ua"], acc["applies"] | ua_match)
            .when(is_ua, ua_match)
            .otherwise(acc["applies"])
        )
        rule_on = ~is_ua & acc["applies"]
        dis = F.when(
            rule_on & (field == F.lit("disallow")) & (value != F.lit("")),
            F.array_append(acc["dis"], value),
        ).otherwise(acc["dis"])
        alw = F.when(
            rule_on & (field == F.lit("allow")) & (value != F.lit("")),
            F.array_append(acc["alw"], value),
        ).otherwise(acc["alw"])
        # coalesce: a malformed Crawl-delay value must be IGNORED, not
        # overwrite a previously parsed valid delay with NULL (r4 ADVICE)
        delay = F.when(
            rule_on & (field == F.lit("crawl-delay")),
            F.coalesce(value.try_cast("double"), acc["delay"]),
        ).otherwise(acc["delay"])
        return F.struct(
            applies.alias("applies"),
            is_ua.alias("last_ua"),
            dis.alias("dis"),
            alw.alias("alw"),
            delay.alias("delay"),
        )

    acc0 = F.struct(
        F.lit(False).alias("applies"),
        F.lit(False).alias("last_ua"),
        F.array().cast("array<string>").alias("dis"),
        F.array().cast("array<string>").alias("alw"),
        F.lit(None).cast("double").alias("delay"),
    )
    folded = F.aggregate(F.col("_parsed"), acc0, step)
    return (
        with_exact.withColumn("_acc", folded)
        .withColumn("robots_disallow", F.col("_acc")["dis"])
        .withColumn("robots_allow", F.col("_acc")["alw"])
        .withColumn(
            "crawl_delay_ms",
            F.floor(F.col("_acc")["delay"] * 1000).cast("long"),
        )
        .drop("_parsed", "_has_exact", "_acc")
    )


def rule_match_expr(path: Column, rule: Column) -> Column:
    """True iff the RFC 9309 rule matches ``path`` (§2.2.2-§2.2.3):
    ``*`` matches any character sequence, a single TRAILING ``$`` anchors
    the end of the path (mid-rule ``$`` is literal), everything else is a
    literal prefix. Wildcard-free rules stay on the native ``startsWith``
    fast path; wildcard rules are translated to an anchored Java regex in
    the same Catalyst expression (escape metachars, then ``*`` → ``.*``) —
    no Python either way."""
    anchored = rule.endswith("$")
    body = F.when(anchored, F.substring(rule, F.lit(1), F.length(rule) - 1)).otherwise(
        rule
    )
    esc = F.regexp_replace(body, r"([.^$+?(){}\[\]|\\])", r"\\$1")
    pat = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return F.when(
        rule.contains("*") | anchored, F.regexp_like(path, pat)
    ).otherwise(path.startswith(rule))


def longest_match_expr(path: Column, rules: Column) -> Column:
    """Length in octets of the longest rule in ``rules`` matching ``path``
    (-1 when none match) — RFC 9309 §2.2.2 precedence counts the RULE's
    length, wildcards included. Null rule arrays behave as empty."""
    safe = F.coalesce(rules, F.array().cast("array<string>"))
    return F.coalesce(
        F.array_max(
            F.transform(
                safe,
                lambda p: F.when(rule_match_expr(path, p), F.length(p)).otherwise(
                    F.lit(-1)
                ),
            )
        ),
        F.lit(-1),
    )


def robots_blocked_expr(path: Column, disallow: Column, allow: Column) -> Column:
    """RFC 9309 precedence: longest matching rule wins; Allow wins length
    ties. With an empty/NULL allow array this degrades to any-prefix
    disallow — exactly the pre-round-4 admission semantics."""
    return longest_match_expr(path, disallow) > longest_match_expr(path, allow)
