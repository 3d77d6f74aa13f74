"""functions/robots.py — robots.txt parse (native fold) + RFC 9309 match.

The reference has no robots handling (its politeness is the sequential loop
+ telethon FloodWait, telethon_extractor.py:108-110); these semantics are
the north rule's "robots.txt crawl-delay / per-domain politeness" half,
tested golden-style like the reference's URL-algebra tests
(tests/utils/test_urls.py).
"""

import pytest
from pyspark.sql import functions as F

from auto_archiver_spark.functions.robots import (
    parse_robots,
    robots_blocked_expr,
)


def _parse_one(spark, text, agent="spark-archiver"):
    df = spark.createDataFrame([(text,)], "robots_txt string")
    row = parse_robots(df, agent=agent).collect()[0]
    return list(row.robots_disallow), list(row.robots_allow), row.crawl_delay_ms


def test_basic_group(spark):
    dis, alw, delay = _parse_one(
        spark,
        "User-agent: spark-archiver\nDisallow: /private\nAllow: /private/ok\n"
        "Crawl-delay: 1.5\n",
    )
    assert dis == ["/private"] and alw == ["/private/ok"] and delay == 1500


def test_star_group_applies_when_no_exact(spark):
    dis, alw, delay = _parse_one(spark, "User-agent: *\nDisallow: /tmp\n")
    assert dis == ["/tmp"] and alw == [] and delay is None


def test_exact_group_beats_star(spark):
    text = (
        "User-agent: *\nDisallow: /all\n\n"
        "User-agent: spark-archiver\nDisallow: /mine\n"
    )
    dis, _, _ = _parse_one(spark, text)
    assert dis == ["/mine"]  # the * group must NOT merge once an exact exists


def test_foreign_agent_group_ignored(spark):
    dis, alw, delay = _parse_one(spark, "User-agent: otherbot\nDisallow: /\n")
    assert dis == [] and alw == [] and delay is None


def test_stacked_user_agent_lines_share_group(spark):
    text = "User-agent: otherbot\nUser-agent: Spark-Archiver\nDisallow: /y\n"
    dis, _, _ = _parse_one(spark, text)
    assert dis == ["/y"]


def test_comments_blanks_case_and_empty_disallow(spark):
    text = (
        "# header comment\n"
        "USER-AGENT: spark-archiver   # inline\n"
        "\n"
        "DisAllow:\n"  # empty value = unrestricted -> skipped
        "disallow: /a  # trailing comment\n"
        "CRAWL-DELAY: 2\n"
    )
    dis, alw, delay = _parse_one(spark, text)
    assert dis == ["/a"] and alw == [] and delay == 2000


def test_rule_after_new_group_resets_applicability(spark):
    text = (
        "User-agent: spark-archiver\nDisallow: /mine\n\n"
        "User-agent: otherbot\nDisallow: /theirs\n"
    )
    dis, _, _ = _parse_one(spark, text)
    assert dis == ["/mine"]


@pytest.mark.parametrize(
    ("path", "dis", "alw", "blocked"),
    [
        ("/private/x", ["/private"], [], True),
        ("/public/x", ["/private"], [], False),
        ("/private/ok/f", ["/private"], ["/private/ok"], False),  # longer allow wins
        ("/private/no", ["/private"], ["/private/ok"], True),
        ("/a", ["/a"], ["/a"], False),  # equal length: allow wins ties
        ("/anything", [], [], False),
    ],
)
def test_longest_match_precedence(spark, path, dis, alw, blocked):
    df = spark.createDataFrame([(path, dis, alw)], "p string, d array<string>, a array<string>")
    got = df.select(
        robots_blocked_expr(F.col("p"), F.col("d"), F.col("a")).alias("b")
    ).collect()[0].b
    assert got is blocked


def test_fixture_policy_derivable_by_parsing(spark):
    """The host_policy table must be exactly recoverable by PARSING each
    host's robots.txt body — the integration the engine would run in
    production (policy refresh = parse job over fetched robots bodies)."""
    from auto_archiver_spark.sources.fixture import (
        HOSTS,
        host_policy_rows,
        robots_txt_for,
    )

    df = spark.createDataFrame(
        [(h.lower(), robots_txt_for(j)) for j, h in enumerate(HOSTS)],
        "host string, robots_txt string",
    )
    parsed = {
        r.host: r
        for r in parse_robots(df).select(
            "host", "robots_disallow", "robots_allow", "crawl_delay_ms"
        ).collect()
    }
    for want in host_policy_rows():
        got = parsed[want["host"]]
        assert list(got.robots_disallow) == want["robots_disallow"], want["host"]
        assert list(got.robots_allow) == want["robots_allow"], want["host"]
        assert (got.crawl_delay_ms or 0) == want["crawl_delay_ms"], want["host"]


def test_admission_respects_allow_override(spark):
    """politeness_admission must admit a /private URL that a longer Allow
    prefix re-allows, and still block other /private URLs on that host."""
    from auto_archiver_spark.operators.frontier import politeness_admission

    fr = spark.createDataFrame(
        [
            ("h.example", "https://h.example/private/100", 1, "ws1", 1),
            ("h.example", "https://h.example/private/200", 2, "ws1", 2),
        ],
        "host string, url_norm string, url_hash long, sheet string, row_idx long",
    )
    pol = spark.createDataFrame(
        [("h.example", 0, ["/private"], ["/private/10"], 100)],
        "host string, crawl_delay_ms int, robots_disallow array<string>, "
        "robots_allow array<string>, max_tokens int",
    )
    rows = {r.url_norm: r for r in politeness_admission(fr, pol).collect()}
    assert rows["https://h.example/private/100"].admitted
    assert not rows["https://h.example/private/100"].robots_blocked
    assert rows["https://h.example/private/200"].robots_blocked


@pytest.mark.parametrize(
    ("path", "dis", "alw", "blocked"),
    [
        # '*' matches any sequence (RFC 9309 §2.2.3)
        ("/a/x.php", ["/*.php"], [], True),
        ("/a/x.phpx", ["/*.php"], [], True),  # no implicit end anchor
        ("/a/x.png", ["/*.php"], [], False),
        ("/fish/salmon.html", ["/fish*.html"], [], True),
        ("/fishing", ["/fish*.html"], [], False),
        # trailing '$' anchors the end
        ("/exact", ["/exact$"], [], True),
        ("/exact/sub", ["/exact$"], [], False),
        ("/a/x.php", ["/*.php$"], [], True),
        ("/a/x.phpx", ["/*.php$"], [], False),
        # mid-rule '$' is a literal octet, not an anchor
        ("/p$q/r", ["/p$q"], [], True),
        ("/pq/r", ["/p$q"], [], False),
        # regex metachars in rules are literal ('.' must not match any char)
        ("/axb", ["/a.b"], [], False),
        ("/a.b", ["/a.b"], [], True),
        # precedence counts RULE octets, wildcards included: the 11-octet
        # wildcard Allow outranks the 5-octet literal Disallow
        ("/d/keep.tmp", ["/d/ke"], ["/d/*eep.tmp"], False),
        # wildcard Disallow blocked when no longer Allow matches
        ("/d/junk.tmp", ["/d/*.tmp"], ["/d/keep*.tmp"], True),
        ("/d/keepA.tmp", ["/d/*.tmp"], ["/d/keep*.tmp"], False),
    ],
)
def test_wildcard_match_rfc9309(spark, path, dis, alw, blocked):
    df = spark.createDataFrame(
        [(path, dis, alw)], "p string, d array<string>, a array<string>"
    )
    got = (
        df.select(robots_blocked_expr(F.col("p"), F.col("d"), F.col("a")).alias("b"))
        .collect()[0]
        .b
    )
    assert got is blocked


def test_wildcard_oracle_twin_agrees(spark):
    """functions/robots.py rule_match_expr and the oracle runner's Python
    twin must judge identical (rule, path) grids identically — the crawl
    equivalence tests depend on this."""
    from auto_archiver_spark.functions.robots import rule_match_expr
    from auto_archiver_spark.oracle.runner import _rule_match

    rules = ["/p", "/*.php", "/fish*.html", "/exact$", "/*.php$", "/p$q", "/a.b", "*"]
    paths = ["/p/x", "/a/x.php", "/a/x.phpx", "/fish/salmon.html", "/fishing",
             "/exact", "/exact/sub", "/p$q/r", "/axb", "/a.b", "/"]
    grid = [(r, p) for r in rules for p in paths]
    df = spark.createDataFrame(grid, "rule string, path string")
    got = df.select(
        "rule", "path", rule_match_expr(F.col("path"), F.col("rule")).alias("hit")
    ).collect()
    for row in got:
        assert row.hit == _rule_match(row.rule, row.path), (row.rule, row.path)


def test_malformed_crawl_delay_is_ignored(spark):
    """r4 ADVICE regression: an unparseable Crawl-delay must not clear a
    previously parsed valid delay; a later VALID value still wins."""
    dis, alw, delay = _parse_one(
        spark, "User-agent: spark-archiver\nCrawl-delay: 2\nCrawl-delay: fast\n"
    )
    assert delay == 2000
    _, _, delay = _parse_one(
        spark, "User-agent: spark-archiver\nCrawl-delay: junk\nCrawl-delay: 3\n"
    )
    assert delay == 3000
