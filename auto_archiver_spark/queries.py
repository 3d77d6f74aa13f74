"""Operator catalog for the driver's correctness gate (__spark_entry__).

Each entry is one operator family from SURVEY.md §2 (or a training-data-tier
addition), expressed twice:

  * ``QUERIES[name]``   — the Spark implementation, (spark, sf_dir) -> DataFrame
  * ``ORACLE[name]``    — an independent ANSI-SQL computation DuckDB runs on
                          the same parquet tables (omitted for the genuinely
                          non-SQL sketches -> rows-only check)

Determinism rules: every float that passes through arithmetic is rounded (or
routed through decimal) identically on both sides; every computed column is
aliased identically on both sides (the driver hashes columns by name).

Driver tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings. Per FIXTURES.md §7 the crawl-shaped
operators run over ``events`` (user_id ≙ host, event_id ≙ url key, ts ≙ crawl
order) and URL algebra runs over URLs synthesized deterministically from
event columns — same values on both engines by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions import text as T
from .functions import url_exprs as X
from .operators.dedup import (
    minhash_dedup,
    simhash_buckets,
    word_ngrams_expr,
)
from .operators.similarity import cosine_topk


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# --- crawl-shaped operators over `events` -----------------------------------------


def q_frontier_admission(spark, sf):
    """O2: per-host (user_id) politeness window — admit first 5 in time order."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("user_id", "event_id", "rn")
    )


def q_frontier_anti_join(spark, sf):
    """J1/J6: frontier (clicks) anti-joined against the seen set (views),
    keyed by a bucketed hash surrogate (event_id % 2003)."""
    ev = load(spark, sf, "events")
    frontier = ev.filter(F.col("event_type") == "click")
    seen = (
        ev.filter(F.col("event_type") == "view")
        .select(F.pmod("event_id", F.lit(2003)).alias("k"))
        .distinct()
    )
    return (
        frontier.withColumn("k", F.pmod("event_id", F.lit(2003)))
        .join(seen, "k", "left_anti")
        .select("event_id", "user_id")
    )


def q_seen_set_except(spark, sf):
    """§2.7 set difference at (user, day) grain: purchase-days EXCEPT error-days."""
    ev = load(spark, sf, "events")
    day = F.date_trunc("day", F.col("ts")).alias("day")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id", day).distinct()
    b = ev.filter(F.col("event_type") == "error").select("user_id", day).distinct()
    return a.join(b, ["user_id", "day"], "left_anti")


# --- URL algebra (P2/P6/P7/P8/P9/P10 + north rule) ---------------------------------


def _synth_url(ev: DataFrame) -> DataFrame:
    return ev.withColumn(
        "url",
        F.concat(
            F.lit("https://WWW.Host"),
            F.pmod("user_id", F.lit(20)).cast("string"),
            F.lit(".Example.COM/p/"),
            F.col("event_id").cast("string"),
            F.lit("?utm_source=x&b="),
            F.pmod("event_id", F.lit(7)).cast("string"),
            F.lit("&a=1"),
        ),
    )


def q_url_canonicalize(spark, sf):
    """North-rule url_norm: lowercase host, strip trackers, sort query."""
    ev = _synth_url(load(spark, sf, "events"))
    return ev.select(
        "event_id", X.north_norm_expr(F.col("url")).alias("url_norm")
    )


def q_url_host(spark, sf):
    """P10 netloc extraction on the synthesized URLs."""
    ev = _synth_url(load(spark, sf, "events"))
    return ev.select("event_id", F.lower(X.url_netloc(F.col("url"))).alias("host"))


_REL_ITEMS = [
    "photo.jpg",
    "clip.mp4",
    "icon.svg",
    "fav.ico",
    "stream.m3u8?t=1",
    "favicon.ico",
    "img.png",
    "manifest.mpd",
]


def q_url_relevance(spark, sf):
    """P6 relevance filter over synthesized media URLs (+P7 query strip)."""
    ev = load(spark, sf, "events")
    item = F.element_at(
        F.array(*[F.lit(s) for s in _REL_ITEMS]), (F.pmod("event_id", F.lit(8)) + 1).cast("int")
    )
    urls = ev.select(
        "event_id",
        F.concat(
            F.lit("https://cdn"), F.col("user_id").cast("string"), F.lit(".example.com/"), item
        ).alias("url"),
    )
    return urls.filter(X.is_relevant_media_url_expr(F.col("url"))).select("event_id", "url")


def q_url_best_quality(spark, sf):
    """P8+P9: twitter name=orig rewrite and basename -WxH strip."""
    ev = load(spark, sf, "events")
    eid = F.col("event_id").cast("string")
    k = F.pmod("event_id", F.lit(4))
    url = (
        F.when(k == 0, F.concat(F.lit("https://pbs.twimg.com/media/a"), eid, F.lit("?format=jpg&name=small")))
        .when(k == 1, F.concat(F.lit("https://example.com/media/file"), eid, F.lit("-1280x720.mp4")))
        .when(k == 2, F.concat(F.lit("https://x.com/media/b"), eid, F.lit("?name=large")))
        .otherwise(F.concat(F.lit("https://example.com/a/b/file"), eid, F.lit(".jpg?foo=bar")))
    )
    return ev.select("event_id", X.media_best_quality_expr(url).alias("best_url"))


# --- dedup / merge / aggregation ----------------------------------------------------


def q_dedup_first_per_key(spark, sf):
    """A1: first line per order in line-number order."""
    li = load(spark, sf, "lineitem")
    # (l_orderkey, l_linenumber) is not unique in the synthetic data; the
    # tie-break covers every output column so any winner yields equal output
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").asc(), F.col("l_partkey").asc(), F.col("l_quantity").asc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_quantity")
    )


def q_most_complete(spark, sf):
    """A5 choose_most_complete: argmax order per customer by (price, key)."""
    o = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("best_order"), F.col("o_totalprice").alias("best_price"))
    )


def q_merge_status(spark, sf):
    """A4 status-merge rule: latest status wins per key."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("last_status"))
    )


def q_top_variant(spark, sf):
    """O3 best-variant: per order, the part with max line revenue."""
    li = load(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    w = Window.partitionBy("l_orderkey").orderBy(F.col("rev").desc(), F.col("l_partkey").desc())
    return (
        li.withColumn("rev", rev)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", F.col("l_partkey").alias("best_part"))
    )


def q_pricing_summary(spark, sf):
    """TPC-H Q1-shaped aggregate (A6/A8 totals analog; bench headline).
    Money math routed through decimal so both engines agree bit-for-bit."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base"),
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_media_totals(spark, sf):
    """A6 per-row byte totals analog: per-user event count + value total."""
    ev = load(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )


# --- training-data tier: text ---------------------------------------------------------


def q_dedup_exact_text(spark, sf):
    """Exact dedup by content hash (A2 analog on text)."""
    d = load(spark, sf, "documents")
    return d.groupBy(F.md5("text").alias("content_md5")).agg(
        F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("n_copies")
    )


def q_token_count(spark, sf):
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id",
        T.token_count_expr(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_obs"),
    )


def q_lang_guess(spark, sf):
    d = load(spark, sf, "documents")
    return d.select("doc_id", T.lang_guess_expr(F.col("text")).alias("lang_guess"))


def q_quality_score(spark, sf):
    d = load(spark, sf, "documents")
    return d.select("doc_id", T.quality_score_expr(F.col("text")).alias("quality"))


def q_fingerprint(spark, sf):
    """Document fingerprint (md5 of whitespace-collapsed lowercase text —
    portable across engines; the engine-internal variant uses xxhash64)."""
    d = load(spark, sf, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.md5(norm).alias("fp"))


def q_ngram_jaccard(spark, sf):
    """Exact word-3-gram Jaccard between consecutive docs (near-dup verify stage)."""
    d = load(spark, sf, "documents").select(
        "doc_id", F.array_distinct(word_ngrams_expr(F.col("text"), 3)).alias("sh")
    )
    a = d.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = d.select((F.col("doc_id") - 1).alias("id_a"), F.col("sh").alias("sh_b"))
    j = a.join(b, "id_a")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select(
        "id_a",
        (F.col("id_a") + 1).alias("id_b"),
        F.round(F.when(union > 0, inter / union).otherwise(F.lit(1.0)), 5).alias("jaccard"),
    )


# --- training-data tier: embeddings ----------------------------------------------------


def q_cosine_topk(spark, sf):
    """Brute-force ANN baseline: top-10 by cosine to vec_id=0's embedding."""
    emb = load(spark, sf, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return cosine_topk(emb, list(qvec), k=10)


# --- sketches (deterministic; rows-only driver check, value-tested in pytest) ----------


def q_minhash_lsh(spark, sf):
    """MinHash-LSH near-dup pairs over documents, exact-Jaccard verified >=0.5."""
    d = load(spark, sf, "documents")
    return minhash_dedup(d, threshold=0.5).select(
        "id_a", "id_b", F.round("jaccard", 5).alias("jaccard")
    )


def q_simhash_buckets(spark, sf):
    """SimHash-64 signatures + 16-bit block bucket keys over documents."""
    d = load(spark, sf, "documents")
    return simhash_buckets(d).select("id", "simhash", "block", "val")


# --- scalar-function tier (F9-F13, O4-O6, A8, A9, J2, §2.7 set ops) ---------------


def q_storage_key(spark, sf):
    """F11 slugify + F13 storage key + O5/O6 truncation (reference
    storage.py:80-115): folder/slug-{id}/{hash24}.txt."""
    d = load(spark, sf, "documents")
    slug = F.regexp_replace(
        F.regexp_replace(F.lower(F.substring(F.col("text"), 1, 30)), r"[^a-z0-9]+", "-"),
        r"^-|-$",
        "",
    )
    key = F.concat_ws(
        "/",
        F.col("source"),
        F.concat(slug, F.lit("-"), F.col("doc_id").cast("string")),
        F.concat(F.substring(F.md5("text"), 1, 24), F.lit(".txt")),
    )
    return d.select("doc_id", key.alias("storage_key"))


def q_timestamp_format(spark, sf):
    """F9 timestamp normalization (utils/misc.py:64-102): ISO-8601 + epoch."""
    ev = load(spark, sf, "events")
    return ev.select(
        "event_id",
        F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z")).alias("ts_iso"),
        F.unix_timestamp("ts").alias("epoch_s"),
    )


def q_human_bytes(spark, sf):
    """F10 human-readable byte formatting (meta_enricher.py:39-44).

    Determinism: the intermediate is floor(value*1000) on BOTH engines
    (Spark's cast truncates toward zero, DuckDB's rounds half-even), and the
    1-decimal display value is floor on scaled integers (round() ties at
    b = 256*odd would split HALF_UP vs half-even)."""
    ev = load(spark, sf, "events")
    b = F.floor(F.col("value") * 1000).cast("long")
    unit = (
        F.when(b < 1024, "B")
        .when(b < 1024 * 1024, "KB")
        .otherwise("MB")
    )
    val = (
        F.when(b < 1024, b.cast("double"))
        .when(b < 1024 * 1024, F.floor(b * 10 / 1024) / 10.0)
        .otherwise(F.floor(b * 10 / (1024 * 1024)) / 10.0)
    )
    return ev.select("event_id", val.alias("hval"), unit.alias("hunit"))


def q_pdq_list(spark, sf):
    """A8 per-group comma-joined hash list (gsheet_feeder_db.py:164-171)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("l_partkey")), lambda x: x.cast("string")),
            ",",
        ).alias("part_csv")
    )


def q_first_match(spark, sf):
    """A9 first-matching-element (metadata.py:200-204): first long token."""
    d = load(spark, sf, "documents")
    toks = T.tokens_expr(F.col("text"))
    first_long = F.try_element_at(F.filter(toks, lambda t: F.length(t) > 5), F.lit(1))
    return d.select("doc_id", first_long.alias("first_long_token"))


def q_coalesce_merge(spark, sf):
    """J2 cached-merge precedence: left join + per-column coalesce
    (orchestrator.py:622)."""
    o = load(spark, sf, "orders")
    c = load(spark, sf, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    return j.select(
        "o_orderkey",
        F.coalesce("c_name", F.lit("unknown")).alias("buyer"),
        F.coalesce("c_nationkey", F.lit(-1)).alias("nation"),
    )


def q_union_feeders(spark, sf):
    """§2.7 multi-feeder union (orchestrator.py:545-546): distinct union."""
    ev = load(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id", "event_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id", "event_id")
    return a.union(b).distinct()


def q_intersect_hosts(spark, sf):
    """§2.7 intersection (allow-list semantics): users with BOTH clicks and views."""
    ev = load(spark, sf, "events")
    a = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    b = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    return a.intersect(b)


def q_thumbnail_plan(spark, sf):
    """O4 thumbnail count + evenly-spaced timestamps
    (thumbnail_enricher.py:51-52): n = min(max(1, dur/60), 4)."""
    ev = load(spark, sf, "events")
    n = F.least(F.greatest(F.floor(F.col("value") / 60), F.lit(1)), F.lit(4)).cast("int")
    # integer centiseconds via floor: round() tie-breaking differs between
    # engines and value/(n+1) lands on exact halves constantly
    offsets = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.floor(i * F.col("value") * 100 / (n + 1)).cast("long"),
    )
    # emitted comma-joined: the driver harness canonicalizes via pandas
    # sort_values, which cannot hash array cells (round-1 red row)
    thumb_csv = F.array_join(F.transform(offsets, lambda x: x.cast("string")), ",")
    return ev.select("event_id", n.alias("n_thumbs"), thumb_csv.alias("thumb_ts_csv"))


def q_embedding_neighbors(spark, sf):
    """Embedding near-dup check on consecutive vectors: cosine + flag."""
    from .operators.similarity import cosine_expr  # noqa: PLC0415

    e = load(spark, sf, "embeddings").select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select((F.col("vec_id") - 1).alias("id_a"), F.col("v").alias("vb"))
    j = a.join(b, "id_a")
    cos = F.round(cosine_expr(F.col("va"), F.col("vb")), 5)
    return j.select(
        "id_a", (F.col("id_a") + 1).alias("id_b"), cos.alias("cos"), (cos >= 0.8).alias("near_dup")
    )


QUERIES = {
    "frontier_admission": q_frontier_admission,
    "frontier_anti_join": q_frontier_anti_join,
    "seen_set_except": q_seen_set_except,
    "url_canonicalize": q_url_canonicalize,
    "url_host": q_url_host,
    "url_relevance": q_url_relevance,
    "url_best_quality": q_url_best_quality,
    "dedup_first_per_key": q_dedup_first_per_key,
    "most_complete": q_most_complete,
    "merge_status": q_merge_status,
    "top_variant": q_top_variant,
    "pricing_summary": q_pricing_summary,
    "media_totals": q_media_totals,
    "dedup_exact_text": q_dedup_exact_text,
    "token_count": q_token_count,
    "lang_guess": q_lang_guess,
    "quality_score": q_quality_score,
    "fingerprint": q_fingerprint,
    "ngram_jaccard": q_ngram_jaccard,
    "cosine_topk": q_cosine_topk,
    "storage_key": q_storage_key,
    "timestamp_format": q_timestamp_format,
    "human_bytes": q_human_bytes,
    "pdq_list": q_pdq_list,
    "first_match": q_first_match,
    "coalesce_merge": q_coalesce_merge,
    "union_feeders": q_union_feeders,
    "intersect_hosts": q_intersect_hosts,
    "thumbnail_plan": q_thumbnail_plan,
    "embedding_neighbors": q_embedding_neighbors,
    "minhash_lsh": q_minhash_lsh,
    "simhash_buckets": q_simhash_buckets,
}

_TRACKERS_SQL = "('utm_source','utm_medium','utm_campaign','utm_term','utm_content','fbclid','gclid')"

_SYNTH_URL_SQL = (
    "'https://WWW.Host' || (user_id % 20) || '.Example.COM/p/' || event_id"
    " || '?utm_source=x&b=' || (event_id % 7) || '&a=1'"
)

ORACLE = {
    "frontier_admission": """
        SELECT user_id, event_id, rn FROM (
          SELECT user_id, event_id,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events) WHERE rn <= 5
    """,
    "frontier_anti_join": """
        SELECT event_id, user_id FROM events e
        WHERE event_type = 'click'
          AND NOT EXISTS (SELECT 1 FROM events v
                          WHERE v.event_type = 'view'
                            AND v.event_id % 2003 = e.event_id % 2003)
    """,
    "seen_set_except": """
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        FROM events WHERE event_type = 'error'
    """,
    "url_canonicalize": f"""
        WITH u AS (SELECT event_id, {_SYNTH_URL_SQL} AS url FROM events),
        parts AS (SELECT event_id,
            lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
            lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS netloc,
            regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) AS path,
            regexp_extract(url, '\\?([^#]*)', 1) AS query
          FROM u),
        canon AS (SELECT event_id, scheme, netloc,
            CASE WHEN path = '' THEN '/' ELSE path END AS path,
            array_to_string(list_sort(list_filter(string_split(query, '&'),
                p -> p != '' AND string_split(p, '=')[1] NOT IN {_TRACKERS_SQL})), '&') AS q
          FROM parts)
        SELECT event_id, scheme || '://' || netloc || path ||
               CASE WHEN q = '' THEN '' ELSE '?' || q END AS url_norm
        FROM canon
    """,
    "url_host": f"""
        SELECT event_id,
               lower(regexp_extract({_SYNTH_URL_SQL},
                     '^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]*)', 1)) AS host
        FROM events
    """,
    "url_relevance": """
        WITH u AS (SELECT event_id,
            'https://cdn' || user_id || '.example.com/' ||
            (['photo.jpg','clip.mp4','icon.svg','fav.ico','stream.m3u8?t=1',
              'favicon.ico','img.png','manifest.mpd'])[(event_id % 8)::INT + 1] AS url
          FROM events),
        s AS (SELECT event_id, url, regexp_replace(url, '\\?[^#]*', '') AS stripped FROM u)
        SELECT event_id, url FROM s
        WHERE NOT (ends_with(stripped, '.svg') OR ends_with(stripped, '.ico')
                OR ends_with(stripped, '.m3u8') OR ends_with(stripped, '.mpd')
                OR ends_with(stripped, '.ism') OR contains(stripped, 'favicon'))
    """,
    "url_best_quality": """
        SELECT event_id,
          CASE event_id % 4
            WHEN 0 THEN 'https://pbs.twimg.com/media/a' || event_id || '?format=jpg&name=orig'
            WHEN 1 THEN 'https://example.com/media/file' || event_id || '.mp4'
            WHEN 2 THEN 'https://x.com/media/b' || event_id || '?name=orig'
            ELSE 'https://example.com/a/b/file' || event_id || '.jpg?foo=bar'
          END AS best_url
        FROM events
    """,
    "dedup_first_per_key": """
        SELECT l_orderkey, l_partkey, l_quantity FROM (
          SELECT l_orderkey, l_partkey, l_quantity,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
          FROM lineitem) WHERE rn = 1
    """,
    "most_complete": """
        SELECT o_custkey, o_orderkey AS best_order, o_totalprice AS best_price FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
          FROM orders) WHERE rn = 1
    """,
    "merge_status": """
        SELECT user_id, event_type AS last_status FROM (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """,
    "top_variant": """
        SELECT l_orderkey, l_partkey AS best_part FROM (
          SELECT l_orderkey, l_partkey,
                 row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) DESC,
                            l_partkey DESC) AS rn
          FROM lineitem) WHERE rn = 1
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_disc_price,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "media_totals": """
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id
    """,
    "dedup_exact_text": """
        SELECT md5(text) AS content_md5, MIN(doc_id) AS first_doc, COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "token_count": """
        SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               length(text) AS n_chars_obs
        FROM documents
    """,
    "lang_guess": """
        WITH h AS (SELECT doc_id,
            len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                w -> w IN ('the','and','of','to','in'))) AS h_en,
            len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                w -> w IN ('el','la','de','que','los'))) AS h_es,
            len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                w -> w IN ('der','die','und','das','ein'))) AS h_de,
            len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                w -> w IN ('le','la','les','et','des'))) AS h_fr,
            len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                w -> w IN ('de5','shi4','le5','zai4','he2'))) AS h_zh
          FROM documents)
        SELECT doc_id, CASE
            WHEN greatest(h_en,h_es,h_de,h_fr,h_zh) = 0 THEN 'und'
            WHEN h_zh = greatest(h_en,h_es,h_de,h_fr,h_zh) THEN 'zh'
            WHEN h_fr = greatest(h_en,h_es,h_de,h_fr,h_zh) THEN 'fr'
            WHEN h_es = greatest(h_en,h_es,h_de,h_fr,h_zh) THEN 'es'
            WHEN h_en = greatest(h_en,h_es,h_de,h_fr,h_zh) THEN 'en'
            ELSE 'de' END AS lang_guess
        FROM h
    """,
    "quality_score": """
        WITH m AS (SELECT doc_id,
            CAST(length(text) AS DOUBLE) AS n,
            CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS ntok,
            CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) AS punct
          FROM documents)
        SELECT doc_id, round(
            (CASE WHEN n >= 20 AND n <= 20000 THEN 0.4 ELSE 0.0 END) +
            (CASE WHEN ntok > 0 AND n/ntok >= 2.5 AND n/ntok <= 12 THEN 0.4 ELSE 0.0 END) +
            (CASE WHEN (CASE WHEN n > 0 THEN punct/n ELSE 1.0 END) <= 0.2
                  THEN 0.2 ELSE 0.0 END), 2) AS quality
        FROM m
    """,
    "fingerprint": """
        SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    """,
    "ngram_jaccard": """
        WITH sh AS (SELECT doc_id, list_distinct(
            CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                 ELSE [array_to_string(w[i:i+2], ' ') for i in generate_series(1, len(w)-2)]
            END) AS sh
          FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CASE WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
                 THEN CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / len(list_distinct(list_concat(a.sh, b.sh)))
                 ELSE 1.0 END, 5) AS jaccard
        FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
    "cosine_topk": """
        SELECT e.vec_id,
               round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
                 AS cos
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        ORDER BY round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6)
                 DESC, e.vec_id LIMIT 10
    """,
    "storage_key": """
        WITH slug AS (SELECT doc_id, source, text,
            regexp_replace(regexp_replace(lower(substr(text, 1, 30)), '[^a-z0-9]+', '-', 'g'),
                           '^-|-$', '', 'g') AS s
          FROM documents)
        SELECT doc_id, source || '/' || s || '-' || doc_id || '/'
               || substr(md5(text), 1, 24) || '.txt' AS storage_key
        FROM slug
    """,
    "timestamp_format": """
        SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' AS ts_iso,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
        FROM events
    """,
    "human_bytes": """
        WITH b AS (SELECT event_id, CAST(floor(value * 1000) AS BIGINT) AS b FROM events)
        SELECT event_id,
          CASE WHEN b < 1024 THEN CAST(b AS DOUBLE)
               WHEN b < 1048576 THEN floor(b * 10 / 1024) / 10.0
               ELSE floor(b * 10 / 1048576) / 10.0 END AS hval,
          CASE WHEN b < 1024 THEN 'B' WHEN b < 1048576 THEN 'KB' ELSE 'MB' END AS hunit
        FROM b
    """,
    "pdq_list": """
        SELECT l_orderkey,
               array_to_string(list_sort(list(l_partkey)), ',') AS part_csv
        FROM lineitem GROUP BY l_orderkey
    """,
    "first_match": """
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'), t -> length(t) > 5)[1]
                 AS first_long_token
        FROM documents
    """,
    "coalesce_merge": """
        SELECT o_orderkey, coalesce(c_name, 'unknown') AS buyer,
               coalesce(c_nationkey, -1) AS nation
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    """,
    "union_feeders": """
        SELECT DISTINCT user_id, event_id FROM events WHERE event_type = 'click'
        UNION
        SELECT DISTINCT user_id, event_id FROM events WHERE event_type = 'signup'
    """,
    "intersect_hosts": """
        SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    """,
    "thumbnail_plan": """
        WITH n AS (SELECT event_id, value,
            CAST(least(greatest(CAST(floor(value / 60) AS BIGINT), 1), 4) AS INT) AS n_thumbs
          FROM events)
        SELECT event_id, n_thumbs,
               array_to_string([CAST(floor(i * value * 100 / (n_thumbs + 1)) AS BIGINT)
                                for i in generate_series(1, n_thumbs)], ',') AS thumb_ts_csv
        FROM n
    """,
    "embedding_neighbors": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 5) AS cos,
               round(list_cosine_similarity(a.v, b.v), 5) >= 0.8 AS near_dup
        FROM e a JOIN e b ON b.vec_id = a.vec_id + 1
    """,
    # minhash_lsh / simhash_buckets: md5-derived 64-bit sketch arithmetic is not
    # expressible in portable SQL -> rows-only driver check; exact-value pytest
    # coverage lives in tests/test_sketches.py.
}
