"""Text-analysis Column builders for the training-data pipeline tier.

All native ``pyspark.sql.functions`` — no Python in the hot path. Each has an
ANSI-SQL twin in ``__spark_entry__.oracle_sql`` so the driver's DuckDB harness
value-checks them at sf0.01. These are engine additions (the reference
archives pages; a 100 TB corpus pipeline additionally needs language ID,
quality scoring, token accounting and fingerprinting over the text columns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword panels for the n-gram/stopword-hit heuristic
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "les", "et", "des"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),  # romanized placeholder panel
}

_WS = r"\s+"


def tokens_expr(text: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty text -> empty array)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, _WS))


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text))


def bpe_ish_token_count_expr(text: Column) -> Column:
    """Sub-word-ish token estimate: count of letter-runs, digit-runs and
    punctuation marks (a cheap, deterministic BPE stand-in)."""
    runs = F.regexp_replace(text, r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]", "#")
    return F.length(runs) - F.length(F.regexp_replace(runs, "#", ""))


def stopword_hits_expr(text: Column, words: tuple[str, ...]) -> Column:
    """How many tokens of ``text`` are in the panel ``words`` (case-insensitive)."""
    toks = tokens_expr(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_guess_expr(text: Column) -> Column:
    """Argmax language by stopword-panel hits; 'und' when all panels miss."""
    entries = [
        F.struct(
            stopword_hits_expr(text, panel).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, panel in sorted(LANG_STOPWORDS.items())
    ]
    best = F.array_max(F.array(*entries))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score_expr(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + word-length sanity +
    punctuation-ratio penalty. Deterministic, SQL-expressible."""
    n = F.length(text).cast("double")
    ntok = token_count_expr(text).cast("double")
    avg_word = F.when(ntok > 0, n / ntok).otherwise(F.lit(0.0))
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", "")).cast("double")
    punct_ratio = F.when(n > 0, punct / n).otherwise(F.lit(1.0))
    len_ok = F.when((n >= 20) & (n <= 20000), F.lit(0.4)).otherwise(F.lit(0.0))
    word_ok = F.when((avg_word >= 2.5) & (avg_word <= 12), F.lit(0.4)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    return F.round(len_ok + word_ok + punct_ok, 2)


def fingerprint64_expr(text: Column) -> Column:
    """Document fingerprint: 64-bit hash of the token-normalized text
    (lowercase, collapse whitespace) — an order-sensitive rolling-hash analog
    done natively via xxhash64 of the normalized string."""
    norm = F.regexp_replace(F.lower(F.trim(text)), _WS, " ")
    return F.xxhash64(norm)
