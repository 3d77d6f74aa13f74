"""Content hashing — native where Spark has it, Arrow-batched where it doesn't.

* SHA-256  (F1): native ``sha2`` — bit-identical to hashlib on the same bytes;
  output format ``"SHA-256:<hex>"`` per reference
  modules/hash_enricher/hash_enricher.py:32 (golden vectors
  tests/enrichers/test_hash_enricher.py:8-28).
* SHA3-512 (F2): not native in Spark -> Arrow-batched pandas UDF (hashlib).
* dHash-64 perceptual hash (F3 analog): see codec.dhash64; UDF in enrich.py.
* SimHash-64 & MinHash: engine additions for near-duplicate detection at
  training-data scale (no reference analog; standard sketches). The reference
  (md5-derived) kernels are kept for parity tests; the production path is the
  batch-vectorized siphash one below — deterministic across executors/runs
  for a pinned pandas (checkpoint-resume requirement, SURVEY.md §2.8 F12).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

# ---- F1 / F2 -------------------------------------------------------------------


def sha256_tagged_expr(data: Column) -> Column:
    """``"SHA-256:<hex>"`` over a binary column — native, whole-stage codegen."""
    return F.concat(F.lit("SHA-256:"), F.sha2(data, 256))


@F.pandas_udf(StringType())
def sha3_512_udf(data: pd.Series) -> pd.Series:
    """``"SHA3-512:<hex>"`` (reference hash_enricher.py:38-39 option)."""
    return data.map(lambda b: "SHA3-512:" + hashlib.sha3_512(b).hexdigest())


# ---- deterministic 64-bit token hash (md5-derived, portable) ---------------------

_MASK64 = (1 << 64) - 1


def md5_u64(token: str) -> int:
    """First 8 bytes of md5 as unsigned 64-bit int. Portable across Python,
    Spark (``conv(substring(md5(x),1,16),16,10)``) and DuckDB — the shared
    hash for sketch parity tests."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


# ---- SimHash-64 ------------------------------------------------------------------


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token multiset (signed int64)."""
    if not tokens:
        return 0
    hs = np.array([md5_u64(t) for t in tokens], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    val = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return val - (1 << 64) if val >= (1 << 63) else val


# ---- MinHash ---------------------------------------------------------------------

# fixed odd multipliers/offsets (splitmix-derived constants), k permutations of
# the universal-hash family h_i(x) = (a_i*x + b_i) mod 2^64
_MINHASH_K = 64
_rng = np.random.default_rng(42)
_MH_A = (_rng.integers(1, _MASK64, size=_MINHASH_K, dtype=np.uint64) | np.uint64(1))
_MH_B = _rng.integers(0, _MASK64, size=_MINHASH_K, dtype=np.uint64)


def minhash_signature(tokens: list[str], k: int = _MINHASH_K) -> list[int]:
    """k-permutation MinHash signature (signed int64 entries)."""
    if not tokens:
        return [0] * k
    hs = np.array(sorted({md5_u64(t) for t in tokens}), dtype=np.uint64)
    with np.errstate(over="ignore"):
        table = hs[:, None] * _MH_A[:k] + _MH_B[:k]  # wraps mod 2^64
    sig = table.min(axis=0).astype(np.int64)
    return [int(x) for x in sig]


def shingles(words: list[str], n: int = 3) -> list[str]:
    """Word n-gram shingles; whole doc as one shingle when shorter than n."""
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]


# ---- vectorized sketch path -------------------------------------------------------
#
# The round-1 hot spot was per-token Python md5 inside the UDF (the #2 bench
# query). The fast path hashes EVERY shingle of the whole Arrow batch in one
# C call (``pd.util.hash_array`` — siphash with a fixed key, deterministic
# across processes for a pinned pandas) and reduces per-doc signatures with a
# single ``np.minimum.reduceat`` — no per-token and no per-doc Python in the
# hot loop. Band bucket keys are combined in numpy too, so the JVM never
# builds band strings.

_BAND_P = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant for band mixing


def _batch_minhash(texts: pd.Series, n: int, k: int) -> np.ndarray:
    """(len(texts), k) uint64 MinHash signatures for a whole Arrow batch."""
    docs = [shingles(t.split() if t else [], n) for t in texts]
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    sigs = np.zeros((len(docs), k), dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return sigs
    flat = np.concatenate([np.asarray(d, dtype=object) for d in docs if d])
    h = pd.util.hash_array(flat, categorize=False).astype(np.uint64)
    with np.errstate(over="ignore"):
        table = h[:, None] * _MH_A[:k] + _MH_B[:k]  # (S, k), wraps mod 2^64
        offsets = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        starts = offsets[:-1][lens > 0]
        sigs[lens > 0] = np.minimum.reduceat(table, starts, axis=0)
    return sigs


def minhash_band_keys_udf(n: int = 3, bands: int = 16, rows_per_band: int = 4):
    """text -> array<long> of ``bands`` LSH bucket keys, fully vectorized:
    batch-wide shingle hashing + reduceat signature + splitmix band mixing."""
    k = bands * rows_per_band

    @F.pandas_udf("array<long>")
    def _udf(texts: pd.Series) -> pd.Series:
        sigs = _batch_minhash(texts, n, k)  # (N, k) uint64
        with np.errstate(over="ignore"):
            acc = np.zeros((sigs.shape[0], bands), dtype=np.uint64)
            for r in range(rows_per_band):
                acc = acc * _BAND_P + sigs[:, r::rows_per_band][:, :bands]
        keys = acc.view(np.int64)  # bit-reinterpret, not value cast
        return pd.Series(list(keys))

    return _udf


@F.pandas_udf(LongType())
def simhash_text_udf(texts: pd.Series) -> pd.Series:
    """SimHash-64 straight from text, batch-vectorized: one hash_array call
    for every token in the Arrow batch, per-doc bit votes via add.reduceat."""
    bit_idx = np.arange(64, dtype=np.uint64)
    docs = [t.strip().lower().split() if t else [] for t in texts]
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    out = np.zeros(len(docs), dtype=np.int64)
    total = int(lens.sum())
    if total:
        flat = np.concatenate([np.asarray(d, dtype=object) for d in docs if d])
        h = pd.util.hash_array(flat, categorize=False).astype(np.uint64)
        signs = (((h[:, None] >> bit_idx) & np.uint64(1)).astype(np.int8) * 2 - 1)
        offsets = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        starts = offsets[:-1][lens > 0]
        votes = np.add.reduceat(signs.astype(np.int64), starts, axis=0)
        vals = ((votes > 0).astype(np.uint64) << bit_idx).sum(axis=1)
        out[lens > 0] = vals.view(np.int64)  # bit-reinterpret to signed
    return pd.Series(out)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
