"""Content hashing — native where Spark has it, Arrow-batched where it doesn't.

* SHA-256  (F1): native ``sha2`` — bit-identical to hashlib on the same bytes;
  output format ``"SHA-256:<hex>"`` per reference
  modules/hash_enricher/hash_enricher.py:32 (golden vectors
  tests/enrichers/test_hash_enricher.py:8-28).
* SHA3-512 (F2): not native in Spark -> Arrow-batched pandas UDF (hashlib).
* dHash-64 perceptual hash (F3 analog): see codec.dhash64; UDF in enrich.py.
* SimHash-64 & MinHash: engine additions for near-duplicate detection at
  training-data scale (no reference analog; standard sketches). Both are
  deterministic md5-derived (stable across executors/runs — a requirement of
  checkpoint-resume, cf. SURVEY.md §2.8 F12).
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


@F.pandas_udf(LongType())
def simhash64_udf(token_arrays: pd.Series) -> pd.Series:
    return token_arrays.map(lambda toks: simhash64(list(toks)))


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


def minhash_udf(n: int = 3, k: int = _MINHASH_K):
    @F.pandas_udf("array<long>")
    def _udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: minhash_signature(shingles(t.split(), n), k))

    return _udf


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)
