"""Partitioned Bloom sidecar for the url_seen table (north-rule structure).

PySpark 4.1 exposes neither ``bloom_filter_agg`` nor ``DataFrame.stat
.bloomFilter`` to Python, so the sidecar is custom numpy — but fully
*distributed* end to end:

* **build**: each url_hash bucket (``pmod(url_hash, N_BUCKETS)``) aggregates
  its own fixed-size bitmap inside ``applyInPandas`` — no key ever travels to
  the driver.
* **persist**: the bitmaps are a normal (bucket-keyed) DataFrame — the wave
  driver commits them as the ``url_seen_bloom`` table next to the (equally
  bucketed) ``url_seen`` table and *merges incrementally*: per wave only the
  newly-seen keys are hashed into delta bitmaps, OR-merged with the prior
  sidecar (fixed ``m`` per bucket makes OR-merge exact).
* **probe**: a bucket-aligned **cogroup** — candidates shuffle once on the
  same bucket key the seen-table is partitioned by, and each task zips its
  candidate group with exactly ONE bitmap row (~m/8 bytes). The driver never
  materializes a single bitmap; at 10^10 keys the 15-GB sidecar stays
  executor-side, one bucket per task.

Bloom-*negative* candidates are provably NEW and skip the anti-join shuffle
entirely; only positives (true-seen + FPR) join against the big table.

Bucket ids are computed with Spark ``pmod`` on the signed int64 hash on BOTH
build and probe sides (round-1 ADVICE: a uint64 ``%`` probe disagrees with
pmod for negative hashes unless n_buckets is a power of two).

Double hashing (Kirsch-Mitzenmacher): pos_i = (h1 + i*h2) mod m with h1/h2
carved from the 64-bit xxhash key itself — zero extra hashing cost.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_K = 7
# fixed bits per bucket: sized for the sandbox fixtures; a 10^10-key
# deployment sets ~12 bits/expected-key (≈60 MB/bucket at 256 buckets)
DEFAULT_M_BITS = 1 << 17

SIDECAR_SCHEMA = "bucket int, n long, m long, bloom binary"


def _bit_positions(hashes: np.ndarray, m: int) -> np.ndarray:
    """(len, BLOOM_K) bit positions via double hashing of the u64 keys."""
    h = hashes.astype(np.uint64)
    m_ = np.uint64(m)
    h1 = h % m_
    h2 = ((h >> np.uint64(33)) << np.uint64(1)) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % m_).astype(np.int64)


def _build_bitmap(hashes: np.ndarray, m: int) -> bytes:
    bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
    pos = _bit_positions(hashes, m).ravel()
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitmap.tobytes()


def _check_bitmap(hashes: np.ndarray, m: int, bitmap: bytes) -> np.ndarray:
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    bits = np.frombuffer(bitmap, dtype=np.uint8)
    pos = _bit_positions(hashes, m)
    hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return hit.all(axis=1).astype(bool)


def build_sidecar(
    keys: DataFrame, n_buckets: int, m_bits: int = DEFAULT_M_BITS, hash_col: str = "url_hash"
) -> DataFrame:
    """One fixed-size Bloom bitmap per url_hash bucket, built executor-side.
    Only buckets that contain keys get a row (delta-friendly)."""

    def build_one(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf[hash_col].to_numpy(dtype=np.int64).astype(np.uint64)
        return pd.DataFrame(
            [{"bucket": int(key[0]), "n": len(hashes), "m": m_bits,
              "bloom": _build_bitmap(hashes, m_bits)}]
        )

    return (
        keys.select(hash_col)
        .withColumn("bucket", F.pmod(hash_col, F.lit(n_buckets)).cast("int"))
        .groupBy("bucket")
        .applyInPandas(build_one, SIDECAR_SCHEMA)
    )


def merge_sidecars(prior: DataFrame, delta: DataFrame) -> DataFrame:
    """OR-merge two sidecars (fixed equal ``m`` per bucket ⇒ exact union).
    Executor-side; each group holds at most 2 bitmap rows."""

    def or_merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        m = int(pdf["m"].iloc[0])
        acc = np.zeros((m + 7) // 8, dtype=np.uint8)
        for b in pdf["bloom"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame(
            [{"bucket": int(key[0]), "n": int(pdf["n"].sum()), "m": m,
              "bloom": acc.tobytes()}]
        )

    return prior.unionByName(delta).groupBy("bucket").applyInPandas(or_merge, SIDECAR_SCHEMA)


@dataclass
class BloomSidecar:
    """Handle over a sidecar *DataFrame* — bitmaps stay distributed; the
    driver only ever sees the (tiny) handle, never a bitmap."""

    n_buckets: int
    sidecar: DataFrame

    @classmethod
    def build(cls, url_seen: DataFrame, n_buckets: int, m_bits: int = DEFAULT_M_BITS):
        return cls(n_buckets, build_sidecar(url_seen, n_buckets, m_bits))

    @classmethod
    def from_table(cls, sidecar_df: DataFrame, n_buckets: int):
        """Wrap a persisted ``url_seen_bloom`` snapshot (wave driver path)."""
        return cls(n_buckets, sidecar_df)

    def is_empty(self) -> bool:
        return self.sidecar.isEmpty()

    def might_contain_col(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """Adds boolean ``maybe_seen`` via a bucket-aligned cogroup zip.

        One shuffle of the candidates on the bucket key (the same
        partitioning the url_seen table and its anti-join already use); each
        task reads exactly one bitmap row. Vectorized bit math over the whole
        candidate group.
        """
        out_fields = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        schema = ", ".join(f"{n} {t}" for n, t in out_fields) + ", maybe_seen boolean"
        cols = [n for n, _ in out_fields]

        def probe(key: tuple, cand: pd.DataFrame, side: pd.DataFrame) -> pd.DataFrame:
            out = cand[cols].copy()
            if side.empty:
                out["maybe_seen"] = False
                return out
            m = int(side["m"].iloc[0])
            bitmap = side["bloom"].iloc[0]
            h = cand[hash_col].to_numpy(dtype=np.int64).astype(np.uint64)
            out["maybe_seen"] = _check_bitmap(h, m, bitmap)
            return out

        cand = df.withColumn(
            "_bucket", F.pmod(F.col(hash_col), F.lit(self.n_buckets)).cast("int")
        )
        return (
            cand.groupBy("_bucket")
            .cogroup(self.sidecar.groupBy("bucket"))
            .applyInPandas(probe, schema)
        )
