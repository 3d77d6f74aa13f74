"""Hash goldens — reference test vectors (tests/enrichers/test_hash_enricher.py:8-28:
file contents 'test1'/'test2') asserted against the native sha2 expr and the
sha3-512 pandas UDF; sketch determinism for simhash/minhash."""

import hashlib

from pyspark.sql import functions as F

from auto_archiver_spark.functions.hashing import (
    jaccard,
    md5_u64,
    minhash_signature,
    sha3_512_udf,
    sha256_tagged_expr,
    shingles,
    simhash64,
)

GOLDEN = {
    b"test1": (
        "SHA-256:" + hashlib.sha256(b"test1").hexdigest(),
        "SHA3-512:" + hashlib.sha3_512(b"test1").hexdigest(),
    ),
    b"test2": (
        "SHA-256:" + hashlib.sha256(b"test2").hexdigest(),
        "SHA3-512:" + hashlib.sha3_512(b"test2").hexdigest(),
    ),
}


def test_sha256_known_value():
    # the reference's literal golden digest for content 'test1'
    assert (
        hashlib.sha256(b"test1").hexdigest()
        == "1b4f0e9851971998e732078544c96b36c3d01cedf7caa332359d6f1d83567014"
    )


def test_spark_hash_goldens(spark):
    df = spark.createDataFrame([(k,) for k in GOLDEN], "data binary")
    rows = df.select(
        "data",
        sha256_tagged_expr(F.col("data")).alias("sha"),
        sha3_512_udf(F.col("data")).alias("sha3"),
    ).collect()
    for r in rows:
        exp256, exp3 = GOLDEN[bytes(r.data)]
        assert r.sha == exp256
        assert r.sha3 == exp3


def test_md5_u64_portable():
    # matches int('0x'+md5hex[:16]) — the cross-engine contract
    assert md5_u64("abc") == int(hashlib.md5(b"abc").hexdigest()[:16], 16)


def test_simhash_deterministic_and_similar():
    toks = "the quick brown fox jumps over the lazy dog".split()
    a = simhash64(toks)
    assert a == simhash64(list(toks))
    b = simhash64([*toks, "extra"])  # small edit -> small hamming distance
    assert bin((a ^ b) & (2**64 - 1)).count("1") <= 12
    assert simhash64([]) == 0


def test_minhash_similarity_estimate():
    w1 = ("spark frontier wave politeness bloom dedup " * 8).split()
    w2 = [*w1[:-4], "x", "y", "z", "w"]
    s1, s2 = set(shingles(w1)), set(shingles(w2))
    true_j = jaccard(s1, s2)
    m1 = minhash_signature(list(s1))
    m2 = minhash_signature(list(s2))
    est = sum(a == b for a, b in zip(m1, m2)) / len(m1)
    assert abs(est - true_j) < 0.25
    assert m1 == minhash_signature(list(s1))  # deterministic


def test_shingles_short_doc():
    assert shingles(["a", "b"], 3) == ["a b"]
    assert shingles([], 3) == []
    assert shingles("a b c d".split(), 3) == ["a b c", "b c d"]
