"""F17/F18 trust-artifact kernels: DER primitives, X.509 parse, RFC 3161
TSQ/TSR, chain ordering, and the Spark operators over them."""

import hashlib

import pytest

from auto_archiver_spark.functions import asn1 as A


def test_der_int_minimal_encoding():
    assert A.der_int(0) == bytes.fromhex("020100")
    assert A.der_int(1) == bytes.fromhex("020101")
    assert A.der_int(127) == bytes.fromhex("02017f")
    # positive with MSB set needs a leading 0x00 pad
    assert A.der_int(128) == bytes.fromhex("02020080")
    assert A.der_int(0x4142434445464748) == bytes.fromhex("02084142434445464748")
    assert A.der_int(-1) == bytes.fromhex("0201ff")


def test_der_oid_roundtrip():
    for oid in (A.OID_SHA256, A.OID_CN, A.OID_SAN, A.OID_SIGNED_DATA, A.OID_TST_INFO):
        tag, body, _ = A.der_read(A.der_oid(oid))
        assert tag == A.TAG_OID and A.oid_decode(body) == oid
    # known encoding: sha256 OID
    assert A.der_oid(A.OID_SHA256).hex() == "0609608648016503040201"


def test_der_long_length_and_time():
    big = A.der_octets(b"x" * 300)
    tag, body, end = A.der_read(big)
    assert tag == A.TAG_OCTETSTRING and len(body) == 300 and end == len(big)
    # UTCTime 50-year window (RFC 5280): 49 -> 2049, 50 -> 1950
    assert A.time_decode(A.TAG_UTCTIME, b"490101000000Z") > 0
    assert A.time_decode(A.TAG_UTCTIME, b"500101000000Z") < 0
    # generalized round trip
    t = 1650000000
    tag, body, _ = A.der_read(A.der_generalized_time(t))
    assert A.time_decode(tag, body) == t


def test_x509_build_parse_roundtrip():
    der = A.x509_build(
        "leaf.example.com", "Example CA", 123456789,
        1600000000, 1700000000, ["leaf.example.com", "www.example.com"],
    )
    p = A.x509_parse(der)
    assert p["version"] == 3
    assert p["serial"] == "123456789"
    assert p["subject_cn"] == "leaf.example.com"
    assert p["issuer_cn"] == "Example CA"
    assert p["not_before"] == 1600000000 and p["not_after"] == 1700000000
    assert p["san_dns"] == ["leaf.example.com", "www.example.com"]
    assert p["sig_alg"] == A.OID_SHA256_RSA
    assert p["fingerprint_sha256"] == hashlib.sha256(der).hexdigest()
    # deterministic build
    assert A.x509_build("leaf.example.com", "Example CA", 123456789,
                        1600000000, 1700000000,
                        ["leaf.example.com", "www.example.com"]) == der


def test_pem_codec_roundtrip():
    der = A.x509_build("a.example.com", "CA", 7, 0, 10)
    pem = A.der_to_pem(der)
    assert pem.startswith("-----BEGIN CERTIFICATE-----")
    assert A.pem_to_der(pem) == der
    with pytest.raises(A.DerError):
        A.pem_to_der("no block here")


def test_tsq_byte_exact_and_parse():
    """The fixed-shape TSQ is byte-pinned: RFC 3161 §2.4.1 with sha256
    imprint, 8-byte nonce, certReq TRUE — and must equal the Catalyst
    template in operators/trust.py."""
    msg = b"abc\ndef"
    nonce = 0x4142434445464748
    tsq = A.tsq_build(msg, nonce)
    expected = (
        "3043020101"
        "3031300d060960864801650304020105000420"
        + hashlib.sha256(msg).hexdigest()
        + "0208" + "4142434445464748"
        + "0101ff"
    )
    assert tsq.hex() == expected
    q = A.tsq_parse(tsq)
    assert q == {
        "version": 1, "hash_alg": "sha256",
        "hashed_message": hashlib.sha256(msg).hexdigest(),
        "nonce": nonce, "cert_req": True,
    }
    # optional fields really optional
    q2 = A.tsq_parse(A.tsq_build(msg, nonce=None, cert_req=False))
    assert q2["nonce"] is None and not q2["cert_req"]
    # sha512 variant
    q3 = A.tsq_parse(A.tsq_build(msg, nonce=1, hash_alg="sha512"))
    assert q3["hash_alg"] == "sha512"
    assert q3["hashed_message"] == hashlib.sha512(msg).hexdigest()


def test_tsr_roundtrip_and_chain_order():
    msg = b"deadbeef"
    ca = A.x509_build("Root CA", "Root CA", 1, 1500000000, 1800000000)
    inter = A.x509_build("Inter CA", "Root CA", 2, 1500000000, 1800000000)
    leaf = A.x509_build("TSA Leaf", "Inter CA", 3, 1500000000, 1800000000)
    # bag deliberately shuffled: parse must reorder leaf -> inter -> root
    tsr = A.tsr_build(msg, serial=987, gen_time=1650000000, nonce=7,
                      certs=[inter, ca, leaf])
    r = A.tsr_parse(tsr)
    assert r["granted"] and r["status"] == 0
    assert r["serial"] == "987" and r["gen_time"] == 1650000000
    assert r["hashed_message"] == hashlib.sha256(msg).hexdigest()
    assert r["nonce"] == 7
    assert [c["subject_cn"] for c in r["cert_chain"]] == ["TSA Leaf", "Inter CA", "Root CA"]
    # rejection carries no token (like a real TSA)
    rej = A.tsr_parse(A.tsr_build(msg, serial=0, gen_time=0, status=2))
    assert not rej["granted"] and rej["serial"] is None and rej["cert_chain"] == []
    # single-cert bag returns as-is (reference tst_certs fast path)
    one = A.tsr_parse(A.tsr_build(msg, serial=1, gen_time=5, certs=[leaf]))
    assert [c["subject_cn"] for c in one["cert_chain"]] == ["TSA Leaf"]


def test_order_cert_chain_broken_chain_keeps_all():
    certs = [
        {"subject_cn": "A", "issuer_cn": "MissingCA"},
        {"subject_cn": "B", "issuer_cn": "A"},
        {"subject_cn": "C", "issuer_cn": "Nowhere"},
    ]
    idx = A.order_cert_chain(certs)
    assert sorted(idx) == [0, 1, 2]  # nothing dropped
    assert [certs[i]["subject_cn"] for i in idx[:2]] == ["B", "A"]


def test_hashes_document_matches_reference_semantics():
    assert A.hashes_document(
        ["SHA-256:aa", "SHA3-512:bb", "", None, "cc"]
    ) == "aa\nbb\ncc"


def test_trust_operators_on_spark(spark):
    """Spark wrappers: TSQ projection is native (byte-equal to the Python
    builder), cert/TSR parse run the real kernels batch-wise with coarse
    error categories."""
    from pyspark.sql import functions as F

    from auto_archiver_spark.operators.trust import (
        parse_certificates,
        parse_timestamp_responses,
        timestamp_requests,
    )

    rows = [
        (1, ["SHA-256:" + hashlib.sha256(b"x").hexdigest()], 5),
        (2, ["SHA3-512:" + hashlib.sha512(b"y").hexdigest(), "SHA-256:ff"], -3),
    ]
    df = spark.createDataFrame(rows, "url_hash long, hashes array<string>, nonce long")
    got = {r["url_hash"]: r for r in timestamp_requests(df).collect()}
    for uid, hashes, nonce in rows:
        doc = A.hashes_document(hashes)
        norm = (nonce & 0x3FFFFFFFFFFFFFFF) | 0x4000000000000000
        assert got[uid]["ts_document"] == doc
        assert got[uid]["tsq_hex"] == A.tsq_build(doc.encode(), norm).hex()

    der = A.x509_build("h.example.com", "CA", 44, 100, 200, ["h.example.com"])
    cdf = spark.createDataFrame(
        [(1, A.der_to_pem(der)), (2, "garbage"), (3, None)],
        "url_hash long, cert_pem string",
    )
    cp = {r["url_hash"]: r for r in parse_certificates(cdf).collect()}
    assert cp[1]["subject_cn"] == "h.example.com" and cp[1]["serial"] == "44"
    assert cp[1]["san_dns"] == "h.example.com" and cp[1]["cert_err"] is None
    assert cp[2]["cert_err"] == "decode_error"
    assert cp[3]["cert_err"] == "empty"

    tsr = A.tsr_build(b"m", serial=9, gen_time=123, nonce=1, certs=[der])
    tdf = spark.createDataFrame(
        [(1, bytearray(tsr)), (2, bytearray(b"\x30\x00bad"))],
        "url_hash long, tsr_der binary",
    )
    tp = {r["url_hash"]: r for r in parse_timestamp_responses(tdf).collect()}
    assert tp[1]["ts_granted"] and tp[1]["ts_serial"] == "9"
    assert tp[1]["ts_gen_time"] == 123 and tp[1]["ts_cert_chain"] == "h.example.com"
    assert tp[2]["ts_err"] == "decode_error"


def test_ots_varuint_roundtrip():
    from auto_archiver_spark.functions import ots as O

    for v in (0, 1, 127, 128, 255, 300, 1 << 20, (1 << 35) + 7):
        enc = O.varuint_encode(v)
        got, off = O.varuint_decode(enc, 0)
        assert got == v and off == len(enc)
    assert O.varuint_encode(0) == b"\x00"
    assert O.varuint_encode(128) == b"\x80\x01"  # LEB128 little-endian


def test_ots_build_parse_roundtrip():
    import hashlib

    from auto_archiver_spark.functions import ots as O

    d = hashlib.sha256(b"payload").digest()
    cals = ["https://a.calendar.example.com/", "https://b.calendar.example.com/"]
    proof = O.ots_build(d, cals, bitcoin_height=800123)
    assert proof.startswith(O.HEADER_MAGIC)
    p = O.ots_parse(proof)
    assert p["digest"] == d.hexdigest() if hasattr(d, "hexdigest") else p["digest"] == d.hex()
    assert p["pending_uris"] == cals
    assert p["bitcoin_heights"] == [800123]
    assert p["attestation_count"] == 3 and p["verified"]
    # the op chain is EXECUTED: each pending attestation attests
    # sha256(digest + per-calendar nonce), not the raw digest
    for uri, att in zip(cals, p["attested_digests"][1:]):
        nonce = hashlib.sha256(d + uri.encode()).digest()[:16]
        assert att == hashlib.sha256(d + nonce).hexdigest()
    # deterministic build
    assert O.ots_build(d, cals, bitcoin_height=800123) == proof
    # pending-only is not verified (reference: verified iff a Bitcoin
    # attestation exists, opentimestamps_enricher.py:164-168)
    assert not O.ots_parse(O.ots_build(d, cals[:1]))["verified"]
    # malformed inputs raise OtsError
    import pytest as _pytest

    with _pytest.raises(O.OtsError):
        O.ots_parse(b"garbage")
    with _pytest.raises(O.OtsError):
        O.ots_parse(proof[:40])


def test_ots_deep_op_chain_no_recursion(monkeypatch):
    # ADVICE r5: the recursive walk blew the Python stack on a proof with a
    # few thousand chained ops — an untrusted .ots must yield a decode
    # error row, never a RecursionError task kill. The walk is now an
    # explicit stack; a 5000-op chain must parse.
    import hashlib
    import sys

    from auto_archiver_spark.functions import ots as O

    d = hashlib.sha256(b"deep").digest()
    att = bytes([O.TAG_ATTESTATION]) + O._attestation_bytes(("bitcoin", 800000))
    proof = (
        O.HEADER_MAGIC
        + O.varuint_encode(1)
        + bytes([O.TAG_OP_SHA256])
        + d
        + bytes([O.TAG_OP_SHA256]) * 5000
        + att
    )
    monkeypatch.setattr(sys, "setrecursionlimit", lambda _n: None)  # no cheating
    p = O.ots_parse(proof)
    assert p["attestation_count"] == 1 and p["verified"]
    m = d
    for _ in range(5000):
        m = hashlib.sha256(m).digest()
    assert p["attested_digests"] == [m.hex()]
