"""F17/F18 — deterministic trust-artifact kernels: X.509 parse, RFC 3161 TSQ
build / TSR parse, PEM codec, TSA cert-chain ordering.

The reference consumes both capabilities through network transports plus the
``cryptography`` / ``rfc3161_client`` libs:

* ``modules/ssl_enricher/ssl_enricher.py:16-31`` — ``ssl.get_server_certificate``
  for the URL's https host, stored as ``{slugify(domain)}.pem``;
* ``modules/timestamping_enricher/timestamping_enricher.py:55-107`` — the
  newline-joined media hashes (``SHA-256:``/``SHA3-512:`` prefixes stripped)
  are timestamped per TSA: a nonce'd ``TimestampRequestBuilder`` TSQ is
  POSTed, the TSR decoded, the embedded cert chain reordered
  leaf→…→root (``tst_certs``, :210-228) and saved.

The network halves (TLS handshake, TSA POST) are declared-external
transports. Everything deterministic — the DER artifacts themselves — is
implemented here from the public RFCs (5280, 3161, 5652) as pure-stdlib
kernels, so the engine can build byte-exact timestamp requests and parse
real certificates / timestamp responses delivered by any transport. Pure
Python is the right tier: these payloads are a few hundred bytes per *host*
(not per URL) and run inside the existing Arrow-batched fetch/enrich UDFs.

No third-party ASN.1 dependency: the container has no ``cryptography`` /
``pyasn1``, and the subset of DER needed (definite lengths, the certificate
and TSP productions) is small and fully specified.
"""

from __future__ import annotations

import base64
import calendar
import hashlib

# ---------------------------------------------------------------------------
# DER primitives (X.690): definite-length TLV encode / decode
# ---------------------------------------------------------------------------

TAG_INTEGER = 0x02
TAG_BITSTRING = 0x03
TAG_OCTETSTRING = 0x04
TAG_NULL = 0x05
TAG_OID = 0x06
TAG_UTF8STRING = 0x0C
TAG_SEQUENCE = 0x30
TAG_SET = 0x31
TAG_PRINTABLESTRING = 0x13
TAG_IA5STRING = 0x16
TAG_UTCTIME = 0x17
TAG_GENERALIZEDTIME = 0x18
TAG_BOOLEAN = 0x01


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def der_tlv(tag: int, content: bytes) -> bytes:
    return bytes([tag]) + _der_len(len(content)) + content


def der_seq(*parts: bytes) -> bytes:
    return der_tlv(TAG_SEQUENCE, b"".join(parts))


def der_set(*parts: bytes) -> bytes:
    return der_tlv(TAG_SET, b"".join(parts))


def der_int(v: int) -> bytes:
    """DER INTEGER: minimal two's-complement encoding (leading 0x00 only to
    keep a positive value's MSB clear)."""
    if v == 0:
        return der_tlv(TAG_INTEGER, b"\x00")
    nbytes = (v.bit_length() + 8) // 8 if v > 0 else (v.bit_length() // 8) + 1
    return der_tlv(TAG_INTEGER, v.to_bytes(nbytes, "big", signed=True))


def der_bool(v: bool) -> bytes:
    return der_tlv(TAG_BOOLEAN, b"\xff" if v else b"\x00")


def der_null() -> bytes:
    return der_tlv(TAG_NULL, b"")


def der_oid(dotted: str) -> bytes:
    arcs = [int(a) for a in dotted.split(".")]
    body = bytearray([arcs[0] * 40 + arcs[1]])
    for arc in arcs[2:]:
        chunk = bytearray([arc & 0x7F])
        arc >>= 7
        while arc:
            chunk.insert(0, 0x80 | (arc & 0x7F))
            arc >>= 7
        body += chunk
    return der_tlv(TAG_OID, bytes(body))


def der_octets(b: bytes) -> bytes:
    return der_tlv(TAG_OCTETSTRING, b)


def der_bitstring(b: bytes, unused: int = 0) -> bytes:
    return der_tlv(TAG_BITSTRING, bytes([unused]) + b)


def der_utf8(s: str) -> bytes:
    return der_tlv(TAG_UTF8STRING, s.encode("utf-8"))


def der_ia5(s: str) -> bytes:
    return der_tlv(TAG_IA5STRING, s.encode("ascii"))


def der_ctx(num: int, content: bytes, constructed: bool = True) -> bytes:
    """Context-specific tag [num]."""
    return der_tlv(0x80 | (0x20 if constructed else 0) | num, content)


def der_generalized_time(epoch: int) -> bytes:
    import time as _t  # noqa: PLC0415

    st = _t.gmtime(epoch)
    s = f"{st.tm_year:04d}{st.tm_mon:02d}{st.tm_mday:02d}{st.tm_hour:02d}{st.tm_min:02d}{st.tm_sec:02d}Z"
    return der_tlv(TAG_GENERALIZEDTIME, s.encode("ascii"))


def der_utc_time(epoch: int) -> bytes:
    import time as _t  # noqa: PLC0415

    st = _t.gmtime(epoch)
    s = f"{st.tm_year % 100:02d}{st.tm_mon:02d}{st.tm_mday:02d}{st.tm_hour:02d}{st.tm_min:02d}{st.tm_sec:02d}Z"
    return der_tlv(TAG_UTCTIME, s.encode("ascii"))


class DerError(ValueError):
    pass


def der_read(data: bytes, off: int = 0) -> tuple[int, bytes, int]:
    """Read one TLV at ``off``; return (tag, content, next_off). Definite
    lengths only (DER forbids indefinite)."""
    if off + 2 > len(data):
        raise DerError("truncated TLV header")
    tag = data[off]
    lb = data[off + 1]
    off += 2
    if lb < 0x80:
        ln = lb
    else:
        n = lb & 0x7F
        if n == 0 or off + n > len(data):
            raise DerError("bad length")
        ln = int.from_bytes(data[off : off + n], "big")
        off += n
    if off + ln > len(data):
        raise DerError("content overruns buffer")
    return tag, data[off : off + ln], off + ln


def der_children(content: bytes) -> list[tuple[int, bytes]]:
    """All TLVs directly inside a constructed value's content."""
    out, off = [], 0
    while off < len(content):
        tag, body, off = der_read(content, off)
        out.append((tag, body))
    return out


def oid_decode(body: bytes) -> str:
    if not body:
        raise DerError("empty OID")
    arcs = [body[0] // 40, body[0] % 40]
    val = 0
    for b in body[1:]:
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            arcs.append(val)
            val = 0
    return ".".join(str(a) for a in arcs)


def int_decode(body: bytes) -> int:
    return int.from_bytes(body, "big", signed=True)


def time_decode(tag: int, body: bytes) -> int:
    """UTCTime (RFC 5280 §4.1.2.5.1 50-year window) or GeneralizedTime →
    epoch seconds."""
    s = body.decode("ascii")
    if tag == TAG_UTCTIME:
        yy = int(s[0:2])
        year = 2000 + yy if yy < 50 else 1900 + yy
        rest = s[2:]
    elif tag == TAG_GENERALIZEDTIME:
        year, rest = int(s[0:4]), s[4:]
    else:
        raise DerError(f"not a time tag: {tag:#x}")
    mo, dd, hh, mi = int(rest[0:2]), int(rest[2:4]), int(rest[4:6]), int(rest[6:8])
    ss = int(rest[8:10]) if rest[8:10].isdigit() else 0
    return calendar.timegm((year, mo, dd, hh, mi, ss, 0, 0, 0))


# ---------------------------------------------------------------------------
# PEM codec (RFC 7468) — the ssl_enricher stores PEM; parsers take either
# ---------------------------------------------------------------------------


def pem_to_der(text: str, label: str = "CERTIFICATE") -> bytes:
    begin, end = f"-----BEGIN {label}-----", f"-----END {label}-----"
    if begin not in text or end not in text:
        raise DerError(f"no {label} PEM block")
    b64 = text.split(begin, 1)[1].split(end, 1)[0]
    return base64.b64decode("".join(b64.split()))


def der_to_pem(der: bytes, label: str = "CERTIFICATE") -> str:
    b64 = base64.b64encode(der).decode("ascii")
    lines = [b64[i : i + 64] for i in range(0, len(b64), 64)]
    return f"-----BEGIN {label}-----\n" + "\n".join(lines) + f"\n-----END {label}-----\n"


# ---------------------------------------------------------------------------
# X.509 (RFC 5280) — parse the fields the archive keeps, build a minimal
# well-formed certificate for fixtures/gates (signature bytes are synthetic:
# building real signatures needs a CA key, which no archive consumer checks
# here — the reference stores certs, it does not validate chains itself)
# ---------------------------------------------------------------------------

OID_CN = "2.5.4.3"
OID_SAN = "2.5.29.17"
OID_RSA = "1.2.840.113549.1.1.1"
OID_SHA256_RSA = "1.2.840.113549.1.1.11"
OID_SHA256 = "2.16.840.1.101.3.4.2.1"
OID_SHA512 = "2.16.840.1.101.3.4.2.3"
OID_SIGNED_DATA = "1.2.840.113549.1.7.2"
OID_TST_INFO = "1.2.840.113549.1.9.16.1.4"

_DIGEST_OIDS = {OID_SHA256: "sha256", OID_SHA512: "sha512"}


def _name_cn(name_content: bytes) -> str:
    """First CN in an RDNSequence ('' if none) — what the reference keeps per
    chain cert (timestamping_enricher.py:252 ``NameOID.COMMON_NAME``)."""
    for _tag, rdn in der_children(name_content):  # SET OF
        for _t2, atv in der_children(rdn):  # SEQUENCE {oid, value}
            kids = der_children(atv)
            if len(kids) == 2 and kids[0][0] == TAG_OID and oid_decode(kids[0][1]) == OID_CN:
                return kids[1][1].decode("utf-8", "replace")
    return ""


def x509_parse(der: bytes) -> dict:
    """Extract the certificate fields the archive records: serial (decimal
    string — reference filenames use ``str(cert.serial_number)``), subject /
    issuer CN, validity window (epoch), SAN dNSNames, signature-algorithm
    OID, sha256 fingerprint of the full DER."""
    _, cert, _ = der_read(der)
    kids = der_children(cert)
    if len(kids) < 3:
        raise DerError("not a Certificate")
    tbs_tag, tbs = kids[0]
    if tbs_tag != TAG_SEQUENCE:
        raise DerError("missing TBSCertificate")
    sig_alg_oid = oid_decode(der_children(kids[1][1])[0][1])
    fields = der_children(tbs)
    i = 0
    version = 1
    if fields and fields[0][0] == 0xA0:  # [0] EXPLICIT version
        version = int_decode(der_children(fields[0][1])[0][1]) + 1
        i = 1
    serial = int_decode(fields[i][1])
    issuer = _name_cn(fields[i + 2][1])
    nb_tag, nb = der_children(fields[i + 3][1])[0]
    na_tag, na = der_children(fields[i + 3][1])[1]
    subject = _name_cn(fields[i + 4][1])
    san: list[str] = []
    for tag, body in fields[i + 5 :]:
        if tag != 0xA3:  # [3] EXPLICIT extensions
            continue
        for _t, ext in der_children(der_children(body)[0][1]):
            ek = der_children(ext)
            if oid_decode(ek[0][1]) != OID_SAN:
                continue
            # last child is the OCTET STRING (critical BOOLEAN may precede);
            # its content is the GeneralNames SEQUENCE — descend into it
            for gt, gb in der_children(der_children(ek[-1][1])[0][1]):
                if gt == 0x82:  # [2] IMPLICIT IA5String dNSName
                    san.append(gb.decode("ascii", "replace"))
    return {
        "version": version,
        "serial": str(serial),
        "sig_alg": sig_alg_oid,
        "issuer_cn": issuer,
        "subject_cn": subject,
        "not_before": time_decode(nb_tag, nb),
        "not_after": time_decode(na_tag, na),
        "san_dns": san,
        "fingerprint_sha256": hashlib.sha256(der).hexdigest(),
    }


def _rdn_cn(cn: str) -> bytes:
    return der_seq(der_set(der_seq(der_oid(OID_CN), der_utf8(cn))))


def x509_build(
    subject_cn: str,
    issuer_cn: str,
    serial: int,
    not_before: int,
    not_after: int,
    san_dns: list[str] | None = None,
) -> bytes:
    """Minimal well-formed v3 certificate DER for fixtures: real structure,
    synthetic (deterministic, serial-derived) signature bytes."""
    exts = b""
    if san_dns:
        general_names = der_seq(*[der_ctx(2, d.encode("ascii"), constructed=False) for d in san_dns])
        exts = der_ctx(3, der_seq(der_seq(der_oid(OID_SAN), der_octets(general_names))))
    spki = der_seq(der_seq(der_oid(OID_RSA), der_null()), der_bitstring(b"\x00"))
    tbs = der_seq(
        der_ctx(0, der_int(2)),  # v3
        der_int(serial),
        der_seq(der_oid(OID_SHA256_RSA), der_null()),
        _rdn_cn(issuer_cn),
        der_seq(der_utc_time(not_before), der_utc_time(not_after)),
        _rdn_cn(subject_cn),
        spki,
        exts,
    )
    fake_sig = hashlib.sha256(b"sig:" + tbs).digest()
    return der_seq(tbs, der_seq(der_oid(OID_SHA256_RSA), der_null()), der_bitstring(fake_sig))


def order_cert_chain(certs: list[dict]) -> list[int]:
    """Reorder a TSR's certificate bag leaf→…→root: start from the cert no
    other cert names as its issuer, then repeatedly append the cert whose
    subject is the previous cert's issuer (reference ``tst_certs``,
    timestamping_enricher.py:210-228). Returns indices into ``certs``;
    single-cert bags return [0] unchanged like the reference."""
    if len(certs) <= 1:
        return list(range(len(certs)))
    ordered: list[int] = []
    remaining = list(range(len(certs)))
    while remaining:
        if not ordered:
            pick = next(
                (i for i in remaining
                 if not any(certs[i]["subject_cn"] == certs[j]["issuer_cn"]
                            for j in remaining if j != i)),
                remaining[0],
            )
        else:
            prev_issuer = certs[ordered[-1]]["issuer_cn"]
            pick = next((i for i in remaining if certs[i]["subject_cn"] == prev_issuer), None)
            if pick is None:
                break  # broken chain: keep what we ordered, like a partial bag
        ordered.append(pick)
        remaining.remove(pick)
    return ordered + remaining


# ---------------------------------------------------------------------------
# RFC 3161 — TimeStampReq build (byte-exact, what the enricher POSTs) and
# TimeStampResp parse (status + TSTInfo + certificate bag)
# ---------------------------------------------------------------------------


def tsq_build(message: bytes, nonce: int | None, cert_req: bool = True, hash_alg: str = "sha256") -> bytes:
    """TimeStampReq ::= SEQUENCE {version 1, messageImprint, nonce?, certReq}
    (RFC 3161 §2.4.1). The reference builds the same request via
    ``TimestampRequestBuilder().data(...).nonce(...)``
    (timestamping_enricher.py:174-176); sha256 imprint, like the builder's
    default. Deterministic given (message, nonce)."""
    if hash_alg == "sha256":
        alg_oid, digest = OID_SHA256, hashlib.sha256(message).digest()
    elif hash_alg == "sha512":
        alg_oid, digest = OID_SHA512, hashlib.sha512(message).digest()
    else:
        raise ValueError(f"unsupported hash algorithm {hash_alg!r}")
    imprint = der_seq(der_seq(der_oid(alg_oid), der_null()), der_octets(digest))
    parts = [der_int(1), imprint]
    if nonce is not None:
        parts.append(der_int(nonce))
    if cert_req:
        parts.append(der_bool(True))
    return der_seq(*parts)


def tsq_parse(der: bytes) -> dict:
    _, req, _ = der_read(der)
    kids = der_children(req)
    imprint = der_children(kids[1][1])
    alg = oid_decode(der_children(imprint[0][1])[0][1])
    out = {
        "version": int_decode(kids[0][1]),
        "hash_alg": _DIGEST_OIDS.get(alg, alg),
        "hashed_message": imprint[1][1].hex(),
        "nonce": None,
        "cert_req": False,
    }
    for tag, body in kids[2:]:
        if tag == TAG_INTEGER:
            out["nonce"] = int_decode(body)
        elif tag == TAG_BOOLEAN:
            out["cert_req"] = body != b"\x00"
    return out


def tsr_build(
    message: bytes,
    serial: int,
    gen_time: int,
    nonce: int | None = None,
    status: int = 0,
    certs: list[bytes] | None = None,
    policy: str = "1.3.6.1.4.1.4146.2.3",
) -> bytes:
    """Minimal TimeStampResp for fixtures: PKIStatusInfo + a CMS SignedData
    envelope whose eContent is a real TSTInfo (RFC 3161 §2.4.2 / RFC 5652
    §5.1). Granted responses carry the imprint of ``message``; rejections
    carry no token, like real TSAs."""
    status_info = der_seq(der_int(status))
    if status not in (0, 1):  # not granted
        return der_seq(status_info)
    imprint = der_seq(der_seq(der_oid(OID_SHA256), der_null()), der_octets(hashlib.sha256(message).digest()))
    tst_parts = [der_int(1), der_oid(policy), imprint, der_int(serial), der_generalized_time(gen_time)]
    if nonce is not None:
        tst_parts.append(der_int(nonce))
    tst_info = der_seq(*tst_parts)
    encap = der_seq(der_oid(OID_TST_INFO), der_ctx(0, der_octets(tst_info)))
    cert_bag = der_ctx(0, b"".join(certs or []))
    signed_data = der_seq(
        der_int(3),
        der_set(der_seq(der_oid(OID_SHA256), der_null())),
        encap,
        cert_bag,
        der_set(),  # signerInfos: empty in fixtures (signing needs a CA key)
    )
    token = der_seq(der_oid(OID_SIGNED_DATA), der_ctx(0, signed_data))
    return der_seq(status_info, token)


def tsr_parse(der: bytes) -> dict:
    """Extract what the enricher records from a TimeStampResp: grant status,
    TSTInfo (serial — decimal string, genTime epoch, imprint, nonce, policy)
    and the embedded certificate bag parsed + chain-ordered."""
    _, resp, _ = der_read(der)
    kids = der_children(resp)
    status = int_decode(der_children(kids[0][1])[0][1])
    out: dict = {
        "status": status,
        "granted": status in (0, 1),
        "serial": None,
        "gen_time": None,
        "policy": None,
        "hash_alg": None,
        "hashed_message": None,
        "nonce": None,
        "cert_chain": [],
    }
    if len(kids) < 2:
        return out
    content_info = der_children(kids[1][1])
    if oid_decode(content_info[0][1]) != OID_SIGNED_DATA:
        raise DerError("token is not CMS SignedData")
    signed_data = der_children(der_children(content_info[1][1])[0][1])
    encap = der_children(signed_data[2][1])
    if oid_decode(encap[0][1]) != OID_TST_INFO:
        raise DerError("eContent is not TSTInfo")
    tst_octets = der_children(encap[1][1])[0][1]
    _, tst, _ = der_read(tst_octets)
    tk = der_children(tst)
    imprint = der_children(tk[2][1])
    alg = oid_decode(der_children(imprint[0][1])[0][1])
    out["policy"] = oid_decode(tk[1][1])
    out["hash_alg"] = _DIGEST_OIDS.get(alg, alg)
    out["hashed_message"] = imprint[1][1].hex()
    out["serial"] = str(int_decode(tk[3][1]))
    out["gen_time"] = time_decode(tk[4][0], tk[4][1])
    for tag, body in tk[5:]:
        if tag == TAG_INTEGER:
            out["nonce"] = int_decode(body)
    certs = []
    for tag, body in signed_data[3:]:
        if tag == 0xA0:  # [0] IMPLICIT certificates
            off = 0
            while off < len(body):
                _t, _c, noff = der_read(body, off)
                certs.append(x509_parse(body[off:noff]))
                off = noff
    out["cert_chain"] = [certs[i] for i in order_cert_chain(certs)]
    return out


def hashes_document(hash_list: list[str]) -> str:
    """The exact data the reference timestamps: media hashes with their
    ``SHA-256:`` / ``SHA3-512:`` prefixes stripped, newline-joined
    (timestamping_enricher.py:56-66)."""
    return "\n".join(
        h.replace("SHA-256:", "").replace("SHA3-512:", "") for h in hash_list if h
    )
