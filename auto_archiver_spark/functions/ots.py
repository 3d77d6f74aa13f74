"""F17b — OpenTimestamps detached-proof kernels: build, parse, verify-info.

The reference stamps every media file's sha256 with the opentimestamps lib
(`modules/opentimestamps_enricher/opentimestamps_enricher.py`): submit the
digest to remote calendars (:70-77 — network, declared external), serialize
a ``DetachedTimestampFile`` as ``{basename}.ots`` (:89-98), and report
verification info — attestation count, pending-uri / bitcoin-height status
per attestation, ``verified`` iff any Bitcoin attestation (:128-172).

This module implements the deterministic part — the .ots container itself —
from the public OpenTimestamps serialization spec (the python-opentimestamps
wire format): LEB128 varuints, varbytes, the 31-byte proof magic, the op
tree (sha256 / append / prepend) and the pending / bitcoin attestation
records. ``ots_build`` produces the same *shape* a calendar round trip
yields (per-calendar nonce-append → sha256 → pending attestation) with
nonces derived deterministically from digest+uri instead of the calendar's
RNG; ``ots_parse`` walks any spec-conformant proof, EXECUTING the op chain
so each attestation is paired with the digest it actually attests.

Pure stdlib; payloads are bytes-per-media-file, parsed inside Arrow-batched
UDFs like the other trust kernels.
"""

from __future__ import annotations

import hashlib

HEADER_MAGIC = b"\x00OpenTimestamps\x00\x00Proof\x00\xbf\x89\xe2\xe8\x84\xe8\x92\x94"
MAJOR_VERSION = 1

TAG_OP_SHA1 = 0x02
TAG_OP_RIPEMD160 = 0x03
TAG_OP_SHA256 = 0x08
TAG_OP_APPEND = 0xF0
TAG_OP_PREPEND = 0xF1
TAG_ATTESTATION = 0x00
TAG_FORK = 0xFF

ATT_PENDING = bytes.fromhex("83dfe30d2ef90c8e")
ATT_BITCOIN = bytes.fromhex("0588960d73d71901")


class OtsError(ValueError):
    pass


def varuint_encode(v: int) -> bytes:
    """LEB128 unsigned varint (the OTS wire integer)."""
    if v == 0:
        return b"\x00"
    out = bytearray()
    while v:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
    return bytes(out)


def varuint_decode(data: bytes, off: int) -> tuple[int, int]:
    v, shift = 0, 0
    while True:
        if off >= len(data):
            raise OtsError("truncated varuint")
        b = data[off]
        off += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, off
        shift += 7


def _varbytes(b: bytes) -> bytes:
    return varuint_encode(len(b)) + b


def _read_varbytes(data: bytes, off: int) -> tuple[bytes, int]:
    n, off = varuint_decode(data, off)
    if off + n > len(data):
        raise OtsError("truncated varbytes")
    return data[off : off + n], off + n


def _attestation_bytes(att: tuple) -> bytes:
    """('pending', uri) | ('bitcoin', height) → TAG + varbytes(payload)."""
    kind, val = att
    if kind == "pending":
        return ATT_PENDING + _varbytes(_varbytes(str(val).encode("utf-8")))
    if kind == "bitcoin":
        return ATT_BITCOIN + _varbytes(varuint_encode(int(val)))
    raise OtsError(f"unknown attestation kind {kind!r}")


def _timestamp_bytes(node: dict) -> bytes:
    """Serialize a timestamp tree node {'attestations': [...], 'ops':
    [(op_tag, arg_or_None, child_node), ...]} — the OTS rule: every entry
    except the last is prefixed with the 0xff fork marker; attestations are
    introduced by 0x00, ops by their tag."""
    atts = [("\x00", _attestation_bytes(a)) for a in sorted(node.get("attestations", []))]
    ops = []
    for tag, arg, child in node.get("ops", []):
        enc = bytes([tag]) + (_varbytes(arg) if arg is not None else b"")
        ops.append((None, enc + _timestamp_bytes(child)))
    entries = atts + ops
    if not entries:
        raise OtsError("empty timestamp node")
    out = bytearray()
    for i, (is_att, payload) in enumerate(entries):
        if i < len(entries) - 1:
            out.append(TAG_FORK)
        if is_att is not None:
            out.append(TAG_ATTESTATION)
        out += payload
    return bytes(out)


def ots_build(digest: bytes, calendars: list[str], bitcoin_height: int | None = None) -> bytes:
    """DetachedTimestampFile for a sha256 ``digest``: per calendar the
    canonical submit shape (append 16-byte nonce → sha256 → pending
    attestation at that uri); optionally one upgraded Bitcoin attestation
    on the root (the post-upgrade proof shape). Nonces are derived
    deterministically (sha256 of digest+uri) so the artifact is
    reproducible — a real calendar uses random nonces; byte layout is
    identical."""
    root: dict = {"attestations": [], "ops": []}
    if bitcoin_height is not None:
        root["attestations"].append(("bitcoin", bitcoin_height))
    for uri in calendars:
        nonce = hashlib.sha256(digest + uri.encode("utf-8")).digest()[:16]
        leaf = {"attestations": [("pending", uri)], "ops": []}
        sha_node = {"attestations": [], "ops": [(TAG_OP_SHA256, None, leaf)]}
        root["ops"].append((TAG_OP_APPEND, nonce, sha_node))
    return (
        HEADER_MAGIC
        + varuint_encode(MAJOR_VERSION)
        + bytes([TAG_OP_SHA256])
        + digest
        + _timestamp_bytes(root)
    )


def _apply_op(tag: int, arg: bytes | None, msg: bytes) -> bytes:
    if tag == TAG_OP_SHA256:
        return hashlib.sha256(msg).digest()
    if tag == TAG_OP_SHA1:
        return hashlib.sha1(msg).digest()
    if tag == TAG_OP_RIPEMD160:
        return hashlib.new("ripemd160", msg).digest()
    if tag == TAG_OP_APPEND:
        return msg + arg
    if tag == TAG_OP_PREPEND:
        return arg + msg
    raise OtsError(f"unknown op tag {tag:#x}")


def _parse_attestation(data: bytes, off: int) -> tuple[tuple, int]:
    tag = data[off : off + 8]
    off += 8
    payload, off = _read_varbytes(data, off)
    if tag == ATT_PENDING:
        uri, _ = _read_varbytes(payload, 0)
        return ("pending", uri.decode("utf-8", "replace")), off
    if tag == ATT_BITCOIN:
        height, _ = varuint_decode(payload, 0)
        return ("bitcoin", height), off
    return ("unknown", tag.hex()), off


def _parse_timestamp(data: bytes, off: int, msg: bytes, out: list) -> int:
    """Iterative tree walk mirroring serialization; appends
    (attested_msg, attestation) to ``out`` — the ``all_attestations``
    equivalent the reference iterates (opentimestamps_enricher.py:140).

    Explicit work-stack, NOT recursion: an adversarial proof with a few
    thousand chained ops must yield a decode_error row, never a
    RecursionError task failure. Depth is still bounded (proof bytes can't
    encode more frames than bytes) so no separate cap is needed."""
    # Each stack frame is the message at that tree position; a frame is
    # pushed for the continuation of a fork and popped when a subtree ends
    # (its last non-forked op chain reaches an attestation).
    stack: list[bytes] = []
    while True:
        if off >= len(data):
            raise OtsError("truncated timestamp")
        tag = data[off]
        off += 1
        forked = tag == TAG_FORK
        if forked:
            tag = data[off]
            off += 1
            stack.append(msg)  # resume the sibling branch with this msg
        if tag == TAG_ATTESTATION:
            att, off = _parse_attestation(data, off)
            out.append((msg, att))
            # subtree done: resume the innermost pending fork sibling
            if not stack:
                return off
            msg = stack.pop()
        else:
            arg = None
            if tag in (TAG_OP_APPEND, TAG_OP_PREPEND):
                arg, off = _read_varbytes(data, off)
            msg = _apply_op(tag, arg, msg)


def ots_parse(data: bytes) -> dict:
    """Parse a detached proof: the stamped digest, every attestation with
    the digest the op chain actually attests, and the reference's
    verification summary (attestation_count / statuses / ``verified`` iff
    any Bitcoin attestation — opentimestamps_enricher.py:147-169)."""
    if data[: len(HEADER_MAGIC)] != HEADER_MAGIC:
        raise OtsError("bad OTS magic")
    off = len(HEADER_MAGIC)
    version, off = varuint_decode(data, off)
    if version != MAJOR_VERSION:
        raise OtsError(f"unsupported version {version}")
    op = data[off]
    off += 1
    if op != TAG_OP_SHA256:
        raise OtsError(f"unsupported file hash op {op:#x}")
    digest = data[off : off + 32]
    off += 32
    attestations: list = []
    _parse_timestamp(data, off, digest, attestations)
    pend = [a for _m, a in attestations if a[0] == "pending"]
    btc = [a for _m, a in attestations if a[0] == "bitcoin"]
    return {
        "digest": digest.hex(),
        "attestation_count": len(attestations),
        "pending_uris": sorted(u for _k, u in pend),
        "bitcoin_heights": sorted(h for _k, h in btc),
        "verified": len(btc) > 0,
        "attested_digests": [m.hex() for m, _a in attestations],
    }
