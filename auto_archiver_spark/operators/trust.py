"""F17/F18 — Spark-side trust-artifact operators: certificate parsing,
RFC 3161 timestamp-request building and timestamp-response parsing.

Reference behavior (network transports declared external, kernels in
``functions/asn1.py``):

* ``modules/ssl_enricher/ssl_enricher.py:16-31`` — per archived https URL,
  the host's certificate is stored as ``{slugify(domain)}.pem``;
* ``modules/timestamping_enricher/timestamping_enricher.py:52-107`` — the
  newline-joined media hashes are POSTed as a nonce'd TSQ per TSA, the TSR
  decoded and its cert chain saved leaf→root.

Design notes (100 TB): certificates and timestamp tokens are per-*host* /
per-*wave* artifacts — thousands of rows where the fetch table has billions
— so the Arrow-batched Python parse is nowhere near the hot path. The TSQ
build, which IS per archived row-group, stays entirely in Catalyst: for the
enricher's fixed shape (sha256 imprint + 8-byte nonce + certReq) the DER is
a constant-skeleton hex template around ``sha2()`` — zero Python, one
projection, whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# TimeStampReq DER skeleton for the enricher's fixed request shape
# (RFC 3161 §2.4.1): version=1, sha256 AlgorithmIdentifier, 32-byte imprint,
# 8-byte nonce, certReq=TRUE. All lengths are fixed, so the encoding is a
# hex-literal template — byte-identical to functions.asn1.tsq_build (pinned
# by tests/test_asn1.py).
_TSQ_PREFIX = "3043020101" + "3031300d060960864801650304020105000420"
_TSQ_NONCE_TAG = "0208"
_TSQ_SUFFIX = "0101ff"


def normalize_nonce(nonce: Column) -> Column:
    """Map an arbitrary long into [2^62, 2^63): always eight DER content
    bytes with the sign bit clear, so the INTEGER encoding length is fixed
    and the Catalyst template applies to every row."""
    return nonce.bitwiseAND(F.lit(0x3FFFFFFFFFFFFFFF)).bitwiseOR(F.lit(0x4000000000000000))


def tsq_hex_expr(data: Column, nonce: Column) -> Column:
    """TimeStampReq DER (lowercase hex) for ``data`` with ``nonce`` — native
    Catalyst, no UDF. ``nonce`` must already be normalized."""
    return F.concat(
        F.lit(_TSQ_PREFIX),
        F.sha2(data, 256),
        F.lit(_TSQ_NONCE_TAG),
        F.lower(F.lpad(F.hex(nonce), 16, "0")),
        F.lit(_TSQ_SUFFIX),
    )


def hashes_document_expr(hashes: Column) -> Column:
    """The exact string the reference timestamps: per-media hash values with
    their ``SHA-256:`` / ``SHA3-512:`` algorithm prefixes stripped,
    newline-joined (timestamping_enricher.py:56-66); null/empty entries
    dropped like the reference's falsy filter."""
    cleaned = F.transform(
        F.filter(hashes, lambda h: h.isNotNull() & (h != "")),
        lambda h: F.replace(F.replace(h, F.lit("SHA-256:"), F.lit("")), F.lit("SHA3-512:"), F.lit("")),
    )
    return F.array_join(cleaned, "\n")


def timestamp_requests(
    df: DataFrame, hashes_col: str = "hashes", nonce_col: str = "nonce"
) -> DataFrame:
    """Per row: the timestamped document + its byte-exact TSQ (hex). One
    whole-stage-codegen projection."""
    doc = hashes_document_expr(F.col(hashes_col))
    nonce = normalize_nonce(F.col(nonce_col))
    return df.withColumn("ts_document", doc).withColumn(
        "tsq_hex", tsq_hex_expr(F.col("ts_document"), nonce)
    )


_CERT_SCHEMA = StructType(
    [
        StructField("serial", StringType()),
        StructField("subject_cn", StringType()),
        StructField("issuer_cn", StringType()),
        StructField("not_before", LongType()),
        StructField("not_after", LongType()),
        StructField("san_dns", StringType()),
        StructField("fingerprint_sha256", StringType()),
        StructField("cert_err", StringType()),
    ]
)


def parse_certificates(
    df: DataFrame, cert_col: str = "cert_pem", id_cols: list[str] | None = None
) -> DataFrame:
    """F18 parse half: per stored certificate (PEM string or DER bytes),
    the fields the archive records. Arrow-batched ``mapInPandas``; errors
    are coarse deterministic categories ('empty' / 'decode_error'), never
    exception text."""
    import pandas as pd  # noqa: PLC0415

    from ..functions.asn1 import DerError, pem_to_der, x509_parse  # noqa: PLC0415

    id_cols = id_cols or ["url_hash"]
    src = df.select(*id_cols, cert_col)
    out_schema = StructType(
        [src.schema[c] for c in id_cols] + list(_CERT_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[cert_col]:
                if raw is None or (hasattr(raw, "__len__") and len(raw) == 0):
                    rows.append((None, None, None, None, None, None, None, "empty"))
                    continue
                try:
                    der = pem_to_der(raw) if isinstance(raw, str) else bytes(raw)
                    p = x509_parse(der)
                    rows.append(
                        (p["serial"], p["subject_cn"], p["issuer_cn"],
                         p["not_before"], p["not_after"], ",".join(p["san_dns"]),
                         p["fingerprint_sha256"], None)
                    )
                except (DerError, ValueError, IndexError, UnicodeDecodeError):
                    rows.append((None, None, None, None, None, None, None, "decode_error"))
            parsed = pd.DataFrame(
                rows, columns=[f.name for f in _CERT_SCHEMA.fields], index=pdf.index
            )
            yield pd.concat([pdf[id_cols], parsed], axis=1)

    return src.mapInPandas(run, schema=out_schema)


_OTS_SCHEMA = StructType(
    [
        StructField("ots_digest", StringType()),
        StructField("ots_attestations", IntegerType()),
        StructField("ots_pending_uris", StringType()),
        StructField("ots_btc_heights", StringType()),
        StructField("ots_verified", IntegerType()),
        StructField("ots_err", StringType()),
    ]
)


def parse_ots_proofs(
    df: DataFrame, ots_col: str = "ots_der", id_cols: list[str] | None = None
) -> DataFrame:
    """F17b parse half: per OpenTimestamps detached proof, the stamped
    digest and the reference's verification summary
    (opentimestamps_enricher.py:128-172 — attestation count, pending uris,
    bitcoin heights, ``verified`` iff any Bitcoin attestation). CSV-joined
    lists and int-typed verified keep the output gate-stable."""
    import pandas as pd  # noqa: PLC0415

    from ..functions.ots import OtsError, ots_parse  # noqa: PLC0415

    id_cols = id_cols or ["url_hash"]
    src = df.select(*id_cols, ots_col)
    out_schema = StructType([src.schema[c] for c in id_cols] + list(_OTS_SCHEMA.fields))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[ots_col]:
                if raw is None or len(raw) == 0:
                    rows.append((None, None, None, None, None, "empty"))
                    continue
                try:
                    p = ots_parse(bytes(raw))
                    rows.append(
                        (p["digest"], p["attestation_count"],
                         ",".join(p["pending_uris"]),
                         ",".join(str(h) for h in p["bitcoin_heights"]),
                         int(p["verified"]), None)
                    )
                except (OtsError, ValueError, IndexError):
                    rows.append((None, None, None, None, None, "decode_error"))
            parsed = pd.DataFrame(
                rows, columns=[f.name for f in _OTS_SCHEMA.fields], index=pdf.index
            )
            yield pd.concat([pdf[id_cols], parsed], axis=1)

    return src.mapInPandas(run, schema=out_schema)


_TSR_SCHEMA = StructType(
    [
        StructField("ts_status", IntegerType()),
        StructField("ts_granted", BooleanType()),
        StructField("ts_serial", StringType()),
        StructField("ts_gen_time", LongType()),
        StructField("ts_hash_alg", StringType()),
        StructField("ts_imprint", StringType()),
        StructField("ts_nonce", LongType()),
        StructField("ts_cert_chain", StringType()),
        StructField("ts_err", StringType()),
    ]
)


def parse_timestamp_responses(
    df: DataFrame, tsr_col: str = "tsr_der", id_cols: list[str] | None = None
) -> DataFrame:
    """F17 parse half: decode each TimeStampResp — grant status, TSTInfo
    fields, and the embedded certificate bag reordered leaf→root (subject
    CNs, '>'-joined; reference ``tst_certs`` ordering)."""
    import pandas as pd  # noqa: PLC0415

    from ..functions.asn1 import DerError, tsr_parse  # noqa: PLC0415

    id_cols = id_cols or ["url_hash"]
    src = df.select(*id_cols, tsr_col)
    out_schema = StructType(
        [src.schema[c] for c in id_cols] + list(_TSR_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[tsr_col]:
                if raw is None or len(raw) == 0:
                    rows.append((None, None, None, None, None, None, None, None, "empty"))
                    continue
                try:
                    r = tsr_parse(bytes(raw))
                    chain = ">".join(c["subject_cn"] for c in r["cert_chain"])
                    rows.append(
                        (r["status"], r["granted"], r["serial"], r["gen_time"],
                         r["hash_alg"], r["hashed_message"], r["nonce"], chain, None)
                    )
                except (DerError, ValueError, IndexError, UnicodeDecodeError):
                    rows.append((None, None, None, None, None, None, None, None, "decode_error"))
            parsed = pd.DataFrame(
                rows, columns=[f.name for f in _TSR_SCHEMA.fields], index=pdf.index
            )
            yield pd.concat([pdf[id_cols], parsed], axis=1)

    return src.mapInPandas(run, schema=out_schema)
