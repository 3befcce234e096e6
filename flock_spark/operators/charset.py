"""From-spec character-set detection + transcoding — the crawl-ingest step
every web corpus needs before tokenization: decide what encoding raw bytes
are in and transcode them to UTF-8. Implemented from the public specs with
zero codec-library calls in the decode path, and certified against
Python's REAL codecs (the encoders build the fixtures; every decode is
cross-checked against the stdlib decoder in tests and in the entry):

- UTF-8 validation/decode per RFC 3629: lead/continuation ranges, the
  C0/C1 overlong ban, the ED surrogate-range ban, the F4 upper-plane
  cap at U+10FFFF, truncation detection;
- UTF-16 LE/BE decode with surrogate-pair composition and unpaired-
  surrogate rejection;
- ISO-8859-1 (latin-1) byte-to-codepoint mapping;
- BOM sniffing (EF BB BF / FF FE / FE FF) and a BOM-less heuristic:
  strict UTF-8 first, then zero-byte parity for UTF-16 endianness,
  latin-1 as the fallback — the same ladder a crawl pipeline runs.

Reference parity: the reference ingests text payloads as raw bytes
(flock/src/datasource/); charset normalization is the step between raw
crawl bytes and every text operator in this repo.

Scale: per-object mapInPandas — single scan, no shuffle, O(payload)
memory; the detector reads at most the whole object once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flock_spark.catalog import spread, tbl
from flock_spark.registry import register
from flock_spark.staging import stage_once

STATS: dict[str, int] = {}


def _hit(key: str) -> None:
    STATS[key] = STATS.get(key, 0) + 1


def utf8_decode_strict(b: bytes) -> str:
    """RFC 3629 decode: rejects overlongs, surrogates, planes beyond
    U+10FFFF, bad continuations and truncation."""
    out: list[str] = []
    i = 0
    n = len(b)
    while i < n:
        c = b[i]
        if c < 0x80:
            out.append(chr(c))
            i += 1
            continue
        if 0xC2 <= c <= 0xDF:
            need, lo, hi, base = 1, 0x80, 0xBF, c & 0x1F
        elif c == 0xE0:
            need, lo, hi, base = 2, 0xA0, 0xBF, 0  # overlong guard
        elif c == 0xED:
            need, lo, hi, base = 2, 0x80, 0x9F, 0xD  # surrogate guard
        elif 0xE1 <= c <= 0xEF:
            need, lo, hi, base = 2, 0x80, 0xBF, c & 0x0F
        elif c == 0xF0:
            need, lo, hi, base = 3, 0x90, 0xBF, 0  # overlong guard
        elif 0xF1 <= c <= 0xF3:
            need, lo, hi, base = 3, 0x80, 0xBF, c & 0x07
        elif c == 0xF4:
            need, lo, hi, base = 3, 0x80, 0x8F, 4  # > U+10FFFF guard
        else:  # 0x80-0xC1 stray continuation / overlong lead, 0xF5-0xFF
            raise ValueError(f"utf-8: invalid lead byte {c:#x} at {i}")
        if i + need >= n:
            raise ValueError("utf-8: truncated sequence")
        cp = base
        first = True
        for k in range(1, need + 1):
            cb = b[i + k]
            lo_k, hi_k = (lo, hi) if first else (0x80, 0xBF)
            first = False
            if not lo_k <= cb <= hi_k:
                raise ValueError(
                    f"utf-8: bad continuation {cb:#x} at {i + k}"
                )
            cp = (cp << 6) | (cb & 0x3F)
        out.append(chr(cp))
        i += need + 1
    return "".join(out)


def utf16_decode(b: bytes, big_endian: bool) -> str:
    """UTF-16 decode with surrogate-pair composition; rejects odd lengths
    and unpaired surrogates."""
    if len(b) % 2:
        raise ValueError("utf-16: odd byte length")
    order = "big" if big_endian else "little"
    units = [
        int.from_bytes(b[i : i + 2], order) for i in range(0, len(b), 2)
    ]
    out: list[str] = []
    i = 0
    while i < len(units):
        u = units[i]
        if 0xD800 <= u <= 0xDBFF:
            if i + 1 >= len(units) or not 0xDC00 <= units[i + 1] <= 0xDFFF:
                raise ValueError("utf-16: unpaired high surrogate")
            cp = 0x10000 + ((u - 0xD800) << 10) + (units[i + 1] - 0xDC00)
            out.append(chr(cp))
            _hit("utf16:surrogate_pair")
            i += 2
            continue
        if 0xDC00 <= u <= 0xDFFF:
            raise ValueError("utf-16: unpaired low surrogate")
        out.append(chr(u))
        i += 1
    return "".join(out)


def latin1_decode(b: bytes) -> str:
    return "".join(chr(c) for c in b)


def sniff_and_decode(b: bytes) -> tuple[str, str]:
    """Detection ladder: BOMs, strict UTF-8, zero-byte parity for
    BOM-less UTF-16, latin-1 fallback. Returns (encoding_label, text)
    with the BOM stripped from the decoded text."""
    if b[:3] == b"\xef\xbb\xbf":
        _hit("detect:utf-8-bom")
        return "utf-8-bom", utf8_decode_strict(b[3:])
    if b[:2] == b"\xff\xfe":
        _hit("detect:utf-16le-bom")
        return "utf-16le-bom", utf16_decode(b[2:], big_endian=False)
    if b[:2] == b"\xfe\xff":
        _hit("detect:utf-16be-bom")
        return "utf-16be-bom", utf16_decode(b[2:], big_endian=True)
    try:
        text = utf8_decode_strict(b)
        _hit("detect:utf-8")
        return "utf-8", text
    except ValueError:
        pass
    if len(b) >= 2 and len(b) % 2 == 0:
        even_zeros = sum(1 for i in range(0, len(b), 2) if b[i] == 0)
        odd_zeros = sum(1 for i in range(1, len(b), 2) if b[i] == 0)
        pairs = len(b) // 2
        if even_zeros > pairs // 3 and even_zeros > 2 * odd_zeros:
            _hit("detect:utf-16be")
            return "utf-16be", utf16_decode(b, big_endian=True)
        if odd_zeros > pairs // 3 and odd_zeros > 2 * even_zeros:
            _hit("detect:utf-16le")
            return "utf-16le", utf16_decode(b, big_endian=False)
    _hit("detect:latin-1")
    return "latin-1", latin1_decode(b)


# non-BMP suffix: forces surrogate pairs in the UTF-16 variants and
# multi-byte sequences in UTF-8; the latin-1 variant gets a suffix whose
# trailing bytes (0xE9 0xA7) form a TRUNCATED UTF-8 sequence, so strict
# UTF-8 deterministically rejects it and the ladder lands on latin-1
_SUFFIX = " \U0001F600§é"
_L1_SUFFIX = "é§"


@register(
    "text_charset_detect_transcode",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN 'utf-8-bom'
             WHEN 1 THEN 'utf-16le-bom'
             WHEN 2 THEN 'utf-16be'
             ELSE 'latin-1'
           END AS encoding,
           CAST(length(text) + CASE WHEN doc_id % 4 = 3 THEN 2 ELSE 4 END
                AS BIGINT) AS n_chars,
           CASE WHEN doc_id % 4 = 3
                THEN md5(text || 'é§')
                ELSE md5(text || ' 😀§é')
           END AS decoded_md5
    FROM documents
    WHERE text IS NOT NULL
    """,
    tags=("text", "pandas_udf", "codec"),
    doc="Charset detection + from-spec transcode — the crawl-ingest "
    "normalization step: each document's bytes are materialized IN the "
    "UDF by Python's REAL codecs in a doc-rotated encoding matrix "
    "(UTF-8 with BOM / UTF-16LE with BOM / BOM-less UTF-16BE / "
    "latin-1, each with a non-BMP suffix forcing surrogate pairs, or a "
    "truncated-UTF-8 tail forcing the latin-1 fallback), then detected "
    "and decoded by THIS module's from-spec ladder: BOM sniff, RFC "
    "3629 strict UTF-8 (overlong/surrogate/upper-plane/truncation "
    "guards), zero-byte-parity UTF-16 endianness heuristic, surrogate "
    "pair composition, latin-1 fallback. The decode must equal the "
    "stdlib codec's decode per doc (cross-checked in the UDF) and the "
    "per-doc facts must match the DuckDB view. Scale: per-object "
    "mapInPandas, single scan, no shuffle.",
)
def text_charset_detect_transcode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = (
        tbl(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_enc, out_n, out_md5 = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                v = int(doc_id) % 4
                if v == 0:
                    want = text + _SUFFIX
                    payload = b"\xef\xbb\xbf" + want.encode("utf-8")
                elif v == 1:
                    want = text + _SUFFIX
                    payload = b"\xff\xfe" + want.encode("utf-16-le")
                elif v == 2:
                    want = text + _SUFFIX
                    payload = want.encode("utf-16-be")
                else:
                    want = text + _L1_SUFFIX
                    payload = want.encode("latin-1")
                enc, decoded = sniff_and_decode(payload)
                if decoded != want:
                    raise ValueError(f"transcode mismatch for doc {doc_id}")
                out_doc.append(int(doc_id))
                out_enc.append(enc)
                out_n.append(len(decoded))
                out_md5.append(
                    hashlib.md5(decoded.encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "encoding": pd.Series(out_enc, dtype="object"),
                    "n_chars": pd.Series(out_n, dtype="int64"),
                    "decoded_md5": pd.Series(out_md5, dtype="object"),
                }
            )

    return spread(d).mapInPandas(
        run,
        schema="doc_id long, encoding string, n_chars long, "
        "decoded_md5 string",
    )


# ---------------------------------------------------------------------------
# Archive-ingest chain capstone: tar -> gzip member -> charset sniff ->
# transcode, every stage a from-spec implementation already certified
# individually — composed here into ONE verifiable pipeline, the shape of
# an archival text-dump ingest (tarballs of gzipped files in mixed
# encodings).
# ---------------------------------------------------------------------------


def _stage_archive_shards(spark: SparkSession, sf_dir: str) -> str:
    """Stage (once per sf_dir) 16 ustar shards; each member is a REAL gzip
    file (stdlib compressor, FNAME+FHCRC header, stdlib-stamped CRC) whose
    payload is the per-doc charset-matrix encoding of the text."""
    from flock_spark.operators.multimodal import gzip_member_build, tar_build

    def write_fixture(tmp: str) -> None:
        import os

        rows = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter("text IS NOT NULL")
            .selectExpr("doc_id", "text")
            .orderBy("doc_id")
            .collect()  # bounded: N_DOCS rows (5k at sf0.1)
        )
        shards: dict[int, list] = {k: [] for k in range(16)}
        for r in rows:
            v = r.doc_id % 4
            if v == 0:
                payload = b"\xef\xbb\xbf" + (r.text + _SUFFIX).encode("utf-8")
            elif v == 1:
                payload = b"\xff\xfe" + (
                    r.text + _SUFFIX).encode("utf-16-le")
            elif v == 2:
                payload = (r.text + _SUFFIX).encode("utf-16-be")
            else:
                payload = (r.text + _L1_SUFFIX).encode("latin-1")
            member = gzip_member_build(
                f"doc_{r.doc_id}.txt", 1700000000 + r.doc_id, payload
            )
            shards[r.doc_id % 16].append((f"doc_{r.doc_id}.txt.gz", member))
        for k, members in shards.items():
            with open(os.path.join(tmp, f"shard-{k}.tar"), "wb") as f:
                f.write(tar_build(members, mtime=1700000000))

    return stage_once(
        f"archive_chain_{sf_dir}", "v2-16shards-gz-charset", write_fixture
    )


@register(
    "archive_ingest_chain_end_to_end",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 4
             WHEN 0 THEN 'utf-8-bom'
             WHEN 1 THEN 'utf-16le-bom'
             WHEN 2 THEN 'utf-16be'
             ELSE 'latin-1'
           END AS encoding,
           CAST(length(text) + CASE WHEN doc_id % 4 = 3 THEN 2 ELSE 4 END
                AS BIGINT) AS n_chars,
           CASE WHEN doc_id % 4 = 3
                THEN md5(text || 'é§')
                ELSE md5(text || ' 😀§é')
           END AS decoded_md5
    FROM documents
    WHERE text IS NOT NULL
    """,
    tags=("text", "multimodal", "pandas_udf", "codec", "staged"),
    doc="Archive-ingest chain capstone — tarballs of gzipped mixed-"
    "charset text files, the classic dump-drop shape, decoded end to "
    "end by FOUR composed from-spec stages with zero library code: the "
    "POSIX ustar walk (header checksums, octal framing, 512-byte "
    "padding), the RFC 1952 gzip member parse (FLG bit walk, header "
    "CRC16, body through the repo's own RFC 1951 inflate, CRC32 + "
    "ISIZE trailer via the own CRC table against stdlib-stamped "
    "values), charset detection (BOM sniff / strict UTF-8 / zero-byte "
    "parity ladder) and from-spec transcode (RFC 3629, UTF-16 "
    "surrogate pairs, latin-1). Each stage was certified individually "
    "in earlier entries; this entry proves the COMPOSITION: per-doc "
    "facts from the fully decoded chain must match the DuckDB view. "
    "Member names cross-check doc ids (a misrouted payload fails "
    "loudly). Scale: 16 shard files -> 16 independent tasks, per-member "
    "decode memory, no shuffle — add shards to scale, same plan.",
)
def archive_ingest_chain_end_to_end(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from flock_spark.operators.multimodal import (
        gzip_member_parse_at,
        tar_member_walk,
    )

    path = _stage_archive_shards(spark, sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.tar")
        .load(path)
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_enc, out_n, out_md5 = [], [], [], []
            for content in pdf["content"]:
                for name, _size, _mtime, payload in tar_member_walk(
                    bytes(content)
                ):
                    if not (name.startswith("doc_")
                            and name.endswith(".txt.gz")):
                        raise ValueError(f"unexpected member {name}")
                    doc_id = int(name[4:-7])
                    fname, _gz_mtime, raw, end = gzip_member_parse_at(
                        payload, 0
                    )
                    if end != len(payload) or fname != f"doc_{doc_id}.txt":
                        raise ValueError(f"gzip member mismatch in {name}")
                    enc, decoded = sniff_and_decode(raw)
                    out_doc.append(doc_id)
                    out_enc.append(enc)
                    out_n.append(len(decoded))
                    out_md5.append(
                        hashlib.md5(decoded.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "encoding": pd.Series(out_enc, dtype="object"),
                    "n_chars": pd.Series(out_n, dtype="int64"),
                    "decoded_md5": pd.Series(out_md5, dtype="object"),
                }
            )

    return bf.mapInPandas(
        run,
        schema="doc_id long, encoding string, n_chars long, "
        "decoded_md5 string",
    )
