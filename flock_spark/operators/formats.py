"""Binary table-format introspection: a from-spec Apache Thrift compact
protocol reader and a parquet footer walk over the REAL testdata files.

Reference parity: the reference engine embeds a native parquet reader for its
scan layer (flock/src/datasource/ — arrow/parquet readers); Spark subsumes the
scan itself, so the from-scratch value here is the FORMAT layer: proving the
engine can walk the actual bytes of the footer (magic, Thrift compact
FileMetaData, row groups, column chunks, statistics) that every pushdown and
pruning decision at 100 TB is based on. The Thrift compact protocol and
parquet.thrift schema are public specifications (Apache Thrift spec;
apache/parquet-format parquet.thrift); this module implements them from
scratch — no thrift or pyarrow metadata API anywhere in the path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flock_spark.registry import register

# Thrift compact protocol type nibbles (public spec).
_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    """ULEB128 unsigned varint -> (value, next_pos)."""
    shift = 0
    out = 0
    while True:
        if pos >= len(data):
            raise ValueError("varint runs past end of buffer")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def thrift_read_value(data: bytes, pos: int, ctype: int):
    """Read one compact-protocol value of the given wire type."""
    if ctype in (_CT_TRUE, _CT_FALSE):
        # inside containers bools are one byte; as field values the type
        # nibble itself carries the value and no byte follows — container
        # reads call _read_container_bool instead, so this path is the
        # field-header case
        return ctype == _CT_TRUE, pos
    if ctype == _CT_BYTE:
        if pos >= len(data):
            raise ValueError("byte value past end")
        v = data[pos]
        return v - 256 if v > 127 else v, pos + 1
    if ctype in (_CT_I16, _CT_I32, _CT_I64):
        v, pos = _varint(data, pos)
        return _zigzag(v), pos
    if ctype == _CT_DOUBLE:
        import struct as _s

        return _s.unpack_from("<d", data, pos)[0], pos + 8
    if ctype == _CT_BINARY:
        n, pos = _varint(data, pos)
        if pos + n > len(data):
            raise ValueError("binary value past end")
        return bytes(data[pos : pos + n]), pos + n
    if ctype in (_CT_LIST, _CT_SET):
        return thrift_read_list(data, pos)
    if ctype == _CT_STRUCT:
        return thrift_read_struct(data, pos)
    if ctype == _CT_MAP:
        raise ValueError("map fields not used by parquet FileMetaData")
    raise ValueError(f"unknown compact type {ctype}")


def thrift_read_list(data: bytes, pos: int) -> tuple[list, int]:
    if pos >= len(data):
        raise ValueError("list header past end")
    b = data[pos]
    pos += 1
    size = b >> 4
    etype = b & 0x0F
    if size == 15:
        size, pos = _varint(data, pos)
    out = []
    for _ in range(size):
        if etype in (_CT_TRUE, _CT_FALSE):
            # container bools are serialized as one byte each
            out.append(data[pos] == _CT_TRUE)
            pos += 1
        else:
            v, pos = thrift_read_value(data, pos, etype)
            out.append(v)
    return out, pos


def thrift_read_struct(data: bytes, pos: int) -> tuple[dict[int, object], int]:
    """One struct as {field_id: value}; nested structs are dicts, lists are
    lists. Field ids come from the compact delta encoding."""
    fields: dict[int, object] = {}
    last_id = 0
    while True:
        if pos >= len(data):
            raise ValueError("struct runs past end of buffer (no STOP)")
        b = data[pos]
        pos += 1
        if b == _CT_STOP:
            return fields, pos
        delta = b >> 4
        ctype = b & 0x0F
        if delta:
            fid = last_id + delta
        else:
            raw, pos = _varint(data, pos)
            fid = _zigzag(raw)
        last_id = fid
        val, pos = thrift_read_value(data, pos, ctype)
        fields[fid] = val
    # unreachable


# parquet.thrift physical type and codec enums (public spec).
_PHYS = {0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96", 4: "FLOAT",
         5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY"}
_CODEC = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO", 4: "BROTLI",
          5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}


def parquet_footer_parse(content: bytes) -> dict:
    """Walk a real parquet file's footer from the spec: PAR1 magic head and
    tail, 4-byte LE footer length, Thrift compact FileMetaData. Returns
    {num_rows, created_by, schema: [(name, phys_type)], row_groups:
    [{num_rows, total_byte_size, columns: [...]}]} with per-chunk
    {path, codec, num_values, data_page_offset, total_compressed_size,
    stat_min, stat_max} (stats decoded by physical type).
    ValueError on any structural violation."""
    if content[:4] != b"PAR1" or content[-4:] != b"PAR1":
        raise ValueError("missing PAR1 magic")
    flen = int.from_bytes(content[-8:-4], "little")
    if flen + 8 > len(content):
        raise ValueError("footer length exceeds file")
    footer = content[len(content) - 8 - flen : len(content) - 8]
    meta, end = thrift_read_struct(footer, 0)
    if end != len(footer):
        raise ValueError(f"{len(footer) - end} trailing bytes after footer struct")
    num_rows = meta.get(3)
    schema_elems = meta.get(2) or []
    if not schema_elems:
        raise ValueError("no schema elements")
    root = schema_elems[0]
    leaves = schema_elems[1:]
    if root.get(5) != len(leaves):
        raise ValueError("root num_children disagrees with schema list")
    schema = []
    for el in leaves:
        name = el.get(4)
        schema.append((name.decode("utf-8"), _PHYS.get(el.get(1), "?")))
    row_groups = []
    for rg in meta.get(4) or []:
        chunks = []
        for cc in rg.get(1) or []:
            md = cc.get(3)
            if md is None:
                raise ValueError("column chunk without metadata")
            phys = _PHYS.get(md.get(1), "?")
            path = ".".join(p.decode("utf-8") for p in md.get(3) or [])
            stats = md.get(12) or {}
            raw_min = stats.get(6, stats.get(2))
            raw_max = stats.get(5, stats.get(1))

            def dec(b):
                if b is None:
                    return None
                if phys == "INT64":
                    return str(int.from_bytes(b, "little", signed=True))
                if phys == "INT32":
                    return str(int.from_bytes(b[:4], "little", signed=True))
                if phys == "BYTE_ARRAY":
                    return b.decode("utf-8")
                return b.hex()

            chunks.append(
                {
                    "path": path,
                    "phys": phys,
                    "codec": _CODEC.get(md.get(4), "?"),
                    "num_values": md.get(5),
                    "total_compressed_size": md.get(7),
                    "data_page_offset": md.get(9),
                    "stat_min": dec(raw_min),
                    "stat_max": dec(raw_max),
                }
            )
        row_groups.append(
            {
                "num_rows": rg.get(3),
                "total_byte_size": rg.get(2),
                "columns": chunks,
            }
        )
    if num_rows != sum(g["num_rows"] for g in row_groups):
        raise ValueError("FileMetaData num_rows disagrees with row groups")
    created = meta.get(6)
    return {
        "num_rows": num_rows,
        "created_by": created.decode("utf-8") if created else "",
        "schema": schema,
        "row_groups": row_groups,
    }


@register(
    "scan_parquet_footer_thrift_walk",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS column_id, 'doc_id' AS col_name,
           CAST(count(*) AS BIGINT) AS num_values, 'SNAPPY' AS codec,
           CAST(min(doc_id) AS VARCHAR) AS stat_min,
           CAST(max(doc_id) AS VARCHAR) AS stat_max
    FROM documents
    UNION ALL
    SELECT CAST(1 AS BIGINT), 'text', CAST(count(*) AS BIGINT), 'SNAPPY',
           min(text), max(text) FROM documents
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'lang', CAST(count(*) AS BIGINT), 'SNAPPY',
           min(lang), max(lang) FROM documents
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'source', CAST(count(*) AS BIGINT), 'SNAPPY',
           min(source), max(source) FROM documents
    UNION ALL
    SELECT CAST(4 AS BIGINT), 'n_chars', CAST(count(*) AS BIGINT), 'SNAPPY',
           CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
    FROM documents
    """,
    tags=("scan", "formats", "thrift", "pandas_udf"),
    doc="Parquet footer walk against the REAL testdata file, with a "
    "from-spec Apache Thrift compact-protocol reader (varint/zigzag "
    "field deltas, container headers, nested structs — no thrift or "
    "pyarrow metadata API anywhere): PAR1 magic head+tail, footer "
    "length, FileMetaData -> schema elements -> row groups -> column "
    "chunks -> per-chunk Statistics, cross-validating num_rows against "
    "the row-group sum and the schema leaf list against every chunk's "
    "path_in_schema. The emitted per-chunk num_values, codec and "
    "min/max statistics (decoded by physical type: INT64 little-endian, "
    "BYTE_ARRAY UTF-8) are certified against the DATA ITSELF — the "
    "oracle recomputes count/min/max per column in SQL, which is exactly "
    "the contract footer statistics promise. This is the format layer "
    "every pushdown decision trusts: at 100 TB, scan pruning reads "
    "ONLY these footer bytes (file tail ranges, distributable via "
    "binaryFile or range requests) to decide which of a million row "
    "groups to skip — a reader that mis-walks the footer prunes wrong "
    "and silently drops data.",
)
def scan_parquet_footer_thrift_walk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    bf = (
        spark.read.format("binaryFile")
        .load(f"{sf_dir}/documents.parquet")
        .select("path", "content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "column_id": [], "col_name": [], "num_values": [],
                "codec": [], "stat_min": [], "stat_max": [],
            }
            for _path, content in zip(pdf["path"], pdf["content"]):
                info = parquet_footer_parse(bytes(content))
                leaf_names = [n for n, _ in info["schema"]]
                # aggregate chunk stats across row groups per column so the
                # walk stays correct even if the file is ever rewritten with
                # multiple row groups
                agg: dict[str, dict] = {}
                total = 0
                for rg in info["row_groups"]:
                    if len(rg["columns"]) != len(leaf_names):
                        raise ValueError("row group chunk count != schema leaves")
                    for cc in rg["columns"]:
                        if cc["path"] not in leaf_names:
                            raise ValueError(
                                f"chunk path {cc['path']} not in schema"
                            )
                        if cc["num_values"] != rg["num_rows"]:
                            raise ValueError(
                                "flat column chunk num_values != row group rows"
                            )
                        a = agg.setdefault(
                            cc["path"],
                            {"n": 0, "codec": cc["codec"], "mn": None, "mx": None,
                             "phys": cc["phys"]},
                        )
                        a["n"] += cc["num_values"]
                        key = (
                            (lambda s: int(s))
                            if cc["phys"].startswith("INT")
                            else (lambda s: s)
                        )
                        if cc["stat_min"] is not None and (
                            a["mn"] is None or key(cc["stat_min"]) < key(a["mn"])
                        ):
                            a["mn"] = cc["stat_min"]
                        if cc["stat_max"] is not None and (
                            a["mx"] is None or key(cc["stat_max"]) > key(a["mx"])
                        ):
                            a["mx"] = cc["stat_max"]
                    total += rg["num_rows"]
                if total != info["num_rows"]:
                    raise ValueError("row group rows disagree with num_rows")
                for i, name in enumerate(leaf_names):
                    a = agg[name]
                    rows["column_id"].append(i)
                    rows["col_name"].append(name)
                    rows["num_values"].append(a["n"])
                    rows["codec"].append(a["codec"])
                    rows["stat_min"].append(a["mn"])
                    rows["stat_max"].append(a["mx"])
            yield pd.DataFrame(
                {
                    "column_id": pd.Series(rows["column_id"], dtype="int64"),
                    "col_name": pd.Series(rows["col_name"], dtype="object"),
                    "num_values": pd.Series(rows["num_values"], dtype="int64"),
                    "codec": pd.Series(rows["codec"], dtype="object"),
                    "stat_min": pd.Series(rows["stat_min"], dtype="object"),
                    "stat_max": pd.Series(rows["stat_max"], dtype="object"),
                }
            )

    return bf.mapInPandas(
        run,
        schema="column_id long, col_name string, num_values long, "
        "codec string, stat_min string, stat_max string",
    )


# ---------------------------------------------------------------------------
# Parquet PAGE decode: snappy + RLE/bit-packed hybrid + dictionary decode,
# all from the public specs (google/snappy format description,
# apache/parquet-format Encodings.md). Together with the footer walk above
# this is a complete from-scratch read path for the testdata's column
# layout: footer -> column chunk -> page headers (Thrift compact) ->
# snappy-compressed pages -> definition levels -> dictionary indices ->
# values.
# ---------------------------------------------------------------------------


def snappy_decompress(data: bytes) -> bytes:
    """Raw snappy block format: varint uncompressed length, then tagged
    elements — 2-bit tag type: 00 literal (length in tag or 1-4 trailing
    bytes), 01 copy with 11-bit offset, 10 copy with 2-byte offset,
    11 copy with 4-byte offset. Copies may overlap their own output
    (RLE-style), so the copy loop is byte-at-a-time on purpose."""
    n, pos = _varint(data, 0)
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > len(data):
                raise ValueError("snappy literal past end of input")
            out += data[pos : pos + ln]
            pos += ln
        else:
            if t == 1:
                ln = ((tag >> 2) & 7) + 4
                off = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif t == 2:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos : pos + 2], "little")
                pos += 2
            else:
                ln = (tag >> 2) + 1
                off = int.from_bytes(data[pos : pos + 4], "little")
                pos += 4
            if off == 0 or off > len(out):
                raise ValueError("snappy copy offset out of range")
            src = len(out) - off
            for k in range(ln):
                out.append(out[src + k])
    if len(out) != n:
        raise ValueError(
            f"snappy output length {len(out)} != declared {n}"
        )
    return bytes(out)


def rle_bp_decode(
    data: bytes, pos: int, bit_width: int, n: int
) -> tuple[list[int], int]:
    """Parquet RLE/bit-packed hybrid: varint header, LSB 1 -> bit-packed
    ((header>>1) groups of 8 values, LSB-first within bytes), LSB 0 -> RLE
    run ((header>>1) copies of a fixed-width little-endian value)."""
    out: list[int] = []
    wb = (bit_width + 7) // 8
    while len(out) < n:
        header, pos = _varint(data, pos)
        if header & 1:
            cnt = (header >> 1) * 8
            nbytes = cnt * bit_width // 8
            if pos + nbytes > len(data):
                raise ValueError("bit-packed run past end of buffer")
            acc = int.from_bytes(data[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << bit_width) - 1
            out.extend((acc >> (i * bit_width)) & mask for i in range(cnt))
        else:
            cnt = header >> 1
            if cnt == 0:
                raise ValueError("zero-length RLE run")
            v = int.from_bytes(data[pos : pos + wb], "little")
            pos += wb
            out.extend([v] * cnt)
    return out[:n], pos


def _plain_decode(raw: bytes, phys: str, n: int) -> list:
    """PLAIN encoding for the physical types the testdata uses."""
    import struct as _s

    if phys == "INT64":
        return list(_s.unpack_from(f"<{n}q", raw, 0))
    if phys == "INT32":
        return list(_s.unpack_from(f"<{n}i", raw, 0))
    if phys == "BYTE_ARRAY":
        out = []
        pos = 0
        for _ in range(n):
            ln = int.from_bytes(raw[pos : pos + 4], "little")
            pos += 4
            out.append(raw[pos : pos + ln].decode("utf-8"))
            pos += ln
        return out
    raise ValueError(f"PLAIN decode unsupported for {phys}")


def _gzip_page_decompress(raw: bytes) -> bytes:
    """Parquet GZIP codec: each page payload is one complete RFC 1952 gzip
    stream. Decoded by the repo's from-spec path — header FLG walk, RFC
    1951 inflate (stored/fixed/dynamic Huffman), CRC32 + ISIZE trailer
    checks — not zlib (multimodal.gzip_member_parse)."""
    from flock_spark.operators.multimodal import gzip_member_parse

    return gzip_member_parse(raw)[2]


def _page_decompress(codec: int, raw: bytes) -> bytes:
    """Dispatch one page payload through the repo's from-spec codecs."""
    if codec == 0:
        return raw
    if codec == 1:
        return snappy_decompress(raw)
    if codec == 2:
        return _gzip_page_decompress(raw)
    if codec == 6:
        from flock_spark.operators.zstd_codec import zstd_frame_decompress

        return zstd_frame_decompress(raw)
    if codec == 7:
        from flock_spark.operators.multimodal import lz4_block_decompress

        return lz4_block_decompress(raw)
    raise ValueError(f"unsupported codec {_CODEC.get(codec, codec)}")


def _read_column_chunk(
    content: bytes, md: dict, phys: str, optional: bool
) -> list:
    """Walk one column chunk's pages (dictionary page if present, then data
    pages until the chunk's num_values are consumed). Returns the chunk's
    values with None for nulls."""
    codec = md.get(4)
    if codec not in (0, 1, 2, 6, 7):
        raise ValueError(f"unsupported codec {_CODEC.get(codec, codec)}")
    n_total = md.get(5)
    pos = md.get(11, md.get(9))  # dictionary page first when present
    dictionary: list | None = None
    values: list = []
    while len(values) < n_total:
        ph, body = thrift_read_struct(content, pos)
        comp_size = ph[3]
        raw = content[body : body + comp_size]
        if ph[1] == 3:  # DATA_PAGE v2: levels uncompressed + length-known,
            # data section compressed separately (is_compressed flag)
            v2 = ph.get(8) or {}
            n_vals = v2[1]
            n_nulls = v2.get(2, 0)
            enc = v2.get(4)
            dl_len = v2.get(5, 0)
            rl_len = v2.get(6, 0)
            if rl_len:
                raise ValueError("repetition levels unsupported (flat schema)")
            levels = raw[:dl_len]
            data_sec = raw[dl_len:]
            if v2.get(7, True) and codec != 0:
                data_sec = _page_decompress(codec, data_sec)
            if len(data_sec) + dl_len != ph[2]:
                raise ValueError("v2 page uncompressed size mismatch")
            if optional and n_nulls:
                dls, _ = rle_bp_decode(levels, 0, 1, n_vals)
            else:
                dls = [1] * n_vals
            n_present = n_vals - n_nulls
            if enc == 5:  # DELTA_BINARY_PACKED
                if phys not in ("INT32", "INT64"):
                    raise ValueError("delta encoding on non-integer column")
                present, _ = delta_binary_packed_decode(data_sec)
                if len(present) != n_present:
                    raise ValueError("delta decode count mismatch")
            elif enc == 6:  # DELTA_LENGTH_BYTE_ARRAY
                if phys != "BYTE_ARRAY":
                    raise ValueError("delta-length on non-byte-array column")
                present, _ = delta_length_byte_array_decode(
                    data_sec, n_present
                )
            elif enc == 7:  # DELTA_BYTE_ARRAY (front-coded strings)
                if phys != "BYTE_ARRAY":
                    raise ValueError("delta-byte-array on non-byte-array column")
                present, _ = delta_byte_array_decode(data_sec, n_present)
            elif enc == 0:
                present = _plain_decode(data_sec, phys, n_present)
            else:
                raise ValueError(f"unsupported v2 data encoding {enc}")
            it = iter(present)
            values.extend(next(it) if d else None for d in dls)
            pos = body + comp_size
            continue
        if codec == 1:
            raw = snappy_decompress(raw)
        elif codec == 2:
            raw = _gzip_page_decompress(raw)
        elif codec == 6:  # ZSTD: the page payload is one complete frame
            from flock_spark.operators.zstd_codec import zstd_frame_decompress

            raw = zstd_frame_decompress(raw)
        elif codec == 7:  # LZ4_RAW: the page payload is one raw LZ4 block
            from flock_spark.operators.multimodal import lz4_block_decompress

            raw = lz4_block_decompress(raw)
        if len(raw) != ph[2]:
            raise ValueError("page uncompressed size mismatch")
        if ph[1] == 2:  # DICTIONARY_PAGE
            dph = ph.get(7) or {}
            dictionary = _plain_decode(raw, phys, dph.get(1))
        elif ph[1] == 0:  # DATA_PAGE v1
            dph = ph.get(5) or {}
            n_vals = dph.get(1)
            enc = dph.get(2)
            p = 0
            if optional:
                dl_len = int.from_bytes(raw[:4], "little")
                p = 4
                dls, _ = rle_bp_decode(raw, p, 1, n_vals)
                p += dl_len
            else:
                dls = [1] * n_vals
            n_present = sum(dls)
            if enc in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
                if dictionary is None:
                    raise ValueError("dictionary-encoded page before dictionary")
                bw = raw[p]
                p += 1
                idx, _ = rle_bp_decode(raw, p, bw, n_present)
                if any(i >= len(dictionary) for i in idx):
                    raise ValueError("dictionary index out of range")
                present = [dictionary[i] for i in idx]
            elif enc == 0:  # PLAIN (or dictionary-overflow fallback)
                present = _plain_decode(raw[p:], phys, n_present)
            else:
                raise ValueError(f"unsupported data page encoding {enc}")
            it = iter(present)
            values.extend(next(it) if d else None for d in dls)
        else:
            raise ValueError(f"unexpected page type {ph[1]}")
        pos = body + comp_size
    if len(values) != n_total:
        raise ValueError("page walk produced wrong value count")
    return values


def parquet_column_read(content: bytes, col_index: int) -> list:
    """Read one column of a parquet file end to end from the raw bytes:
    footer -> per-row-group chunk offsets -> page walk per chunk
    (Thrift compact PageHeader, snappy or uncompressed payload, definition
    levels for optional fields, PLAIN / PLAIN_DICTIONARY / RLE_DICTIONARY
    values). Returns the column in file order as a Python list with None
    for nulls; multi-row-group files concatenate chunk values in row-group
    order, which IS file order."""
    if content[:4] != b"PAR1" or content[-4:] != b"PAR1":
        raise ValueError("missing PAR1 magic")
    flen = int.from_bytes(content[-8:-4], "little")
    meta, _ = thrift_read_struct(content[len(content) - 8 - flen : -8], 0)
    schema_leaves = (meta.get(2) or [])[1:]
    groups = meta.get(4) or []
    if not groups:
        raise ValueError("file has no row groups")
    phys = _PHYS.get(schema_leaves[col_index].get(1), "?")
    optional = schema_leaves[col_index].get(3) == 1
    values: list = []
    for rg in groups:
        md = rg[1][col_index][3]
        values.extend(_read_column_chunk(content, md, phys, optional))
    if len(values) != meta.get(3):
        raise ValueError("column walk disagrees with FileMetaData num_rows")
    return values


@register(
    "scan_parquet_page_decode",
    oracle="""
    SELECT 'doc_id' AS col_name,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(0 AS BIGINT) AS n_nulls,
           CAST(min(doc_id) AS BIGINT) AS min_v,
           CAST(max(doc_id) AS BIGINT) AS max_v,
           CAST(sum(doc_id) AS BIGINT) AS sum_v,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS values_md5
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
           CAST(min(n_chars) AS BIGINT), CAST(max(n_chars) AS BIGINT),
           CAST(sum(n_chars) AS BIGINT),
           md5(string_agg(CAST(n_chars AS VARCHAR), ',' ORDER BY doc_id))
    FROM documents
    """,
    tags=("scan", "formats", "codec", "pandas_udf"),
    doc="Complete from-scratch parquet COLUMN read of the real testdata "
    "bytes — the layer below scan_parquet_footer_thrift_walk: footer -> "
    "chunk offsets -> per-page Thrift compact PageHeaders -> from-spec "
    "SNAPPY decompression (tagged literal/copy format with overlap-safe "
    "copies) -> definition levels -> RLE/bit-packed hybrid dictionary "
    "indices -> values (PLAIN dictionary-overflow fallback supported). "
    "The decoded doc_id and n_chars columns are certified VALUE BY VALUE: "
    "count, null count, min/max/sum, and the md5 of the full column in "
    "file order, each re-derived by the oracle from the documents view "
    "(file order is doc_id order, which the md5 would expose if it ever "
    "stopped being true). Scale: this is the per-file inner loop of any "
    "custom columnar reader — one task per file via binaryFile, "
    "dictionary + pages stream through O(page) memory, no shuffle; Spark "
    "itself subsumes this path in production, and the entry proves the "
    "engine understands every byte of the format it trusts.",
)
def scan_parquet_page_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = (
        spark.read.format("binaryFile")
        .load(f"{sf_dir}/documents.parquet")
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "col_name": [], "n_values": [], "n_nulls": [], "min_v": [],
                "max_v": [], "sum_v": [], "values_md5": [],
            }
            for content in pdf["content"]:
                content = bytes(content)
                info = parquet_footer_parse(content)
                names = [n for n, _ in info["schema"]]
                for col in ("doc_id", "n_chars"):
                    vals = parquet_column_read(content, names.index(col))
                    present = [v for v in vals if v is not None]
                    rows["col_name"].append(col)
                    rows["n_values"].append(len(vals))
                    rows["n_nulls"].append(len(vals) - len(present))
                    rows["min_v"].append(min(present))
                    rows["max_v"].append(max(present))
                    rows["sum_v"].append(sum(present))
                    rows["values_md5"].append(
                        hashlib.md5(
                            ",".join(str(v) for v in present).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "col_name": pd.Series(rows["col_name"], dtype="object"),
                    "n_values": pd.Series(rows["n_values"], dtype="int64"),
                    "n_nulls": pd.Series(rows["n_nulls"], dtype="int64"),
                    "min_v": pd.Series(rows["min_v"], dtype="int64"),
                    "max_v": pd.Series(rows["max_v"], dtype="int64"),
                    "sum_v": pd.Series(rows["sum_v"], dtype="int64"),
                    "values_md5": pd.Series(rows["values_md5"], dtype="object"),
                }
            )

    return bf.mapInPandas(
        run,
        schema="col_name string, n_values long, n_nulls long, min_v long, "
        "max_v long, sum_v long, values_md5 string",
    )


# ---------------------------------------------------------------------------
# GZIP-compressed page path: the wild-corpus variant of the page decode
# ---------------------------------------------------------------------------


def _stage_parquet_codec(sf_dir: str, codec: str) -> str:
    """Materialize (once per sf_dir and codec) a compressed-page parquet
    fixture: the documents table's doc_id/n_chars columns, doc_id-sorted,
    written by pyarrow with the given codec, a small data-page size
    (multiple pages per chunk) and a bounded row-group size (multiple row
    groups) — the layout shape of real-world archival parquet."""
    from flock_spark.staging import stage_once

    def write_fixture(tmp: str) -> None:
        import os

        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        ).sort_by("doc_id")
        pq.write_table(
            t,
            os.path.join(tmp, f"documents_{codec}.parquet"),
            compression=codec,
            data_page_size=2048,
            row_group_size=max(64, t.num_rows // 4),
            data_page_version="1.0",
        )

    return stage_once(
        f"parquet_{codec}_{sf_dir}", f"v1-{codec}-dp2048-rg4", write_fixture
    )


def _stage_parquet_gzip(sf_dir: str) -> str:
    return _stage_parquet_codec(sf_dir, "gzip")


@register(
    "scan_parquet_gzip_page_decode",
    oracle="""
    SELECT 'doc_id' AS col_name,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(0 AS BIGINT) AS n_nulls,
           CAST(min(doc_id) AS BIGINT) AS min_v,
           CAST(max(doc_id) AS BIGINT) AS max_v,
           CAST(sum(doc_id) AS BIGINT) AS sum_v,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS values_md5
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
           CAST(min(n_chars) AS BIGINT), CAST(max(n_chars) AS BIGINT),
           CAST(sum(n_chars) AS BIGINT),
           md5(string_agg(CAST(n_chars AS VARCHAR), ',' ORDER BY doc_id))
    FROM documents
    """,
    tags=("scan", "formats", "codec", "pandas_udf", "staged"),
    doc="From-scratch parquet COLUMN read over GZIP-COMPRESSED pages — the "
    "wild-corpus variant of scan_parquet_page_decode (real archival "
    "parquet is routinely GZIP/ZSTD-paged): the documents doc_id/n_chars "
    "columns are staged once per sf_dir as a pyarrow-written gzip-page "
    "file (small data pages -> several pages per chunk, bounded row "
    "groups -> several chunks), and the entry walks the REAL staged "
    "bytes: footer Thrift walk -> per-page Thrift PageHeaders -> each "
    "page payload a complete RFC 1952 gzip stream decoded by the repo's "
    "own header walk + RFC 1951 inflate (stored/fixed/dynamic Huffman) "
    "with CRC32 + ISIZE trailer checks — composing the round-9 DEFLATE "
    "decoder with the round-10 parquet reader, zero zlib in the path. "
    "Columns are certified VALUE BY VALUE (count/min/max/sum + md5 of "
    "the full column in file order) against the documents view, which "
    "also proves the staged file's row order. Scale: identical to the "
    "snappy-page entry — one task per file via binaryFile, O(page) "
    "memory, no shuffle.",
)
def scan_parquet_gzip_page_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_parquet_gzip(sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .load(f"{path}/documents_gzip.parquet")
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "col_name": [], "n_values": [], "n_nulls": [], "min_v": [],
                "max_v": [], "sum_v": [], "values_md5": [],
            }
            for content in pdf["content"]:
                content = bytes(content)
                info = parquet_footer_parse(content)
                names = [n for n, _ in info["schema"]]
                # certify the fixture really is gzip-paged, not silently
                # uncompressed: every chunk must declare codec 2
                codecs = {
                    c["codec"]
                    for rg in info["row_groups"]
                    for c in rg["columns"]
                }
                if codecs != {"GZIP"}:
                    raise ValueError(f"fixture not gzip-paged: {codecs}")
                for col in ("doc_id", "n_chars"):
                    vals = parquet_column_read(content, names.index(col))
                    present = [v for v in vals if v is not None]
                    rows["col_name"].append(col)
                    rows["n_values"].append(len(vals))
                    rows["n_nulls"].append(len(vals) - len(present))
                    rows["min_v"].append(min(present))
                    rows["max_v"].append(max(present))
                    rows["sum_v"].append(sum(present))
                    rows["values_md5"].append(
                        hashlib.md5(
                            ",".join(str(v) for v in present).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "col_name": pd.Series(rows["col_name"], dtype="object"),
                    "n_values": pd.Series(rows["n_values"], dtype="int64"),
                    "n_nulls": pd.Series(rows["n_nulls"], dtype="int64"),
                    "min_v": pd.Series(rows["min_v"], dtype="int64"),
                    "max_v": pd.Series(rows["max_v"], dtype="int64"),
                    "sum_v": pd.Series(rows["sum_v"], dtype="int64"),
                    "values_md5": pd.Series(rows["values_md5"], dtype="object"),
                }
            )

    return bf.mapInPandas(
        run,
        schema="col_name string, n_values long, n_nulls long, min_v long, "
        "max_v long, sum_v long, values_md5 string",
    )


@register(
    "scan_parquet_lz4_page_decode",
    oracle="""
    SELECT 'doc_id' AS col_name,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(0 AS BIGINT) AS n_nulls,
           CAST(min(doc_id) AS BIGINT) AS min_v,
           CAST(max(doc_id) AS BIGINT) AS max_v,
           CAST(sum(doc_id) AS BIGINT) AS sum_v,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS values_md5
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
           CAST(min(n_chars) AS BIGINT), CAST(max(n_chars) AS BIGINT),
           CAST(sum(n_chars) AS BIGINT),
           md5(string_agg(CAST(n_chars AS VARCHAR), ',' ORDER BY doc_id))
    FROM documents
    """,
    tags=("scan", "formats", "codec", "pandas_udf", "staged"),
    doc="From-scratch parquet COLUMN read over LZ4_RAW pages — the third "
    "page codec after SNAPPY and GZIP, and the cross-implementation "
    "certification of the repo's LZ4 decoder: the staged fixture is "
    "compressed by the REAL pyarrow (C++ lz4) encoder and every page "
    "decodes through lz4_block_decompress (from the public block-format "
    "spec — token nibbles, 255-extension lengths, overlap-legal match "
    "copies), so any disagreement between our reading of the spec and "
    "the reference implementation's writing of it mismatches here. "
    "Columns certified VALUE BY VALUE (count/min/max/sum + md5 of the "
    "full column in file order) against the documents view. Scale: one "
    "task per file via binaryFile, O(page) memory, no shuffle — the "
    "codec-sibling plan family.",
)
def scan_parquet_lz4_page_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_parquet_codec(sf_dir, "lz4")
    bf = (
        spark.read.format("binaryFile")
        .load(f"{path}/documents_lz4.parquet")
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "col_name": [], "n_values": [], "n_nulls": [], "min_v": [],
                "max_v": [], "sum_v": [], "values_md5": [],
            }
            for content in pdf["content"]:
                content = bytes(content)
                info = parquet_footer_parse(content)
                names = [n for n, _ in info["schema"]]
                codecs = {
                    c["codec"]
                    for rg in info["row_groups"]
                    for c in rg["columns"]
                }
                if codecs != {"LZ4_RAW"}:
                    raise ValueError(f"fixture not lz4-paged: {codecs}")
                for col in ("doc_id", "n_chars"):
                    vals = parquet_column_read(content, names.index(col))
                    present = [v for v in vals if v is not None]
                    rows["col_name"].append(col)
                    rows["n_values"].append(len(vals))
                    rows["n_nulls"].append(len(vals) - len(present))
                    rows["min_v"].append(min(present))
                    rows["max_v"].append(max(present))
                    rows["sum_v"].append(sum(present))
                    rows["values_md5"].append(
                        hashlib.md5(
                            ",".join(str(v) for v in present).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "col_name": pd.Series(rows["col_name"], dtype="object"),
                    "n_values": pd.Series(rows["n_values"], dtype="int64"),
                    "n_nulls": pd.Series(rows["n_nulls"], dtype="int64"),
                    "min_v": pd.Series(rows["min_v"], dtype="int64"),
                    "max_v": pd.Series(rows["max_v"], dtype="int64"),
                    "sum_v": pd.Series(rows["sum_v"], dtype="int64"),
                    "values_md5": pd.Series(rows["values_md5"], dtype="object"),
                }
            )

    return bf.mapInPandas(
        run,
        schema="col_name string, n_values long, n_nulls long, min_v long, "
        "max_v long, sum_v long, values_md5 string",
    )


# ---------------------------------------------------------------------------
# RFC 4180 CSV: a from-spec byte parser over a staged file whose fields
# embed every hazard (commas, doubled quotes, CRLF inside quotes).
# ---------------------------------------------------------------------------


def csv_rfc4180_parse(data: bytes) -> list[list[str]]:
    """Parse RFC 4180 CSV bytes with the explicit state machine: quoted
    fields may contain commas, CRLFs and doubled quotes; a quote inside an
    unquoted field or a bare quote inside a quoted field (not doubled, not
    terminal) is a framing error. Returns rows of unescaped fields;
    ValueError on any violation."""
    rows: list[list[str]] = []
    field = bytearray()
    row: list[str] = []
    i, n = 0, len(data)
    in_quotes = False
    field_was_quoted = False

    def end_field() -> None:
        nonlocal field, field_was_quoted
        row.append(field.decode("utf-8"))
        field = bytearray()
        field_was_quoted = False

    while i < n:
        b = data[i]
        if in_quotes:
            if b == 0x22:  # '"'
                if i + 1 < n and data[i + 1] == 0x22:
                    field.append(0x22)
                    i += 2
                    continue
                in_quotes = False
                i += 1
                if i < n and data[i] not in (0x2C, 0x0D, 0x0A):
                    raise ValueError(
                        f"garbage after closing quote at offset {i}"
                    )
                continue
            field.append(b)
            i += 1
            continue
        if b == 0x22:
            if field or field_was_quoted:
                raise ValueError(f"quote inside unquoted field at offset {i}")
            in_quotes = True
            field_was_quoted = True
            i += 1
            continue
        if b == 0x2C:  # ','
            end_field()
            i += 1
            continue
        if b == 0x0D:  # CR: must be CRLF
            if i + 1 >= n or data[i + 1] != 0x0A:
                raise ValueError(f"bare CR at offset {i}")
            end_field()
            rows.append(row)
            row = []
            i += 2
            continue
        if b == 0x0A:  # tolerate bare LF line ends (common in the wild)
            end_field()
            rows.append(row)
            row = []
            i += 1
            continue
        field.append(b)
        i += 1
    if in_quotes:
        raise ValueError("EOF inside quoted field")
    if field or row:
        end_field()
        rows.append(row)
    return rows


def csv_rfc4180_write_field(s: str) -> str:
    """Quote a field iff it needs it; double embedded quotes (RFC 4180)."""
    if any(c in s for c in (",", '"', "\r", "\n")):
        return '"' + s.replace('"', '""') + '"'
    return s


CSV_TRICKY_PREFIX = 'a,"b"\r\n'  # comma + quotes + CRLF, all inside ONE field
CSV_SNIPPET_LEN = 20


def _stage_csv_rfc4180(sf_dir: str) -> str:
    """Stage (once per sf_dir) a hazard-dense RFC 4180 file: one row per
    document — doc_id, a tricky field embedding commas/doubled quotes/CRLF
    plus the document's first chars, and n_chars — written by OUR writer
    (the parser under test never sees the writer's state)."""
    from flock_spark.staging import stage_once

    def write_fixture(tmp: str) -> None:
        import os

        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"]
        ).sort_by("doc_id")
        out = []
        for did, text, nch in zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("n_chars").to_pylist(),
        ):
            tricky = CSV_TRICKY_PREFIX + (text or "")[:CSV_SNIPPET_LEN]
            out.append(
                ",".join(
                    (
                        str(did),
                        csv_rfc4180_write_field(tricky),
                        str(nch),
                    )
                )
                + "\r\n"
            )
        with open(os.path.join(tmp, "docs.csv"), "wb") as fh:
            fh.write("".join(out).encode("utf-8"))

    return stage_once(f"csv4180_{sf_dir}", "v1-tricky-crlf", write_fixture)


@register(
    "scan_csv_rfc4180_parse",
    oracle=f"""
    SELECT doc_id,
           CAST(3 AS BIGINT) AS n_fields,
           CAST(octet_length(encode('{CSV_TRICKY_PREFIX.replace(chr(13) + chr(10), "' || chr(13) || chr(10) || '")}'
                || substring(text, 1, {CSV_SNIPPET_LEN}))) AS BIGINT)
             AS tricky_len,
           md5(hex(encode('{CSV_TRICKY_PREFIX.replace(chr(13) + chr(10), "' || chr(13) || chr(10) || '")}'
                || substring(text, 1, {CSV_SNIPPET_LEN})))) AS tricky_md5,
           CAST(n_chars AS BIGINT) AS n_chars_field
    FROM documents
    """,
    tags=("scan", "formats", "codec", "pandas_udf", "staged"),
    doc="RFC 4180 CSV parsing from the spec — the format every data "
    "EXCHANGE still runs on, parsed by an explicit state machine over "
    "the staged file's raw bytes (binaryFile scan): quoted fields "
    "containing commas, DOUBLED quotes and embedded CRLF — every row's "
    "middle field carries all three hazards plus the document's text "
    "prefix — with framing violations (garbage after a closing quote, "
    "bare CR, quote inside an unquoted field, EOF inside quotes) "
    "rejected loudly. The oracle re-derives each parsed field's byte "
    "length and md5 from the documents view, so a dequoting or "
    "row-splitting bug mismatches; the test suite additionally parses "
    "the SAME staged file with Spark's own multiLine CSV reader and "
    "DuckDB's read_csv and demands three-way row agreement. Scale: "
    "RFC 4180's embedded newlines make naive line-splitting WRONG — "
    "which is exactly why Spark's multiLine mode gives up input "
    "splitting; the from-spec machine documents the cost: quoted CSV "
    "parses one task per file (like here), so at 100 TB you shard by "
    "FILES, never by lines.",
)
def scan_csv_rfc4180_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_csv_rfc4180(sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .load(f"{path}/docs.csv")
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "n_fields": [], "tricky_len": [],
                "tricky_md5": [], "n_chars_field": [],
            }
            for content in pdf["content"]:
                for rec in csv_rfc4180_parse(bytes(content)):
                    if len(rec) != 3:
                        raise ValueError(f"row has {len(rec)} fields, not 3")
                    tricky = rec[1]
                    if not tricky.startswith(CSV_TRICKY_PREFIX):
                        raise ValueError("dequoting lost the hazard prefix")
                    tb = tricky.encode("utf-8")
                    rows["doc_id"].append(int(rec[0]))
                    rows["n_fields"].append(len(rec))
                    rows["tricky_len"].append(len(tb))
                    rows["tricky_md5"].append(
                        hashlib.md5(tb.hex().upper().encode()).hexdigest()
                    )
                    rows["n_chars_field"].append(int(rec[2]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "n_fields": pd.Series(rows["n_fields"], dtype="int64"),
                    "tricky_len": pd.Series(rows["tricky_len"], dtype="int64"),
                    "tricky_md5": pd.Series(rows["tricky_md5"], dtype="object"),
                    "n_chars_field": pd.Series(
                        rows["n_chars_field"], dtype="int64"
                    ),
                }
            )

    return bf.mapInPandas(
        run,
        schema="doc_id long, n_fields long, tricky_len long, "
        "tricky_md5 string, n_chars_field long",
    )


@register(
    "scan_parquet_zstd_page_decode",
    oracle="""
    SELECT 'doc_id' AS col_name,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(0 AS BIGINT) AS n_nulls,
           CAST(min(doc_id) AS BIGINT) AS min_v,
           CAST(max(doc_id) AS BIGINT) AS max_v,
           CAST(sum(doc_id) AS BIGINT) AS sum_v,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS values_md5
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
           CAST(min(n_chars) AS BIGINT), CAST(max(n_chars) AS BIGINT),
           CAST(sum(n_chars) AS BIGINT),
           md5(string_agg(CAST(n_chars AS VARCHAR), ',' ORDER BY doc_id))
    FROM documents
    """,
    tags=("scan", "formats", "codec", "pandas_udf", "staged"),
    doc="From-scratch parquet COLUMN read over ZSTD pages — the modern "
    "archival default page codec and the FOURTH page codec after SNAPPY, "
    "GZIP and LZ4_RAW; also the cross-implementation certification of "
    "the repo's RFC 8878 decoder in the reverse direction from "
    "mm_zstd_frame_roundtrip: the staged fixture is compressed by the "
    "REAL pyarrow (libzstd) encoder and every page payload is one "
    "complete zstd frame decoded by zstd_codec.zstd_frame_decompress "
    "(frame header walk, Huffman/FSE literals, sequence execution), so "
    "any divergence between our reading of the RFC and the reference "
    "implementation's writing of it mismatches here. Columns certified "
    "VALUE BY VALUE (count/min/max/sum + md5 of the full column in file "
    "order) against the documents view. Scale: one task per file via "
    "binaryFile, O(page) memory, no shuffle — the codec-sibling plan "
    "family.",
)
def scan_parquet_zstd_page_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_parquet_codec(sf_dir, "zstd")
    bf = (
        spark.read.format("binaryFile")
        .load(f"{path}/documents_zstd.parquet")
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "col_name": [], "n_values": [], "n_nulls": [], "min_v": [],
                "max_v": [], "sum_v": [], "values_md5": [],
            }
            for content in pdf["content"]:
                content = bytes(content)
                info = parquet_footer_parse(content)
                names = [n for n, _ in info["schema"]]
                codecs = {
                    c["codec"]
                    for rg in info["row_groups"]
                    for c in rg["columns"]
                }
                if codecs != {"ZSTD"}:
                    raise ValueError(f"fixture not zstd-paged: {codecs}")
                for col in ("doc_id", "n_chars"):
                    vals = parquet_column_read(content, names.index(col))
                    present = [v for v in vals if v is not None]
                    rows["col_name"].append(col)
                    rows["n_values"].append(len(vals))
                    rows["n_nulls"].append(len(vals) - len(present))
                    rows["min_v"].append(min(present))
                    rows["max_v"].append(max(present))
                    rows["sum_v"].append(sum(present))
                    rows["values_md5"].append(
                        hashlib.md5(
                            ",".join(str(v) for v in present).encode()
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "col_name": pd.Series(rows["col_name"], dtype="object"),
                    "n_values": pd.Series(rows["n_values"], dtype="int64"),
                    "n_nulls": pd.Series(rows["n_nulls"], dtype="int64"),
                    "min_v": pd.Series(rows["min_v"], dtype="int64"),
                    "max_v": pd.Series(rows["max_v"], dtype="int64"),
                    "sum_v": pd.Series(rows["sum_v"], dtype="int64"),
                    "values_md5": pd.Series(rows["values_md5"], dtype="object"),
                }
            )

    return bf.mapInPandas(
        run,
        schema="col_name string, n_values long, n_nulls long, min_v long, "
        "max_v long, sum_v long, values_md5 string",
    )


# ---------------------------------------------------------------------------
# DataPageV2 + DELTA_BINARY_PACKED: the modern parquet page layout
# ---------------------------------------------------------------------------


def delta_binary_packed_decode(data: bytes, pos: int = 0) -> tuple[list[int], int]:
    """DELTA_BINARY_PACKED (parquet Encodings.md): ULEB128 header
    <block_size, miniblocks_per_block, total_count, zigzag first_value>,
    then per block a zigzag min_delta, one bit-width byte per miniblock,
    and LSB-first bit-packed deltas (value = previous + min_delta + delta).
    Trailing unneeded miniblocks carry a width byte but NO body bytes.
    Returns (values, next_pos)."""
    block_size, pos = _varint(data, pos)
    n_mini, pos = _varint(data, pos)
    total, pos = _varint(data, pos)
    raw_first, pos = _varint(data, pos)
    if n_mini == 0 or block_size % n_mini:
        raise ValueError("invalid delta block geometry")
    per_mini = block_size // n_mini
    if per_mini % 8:
        raise ValueError("miniblock size not a multiple of 8")
    values: list[int] = []
    if total:
        values.append(_zigzag(raw_first))
    while len(values) < total:
        raw_md, pos = _varint(data, pos)
        min_delta = _zigzag(raw_md)
        widths = data[pos : pos + n_mini]
        if len(widths) < n_mini:
            raise ValueError("truncated miniblock width list")
        pos += n_mini
        for w in widths:
            if len(values) >= total:
                continue  # width byte present, body omitted
            nbytes = per_mini * w // 8
            if pos + nbytes > len(data):
                raise ValueError("miniblock body past end of buffer")
            acc = int.from_bytes(data[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << w) - 1
            for k in range(per_mini):
                if len(values) >= total:
                    break
                delta = (acc >> (k * w)) & mask if w else 0
                values.append(values[-1] + min_delta + delta)
    return values, pos


def _stage_parquet_v2_delta(sf_dir: str) -> str:
    """Stage (once per sf_dir) a MODERN-layout parquet fixture: DataPageV2
    pages, DELTA_BINARY_PACKED integer columns, no dictionary, zstd page
    compression — the format combination current writers default toward."""
    from flock_spark.staging import stage_once

    def write_fixture(tmp: str) -> None:
        import os

        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "n_chars", "text", "source"],
        ).sort_by("doc_id")
        pq.write_table(
            t,
            os.path.join(tmp, "documents_v2delta.parquet"),
            version="2.6",
            data_page_version="2.0",
            use_dictionary=False,
            column_encoding={
                "doc_id": "DELTA_BINARY_PACKED",
                "n_chars": "DELTA_BINARY_PACKED",
                "text": "DELTA_BYTE_ARRAY",
                "source": "DELTA_LENGTH_BYTE_ARRAY",
            },
            compression="zstd",
            data_page_size=2048,
            row_group_size=max(64, t.num_rows // 4),
        )

    return stage_once(
        f"parquet_v2delta_{sf_dir}", "v2-dpv2-delta-str-zstd", write_fixture
    )


@register(
    "scan_parquet_v2_delta_decode",
    oracle="""
    SELECT 'doc_id' AS col_name,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(0 AS BIGINT) AS n_nulls,
           CAST(min(doc_id) AS BIGINT) AS min_v,
           CAST(max(doc_id) AS BIGINT) AS max_v,
           CAST(sum(doc_id) AS BIGINT) AS sum_v,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
             AS values_md5
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
           CAST(min(n_chars) AS BIGINT), CAST(max(n_chars) AS BIGINT),
           CAST(sum(n_chars) AS BIGINT),
           md5(string_agg(CAST(n_chars AS VARCHAR), ',' ORDER BY doc_id))
    FROM documents
    UNION ALL
    SELECT 'text', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
           CAST(min(octet_length(encode(text))) AS BIGINT),
           CAST(max(octet_length(encode(text))) AS BIGINT),
           CAST(sum(octet_length(encode(text))) AS BIGINT),
           md5(string_agg(md5(text), ',' ORDER BY doc_id))
    FROM documents
    UNION ALL
    SELECT 'source', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
           CAST(min(octet_length(encode(source))) AS BIGINT),
           CAST(max(octet_length(encode(source))) AS BIGINT),
           CAST(sum(octet_length(encode(source))) AS BIGINT),
           md5(string_agg(md5(source), ',' ORDER BY doc_id))
    FROM documents
    """,
    tags=("scan", "formats", "codec", "pandas_udf", "staged"),
    doc="From-scratch parquet COLUMN read over the MODERN page layout — "
    "DataPageV2 headers (separately-compressed data section, "
    "length-known uncompressed levels, per-page null counts) with ALL "
    "THREE delta encodings: DELTA_BINARY_PACKED integers (ULEB128 "
    "block geometry, zigzag first value + min-deltas, per-miniblock "
    "bit widths, LSB-first packed deltas, width-byte-without-body "
    "trailing miniblocks), DELTA_LENGTH_BYTE_ARRAY strings "
    "(delta-packed lengths + concatenated bytes) and DELTA_BYTE_ARRAY "
    "front-coded strings (byte-prefix sharing against the previous "
    "value), under zstd page compression — Thrift page walk -> RFC "
    "8878 zstd frame decode -> delta unpack, three from-spec layers "
    "composed and certified value by value (count/min-max-sum of "
    "values or byte lengths + md5 of the full column in file order) "
    "against the documents view. The staged fixture is written by the "
    "REAL pyarrow v2 writer, so this is the cross-implementation read "
    "of the layout modern writers default toward. Scale: one task per "
    "file via binaryFile, O(page) memory, no shuffle.",
)
def scan_parquet_v2_delta_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_parquet_v2_delta(sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .load(f"{path}/documents_v2delta.parquet")
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "col_name": [], "n_values": [], "n_nulls": [], "min_v": [],
                "max_v": [], "sum_v": [], "values_md5": [],
            }
            for content in pdf["content"]:
                content = bytes(content)
                info = parquet_footer_parse(content)
                names = [n for n, _ in info["schema"]]
                codecs = {
                    c["codec"]
                    for rg in info["row_groups"]
                    for c in rg["columns"]
                }
                if codecs != {"ZSTD"}:
                    raise ValueError(f"fixture not zstd-paged: {codecs}")
                for col in ("doc_id", "n_chars", "text", "source"):
                    vals = parquet_column_read(content, names.index(col))
                    present = [v for v in vals if v is not None]
                    if col in ("text", "source"):
                        stats = [len(v.encode()) for v in present]
                        joined = ",".join(
                            hashlib.md5(v.encode()).hexdigest()
                            for v in present
                        )
                    else:
                        stats = present
                        joined = ",".join(str(v) for v in present)
                    rows["col_name"].append(col)
                    rows["n_values"].append(len(vals))
                    rows["n_nulls"].append(len(vals) - len(present))
                    rows["min_v"].append(min(stats))
                    rows["max_v"].append(max(stats))
                    rows["sum_v"].append(sum(stats))
                    rows["values_md5"].append(
                        hashlib.md5(joined.encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "col_name": pd.Series(rows["col_name"], dtype="object"),
                    "n_values": pd.Series(rows["n_values"], dtype="int64"),
                    "n_nulls": pd.Series(rows["n_nulls"], dtype="int64"),
                    "min_v": pd.Series(rows["min_v"], dtype="int64"),
                    "max_v": pd.Series(rows["max_v"], dtype="int64"),
                    "sum_v": pd.Series(rows["sum_v"], dtype="int64"),
                    "values_md5": pd.Series(rows["values_md5"], dtype="object"),
                }
            )

    return bf.mapInPandas(
        run,
        schema="col_name string, n_values long, n_nulls long, min_v long, "
        "max_v long, sum_v long, values_md5 string",
    )


def _delta_length_raw(data: bytes, n: int, pos: int) -> tuple[list[bytes], int]:
    lengths, pos = delta_binary_packed_decode(data, pos)
    if len(lengths) != n:
        raise ValueError("length count disagrees with value count")
    out = []
    for ln in lengths:
        if ln < 0 or pos + ln > len(data):
            raise ValueError("byte-array value past end of page")
        out.append(data[pos : pos + ln])
        pos += ln
    return out, pos


def delta_length_byte_array_decode(
    data: bytes, n: int, pos: int = 0
) -> tuple[list[str], int]:
    """DELTA_LENGTH_BYTE_ARRAY: one DELTA_BINARY_PACKED block of lengths,
    then the concatenated value bytes."""
    raw, pos = _delta_length_raw(data, n, pos)
    return [b.decode("utf-8") for b in raw], pos


def delta_byte_array_decode(
    data: bytes, n: int, pos: int = 0
) -> tuple[list[str], int]:
    """DELTA_BYTE_ARRAY (incremental/front-coded strings): one
    DELTA_BINARY_PACKED block of shared BYTE-prefix lengths, then a
    DELTA_LENGTH_BYTE_ARRAY section of suffixes; each value is the
    previous value's byte prefix plus its suffix (prefix arithmetic runs
    on raw bytes — UTF-8 decode happens only at the end)."""
    prefixes, pos = delta_binary_packed_decode(data, pos)
    if len(prefixes) != n:
        raise ValueError("prefix count disagrees with value count")
    suffixes, pos = _delta_length_raw(data, n, pos)
    out: list[str] = []
    prev = b""
    for pl, suf in zip(prefixes, suffixes):
        if pl > len(prev):
            raise ValueError("prefix length exceeds previous value")
        prev = prev[:pl] + suf
        out.append(prev.decode("utf-8"))
    return out, pos


# ---------------------------------------------------------------------------
# PageIndex-driven page pruning: ColumnIndex + OffsetIndex walk
# ---------------------------------------------------------------------------


def parquet_page_index_read(
    content: bytes, leaf: int
) -> list[dict]:
    """Parse the PageIndex structures for one leaf column across all row
    groups: per row group the ColumnIndex (null_pages, per-page min/max
    binaries, boundary_order, null_counts) and OffsetIndex (PageLocation
    offset / compressed size / first_row_index). Raw Thrift walk — the
    footer helper strips these chunk-level fields."""
    flen = int.from_bytes(content[-8:-4], "little")
    meta, _ = thrift_read_struct(content[len(content) - 8 - flen : -8], 0)
    out = []
    for rg in meta.get(4) or []:
        cc = rg[1][leaf]
        ci_off, ci_len = cc.get(6), cc.get(7)
        oi_off, oi_len = cc.get(4), cc.get(5)
        if ci_off is None or oi_off is None:
            raise ValueError("column chunk carries no page index")
        ci, _ = thrift_read_struct(content[ci_off : ci_off + ci_len], 0)
        oi, _ = thrift_read_struct(content[oi_off : oi_off + oi_len], 0)
        pages = []
        for i, loc in enumerate(oi[1]):
            pages.append(
                {
                    "offset": loc[1],
                    "size": loc[2],
                    "first_row": loc[3],
                    "null_page": ci[1][i],
                    "min": ci[2][i],
                    "max": ci[3][i],
                    "null_count": (ci.get(5) or [None] * len(oi[1]))[i],
                }
            )
        out.append(
            {
                "pages": pages,
                "boundary_order": ci.get(4),
                "chunk_meta": cc[3],
            }
        )
    return out


def _decode_v1_plain_page(
    content: bytes, offset: int, codec: int, phys: str, optional: bool
) -> list:
    """Decode ONE v1 data page at a PageLocation offset: Thrift PageHeader,
    codec decompression, 4-byte-prefixed definition levels, PLAIN values."""
    ph, body = thrift_read_struct(content, offset)
    if ph[1] != 0:
        raise ValueError(f"expected DATA_PAGE v1 at {offset}, got {ph[1]}")
    raw = _page_decompress(codec, content[body : body + ph[3]])
    if len(raw) != ph[2]:
        raise ValueError("page uncompressed size mismatch")
    dph = ph.get(5) or {}
    n_vals = dph.get(1)
    if dph.get(2) != 0:
        raise ValueError("page-prune fixture must be PLAIN-encoded")
    p = 0
    if optional:
        dl_len = int.from_bytes(raw[:4], "little")
        p = 4
        dls, _ = rle_bp_decode(raw, p, 1, n_vals)
        p += dl_len
    else:
        dls = [1] * n_vals
    present = _plain_decode(raw[p:], phys, sum(dls))
    it = iter(present)
    return [next(it) if d else None for d in dls]


def page_index_prune_read(
    content: bytes, leaf: int, phys: str, optional: bool
) -> dict:
    """The 100 TB read pattern, executed from the raw bytes: derive the
    predicate cutoff (3/4 of the index-global max), keep only pages whose
    index max can satisfy it, decode ONLY those pages, and verify each
    decoded page's actual min/max against its index claim. Returns
    selection stats + pruning counters."""
    groups = parquet_page_index_read(content, leaf)
    decode_int = lambda b: int.from_bytes(b, "little", signed=True)  # noqa: E731
    all_pages = [p for g in groups for p in g["pages"] if not p["null_page"]]
    if not all_pages:
        raise ValueError("no non-null pages in the index")
    index_min = min(decode_int(p["min"]) for p in all_pages)
    index_max = max(decode_int(p["max"]) for p in all_pages)
    cutoff = index_max * 3 // 4
    n_sel = 0
    s_sel = 0
    scanned = 0
    for g in groups:
        codec = g["chunk_meta"].get(4)
        for p in g["pages"]:
            if p["null_page"]:
                continue
            pmin, pmax = decode_int(p["min"]), decode_int(p["max"])
            if pmax < cutoff:
                continue  # pruned: the index proves no row qualifies
            scanned += 1
            vals = [
                v
                for v in _decode_v1_plain_page(
                    content, p["offset"], codec, phys, optional
                )
                if v is not None
            ]
            if min(vals) != pmin or max(vals) != pmax:
                raise ValueError(
                    f"page at {p['offset']} disagrees with its index: "
                    f"claimed [{pmin},{pmax}], decoded "
                    f"[{min(vals)},{max(vals)}]"
                )
            qual = [v for v in vals if v >= cutoff]
            n_sel += len(qual)
            s_sel += sum(qual)
    return {
        "n_selected": n_sel,
        "sum_selected": s_sel,
        "index_min": index_min,
        "index_max": index_max,
        "n_pages_total": len(all_pages),
        "n_pages_scanned": scanned,
    }


def _stage_parquet_page_index(sf_dir: str) -> str:
    """Stage (once per sf_dir) a page-index fixture: doc_id/n_chars sorted,
    PLAIN small pages, zstd, two row groups, write_page_index=True."""
    from flock_spark.staging import stage_once

    def write_fixture(tmp: str) -> None:
        import os

        import pyarrow.parquet as pq

        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
        ).sort_by("doc_id")
        pq.write_table(
            t,
            os.path.join(tmp, "documents_pageindex.parquet"),
            compression="zstd",
            use_dictionary=False,
            data_page_size=256,
            data_page_version="1.0",
            row_group_size=max(128, t.num_rows // 2),
            write_page_index=True,
            write_batch_size=32,
        )

    return stage_once(
        f"parquet_pageindex_{sf_dir}", "v2-plain-zstd-pi-b32", write_fixture
    )


@register(
    "scan_parquet_page_index_prune",
    oracle="""
    WITH c AS (
      SELECT CAST(max(doc_id) * 3 // 4 AS BIGINT) AS cutoff FROM documents)
    SELECT CAST(sum(CASE WHEN doc_id >= c.cutoff THEN 1 ELSE 0 END)
                AS BIGINT) AS n_selected,
           CAST(sum(CASE WHEN doc_id >= c.cutoff THEN doc_id ELSE 0 END)
                AS BIGINT) AS sum_selected,
           CAST(min(doc_id) AS BIGINT) AS index_min,
           CAST(max(doc_id) AS BIGINT) AS index_max
    FROM documents, c
    GROUP BY c.cutoff
    """,
    tags=("scan", "formats", "layout", "pandas_udf", "staged"),
    doc="PageIndex-driven page pruning from the raw bytes — the structure "
    "a 100 TB reader actually skips with: the staged fixture carries "
    "parquet's ColumnIndex (per-page min/max/null stats, boundary "
    "order) and OffsetIndex (page locations, first row indexes), both "
    "parsed by the from-spec Thrift walk; the entry derives a "
    "predicate cutoff (3/4 of the index-global max), DECODES ONLY the "
    "pages whose index max can satisfy it (each decoded page's real "
    "min/max is checked against its index claim — a lying index "
    "raises), and returns the qualifying count/sum, which the oracle "
    "recomputes over ALL rows: if pruning ever skipped a page that "
    "held a qualifying row, the counts mismatch. Tests additionally "
    "pin that most pages really are skipped. Scale: this is predicate "
    "pushdown below the row-group level — the same I/O-elision "
    "Spark's own vectorized reader performs, proven here byte-by-byte.",
)
def scan_parquet_page_index_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _stage_parquet_page_index(sf_dir)
    bf = (
        spark.read.format("binaryFile")
        .load(f"{path}/documents_pageindex.parquet")
        .select("content")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "n_selected": [], "sum_selected": [],
                "index_min": [], "index_max": [],
            }
            for content in pdf["content"]:
                st = page_index_prune_read(bytes(content), 0, "INT64", True)
                rows["n_selected"].append(st["n_selected"])
                rows["sum_selected"].append(st["sum_selected"])
                rows["index_min"].append(st["index_min"])
                rows["index_max"].append(st["index_max"])
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in rows.items()}
            )

    return bf.mapInPandas(
        run,
        schema="n_selected long, sum_selected long, "
        "index_min long, index_max long",
    )


def snappy_compress(data: bytes, max_chain: int = 16) -> bytes:
    """Raw snappy block ENCODE — the reverse of snappy_decompress above,
    with REAL copy elements (not the literal-only minimal form the
    fixture writers use): greedy hash-4 matching, 1-byte-offset copies
    (len 4-11, offset < 2048), 2-byte-offset copies (len 4-64 per
    element, longer matches split), literal runs with 1/2-byte extended
    length tags. Certified against the REAL snappy decoder (pyarrow) and
    this module's own from-spec decoder."""
    out = bytearray()
    n = len(data)
    v = n
    while True:  # uncompressed-length preamble
        b = v & 0x7F
        v >>= 7
        out.append(b | 0x80 if v else b)
        if not v:
            break

    def emit_literal(start: int, end: int) -> None:
        i = start
        while i < end:
            chunk = data[i : min(end, i + 65536)]
            ln = len(chunk) - 1
            if ln < 60:
                out.append(ln << 2)
            elif ln < 256:
                out.append(60 << 2)
                out.append(ln)
            else:
                out.append(61 << 2)
                out.extend(ln.to_bytes(2, "little"))
            out.extend(chunk)
            i += len(chunk)

    head: dict[int, list[int]] = {}
    i = 0
    lit_start = 0
    while i < n:
        best_len = 0
        best_off = 0
        if i + 4 <= n:
            key = int.from_bytes(data[i : i + 4], "little")
            tried = 0
            for j in reversed(head.get(key, ())):
                if i - j > 65535:
                    break
                tried += 1
                if tried > max_chain:
                    break
                ln = 0
                maxl = n - i
                while ln < maxl and data[j + ln] == data[i + ln]:
                    ln += 1
                if ln > best_len:
                    best_len, best_off = ln, i - j
                    if ln >= 64:
                        break
        if best_len >= 4:
            emit_literal(lit_start, i)
            remaining = best_len
            while remaining >= 4:
                ln = min(remaining, 64)
                if remaining - ln in (1, 2, 3):
                    ln -= 4 - (remaining - ln)  # keep the tail emittable
                if 4 <= ln <= 11 and best_off < 2048:
                    out.append(
                        1 | ((ln - 4) << 2) | ((best_off >> 8) << 5)
                    )
                    out.append(best_off & 0xFF)
                else:
                    out.append(2 | ((ln - 1) << 2))
                    out.extend(best_off.to_bytes(2, "little"))
                remaining -= ln
            end = i + best_len - remaining
            while i < end:
                if i + 4 <= n:
                    key = int.from_bytes(data[i : i + 4], "little")
                    head.setdefault(key, []).append(i)
                i += 1
            i = end
            lit_start = i
        else:
            if i + 4 <= n:
                head.setdefault(key, []).append(i)
            i += 1
    emit_literal(lit_start, n)
    return bytes(out)


def _register_snappy_encode() -> None:
    from flock_spark.operators.zstd_codec import _PAYLOAD_CASE, _ZSTD_ORACLE

    @register(
        "mm_snappy_encode_roundtrip",
        oracle=_ZSTD_ORACLE,
        tags=("multimodal", "pandas_udf", "codec"),
        doc="Snappy ENCODE with real copy elements — completing the "
        "snappy pair (the decoder landed in round 9; fixture writers "
        "so far used the literal-only minimal form): greedy hash-4 "
        "matching, 1-byte-offset copies (len 4-11, offset < 2048), "
        "2-byte-offset copies with long-match splitting that never "
        "strands a sub-4-byte tail, literal runs with extended length "
        "tags. Every stream is decompressed by the REAL snappy "
        "library (pyarrow) AND re-read by this module's own from-spec "
        "decoder. Oracle identical to the other codec entries (repeat "
        "algebra over the same five payload shapes). Scale: "
        "per-object mapInPandas, single scan, no shuffle.",
    )
    def mm_snappy_encode_roundtrip(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from flock_spark.catalog import spread, tbl

        d = (
            tbl(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .selectExpr(
                "doc_id", f"cast(({_PAYLOAD_CASE}) as binary) AS payload"
            )
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import pyarrow as pa

            codec = pa.Codec("snappy")
            for pdf in batches:
                out_doc, out_n, out_sum, out_md5 = [], [], [], []
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                    b = bytes(payload)
                    stream = snappy_compress(b)
                    if bytes(codec.decompress(stream, len(b))) != b:
                        raise ValueError(
                            f"real snappy read our stream differently "
                            f"for doc {doc_id}"
                        )
                    if snappy_decompress(stream) != b:
                        raise ValueError(
                            f"self-decode mismatch for doc {doc_id}"
                        )
                    out_doc.append(int(doc_id))
                    out_n.append(len(b))
                    out_sum.append(sum(b))
                    out_md5.append(
                        hashlib.md5(b.hex().upper().encode()).hexdigest()
                    )
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(out_doc, dtype="int64"),
                        "n_bytes": pd.Series(out_n, dtype="int64"),
                        "byte_sum": pd.Series(out_sum, dtype="int64"),
                        "decoded_md5": pd.Series(
                            out_md5, dtype="object"
                        ),
                    }
                )

        return spread(d).mapInPandas(
            run,
            schema="doc_id long, n_bytes long, byte_sum long, "
            "decoded_md5 string",
        )


_register_snappy_encode()
