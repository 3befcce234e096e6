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
