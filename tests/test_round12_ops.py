"""Round-12 operators: the from-spec Zstandard (RFC 8878) frame decoder +
XXH64, certified against the REAL libzstd encoder (pyarrow) and — where the
environment provides one — the reference zstd CLI's checksummed frames."""

from __future__ import annotations

import random
import shutil
import subprocess

import pytest

from flock_spark.operators import zstd_codec as Z
from flock_spark.registry import REGISTRY, _load_all

_load_all()


# ---------------------------------------------------------------------------
# XXH64: spec vector + JVM cross-check
# ---------------------------------------------------------------------------


def test_xxh64_spec_vectors():
    # the published reference vector for the empty input, seed 0
    assert Z.xxh64(b"") == 0xEF46DB3751D8E999
    # seed changes the result (the short-input path uses seed + PRIME5)
    assert Z.xxh64(b"", 1) != Z.xxh64(b"")
    # all four length regimes produce 64-bit values deterministically
    for n in (1, 3, 4, 7, 8, 31, 32, 33, 100):
        v = Z.xxh64(bytes(range(n % 256)) * (n // 256 + 1), 7)
        assert 0 <= v < (1 << 64)


def test_xxh64_agrees_with_spark_jvm(spark):
    """Spark's xxhash64 over a binary column is reference XXH64 with seed
    42 — an independent JVM implementation to check every length regime
    against (lanes, merge, 8/4/1-byte tails, avalanche)."""
    from pyspark.sql import functions as F

    rng = random.Random(12)
    payloads = [rng.randbytes(n)
                for n in (0, 1, 3, 4, 7, 8, 13, 16, 31, 32, 40, 100, 1024)]
    df = spark.createDataFrame(
        [(p,) for p in payloads], "payload binary"
    ).select(F.xxhash64("payload").alias("h"), "payload")
    for row in df.collect():
        mine = Z.xxh64(bytes(row["payload"]), 42)
        signed = mine - (1 << 64) if mine >= (1 << 63) else mine
        assert signed == row["h"], len(row["payload"])


# ---------------------------------------------------------------------------
# Decoder vs the REAL libzstd encoder (pyarrow), all format paths
# ---------------------------------------------------------------------------


def _corpus() -> list[bytes]:
    rng = random.Random(42)
    words = [f"token{i}" for i in range(300)] + ["the", "and", "of"]
    out = [b"", b"a", b"abc", b"x" * 5, b"x" * 2000, bytes(range(256)) * 4,
           rng.randbytes(2000), b"q" * 200000]
    for n in (50, 300, 1000, 5000, 20000):
        out.append(" ".join(rng.choice(words) for _ in range(n)).encode())
    out.append(" ".join(rng.choice(words) for _ in range(80000)).encode())
    out.append(bytes(rng.choice(b"abcdefghijklmnopqrstuvwxyz")
                     for _ in range(500)))
    out.append(rng.randbytes(300000))
    return out


def test_zstd_roundtrip_against_real_encoder_all_levels():
    import pyarrow as pa

    Z.STATS.clear()
    for lvl in (1, 3, 9, 12, 19):
        codec = pa.Codec("zstd", compression_level=lvl)
        for p in _corpus():
            comp = bytes(codec.compress(p))
            assert Z.zstd_frame_decompress(comp) == p, (lvl, len(p))
    # non-vacuity: the corpus must exercise every interesting format path
    must_fire = [
        "block_type_0",      # raw block
        "block_type_1",      # RLE block (the 200k single-byte payload)
        "block_type_2",      # compressed block
        "lit_type_0",        # raw literals
        "lit_type_2",        # Huffman-compressed literals
        "lit_type_3",        # treeless literals (multi-block reuse)
        "lit_streams_1",     # single-stream Huffman
        "lit_streams_4",     # 4-stream Huffman with jump table
        "huf_weights_fse",   # FSE-compressed tree description
        "seq_none",          # literals-only compressed block
        "seq_ll_mode_0", "seq_ml_mode_0", "seq_of_mode_0",  # predefined
        "seq_ll_mode_2", "seq_ml_mode_2", "seq_of_mode_2",  # FSE tables
        "seq_of_mode_3",     # repeat mode (table reuse across blocks)
        "ofs_direct",
        "ofs_rep_1_ll0_0", "ofs_rep_1_ll0_1",  # repeat offsets, both
        "ofs_rep_2_ll0_0", "ofs_rep_2_ll0_1",  # ll==0 twists
        "ofs_rep_3_ll0_0", "ofs_rep_3_ll0_1",
    ]
    missing = [k for k in must_fire if not Z.STATS.get(k)]
    assert not missing, f"format paths never exercised: {missing}"


def test_zstd_decodes_real_cli_checksummed_frames(tmp_path):
    """The zstd CLI writes XXH64 content checksums by default — REAL
    checksummed frames from the reference implementation certify the
    whole xxh64 path (including the 1/4/8-byte tails Spark's variant
    can't check) non-circularly."""
    cli = shutil.which("zstd")
    if cli is None:
        pytest.skip("no zstd CLI in this environment")
    rng = random.Random(5)
    payloads = [b"hello zstd checksum", rng.randbytes(777),
                b"abc" * 4000, rng.randbytes(100001)]
    for i, p in enumerate(payloads):
        src = tmp_path / f"p{i}"
        src.write_bytes(p)
        subprocess.run([cli, "-q", "-3", str(src)], check=True)
        comp = (tmp_path / f"p{i}.zst").read_bytes()
        Z.STATS.clear()
        assert Z.zstd_frame_decompress(comp) == p
        assert Z.STATS.get("frame_checksum"), "CLI frame had no checksum"


# ---------------------------------------------------------------------------
# Hand-crafted frames: paths libzstd's encoder rarely or never emits
# ---------------------------------------------------------------------------

_MAGIC = (0xFD2FB528).to_bytes(4, "little")


def _frame(blocks: bytes, fcs: int) -> bytes:
    # single-segment frame, 1-byte frame content size
    return _MAGIC + bytes([0x20, fcs]) + blocks


def _block_hdr(size: int, btype: int, last: int = 1) -> bytes:
    return ((last | (btype << 1) | (size << 3))).to_bytes(3, "little")


def test_zstd_rle_literals_block():
    # compressed block: RLE literals (20 x 'Z'), zero sequences
    block = bytes([1 | (20 << 3), ord("Z"), 0])
    Z.STATS.clear()
    out = Z.zstd_frame_decompress(_frame(_block_hdr(len(block), 2) + block, 20))
    assert out == b"Z" * 20
    assert Z.STATS.get("lit_type_1") == 1


def test_zstd_direct_huffman_weights():
    # Huffman over symbols {0,1,2}: direct weights 2,1 (+ implicit 1) give
    # codes sym1=00, sym2=01, sym0=1; literals [0,0,1,2,0] pack (with the
    # sentinel) into the single backward-stream byte 0xE3
    lits_hdr = bytes([0x02 | (5 << 4), 0xC0, 0x00])  # regen=5, comp=3
    tree = bytes([129, 0x21])
    stream = bytes([0xE3])
    block = lits_hdr + tree + stream + bytes([0])  # 0 sequences
    Z.STATS.clear()
    out = Z.zstd_frame_decompress(_frame(_block_hdr(len(block), 2) + block, 5))
    assert out == bytes([0, 0, 1, 2, 0])
    assert Z.STATS.get("huf_weights_direct") == 1
    assert Z.STATS.get("lit_streams_1") == 1


def test_zstd_rle_block_and_raw_block():
    blocks = _block_hdr(7, 1, last=0) + b"R" + _block_hdr(3, 0, last=1) + b"abc"
    out = Z.zstd_frame_decompress(_frame(blocks, 10))
    assert out == b"R" * 7 + b"abc"


def test_zstd_skippable_frame_then_real_frame():
    import pyarrow as pa

    skip = (0x184D2A50).to_bytes(4, "little") + (4).to_bytes(4, "little") + b"junk"
    comp = bytes(pa.Codec("zstd").compress(b"payload after skippable"))
    assert Z.zstd_frame_decompress(skip + comp) == b"payload after skippable"


def test_zstd_checksum_flag_plumbing():
    # take a hand-built frame, set the checksum bit, append XXH64 low bytes
    content = b"Z" * 20
    block = bytes([1 | (20 << 3), ord("Z"), 0])
    f = bytearray(_frame(_block_hdr(len(block), 2) + block, 20))
    f[4] |= 0x04  # Content_Checksum_flag
    good = bytes(f) + (Z.xxh64(content) & 0xFFFFFFFF).to_bytes(4, "little")
    assert Z.zstd_frame_decompress(good) == content
    bad = good[:-1] + bytes([good[-1] ^ 1])
    with pytest.raises(ValueError, match="checksum"):
        Z.zstd_frame_decompress(bad)


def test_zstd_framing_violations_raise():
    import pyarrow as pa

    comp = bytes(pa.Codec("zstd").compress(b"hello hello hello"))
    with pytest.raises(ValueError, match="magic"):
        Z.zstd_frame_decompress(b"\x00\x00\x00\x00" + comp[4:])
    with pytest.raises(ValueError):
        Z.zstd_frame_decompress(comp[:-2])  # truncated
    # junk after the final frame parses as a (bad) next-frame magic
    with pytest.raises(ValueError, match="magic|trailing"):
        Z.zstd_frame_decompress(comp + b"\x01")
    with pytest.raises(ValueError, match="reserved frame-header"):
        Z.zstd_frame_decompress(comp[:4] + bytes([comp[4] | 0x08]) + comp[5:])
    with pytest.raises(ValueError, match="content size"):
        # declared FCS disagrees with decoded length
        bad = bytearray(b"".join([_MAGIC, bytes([0x20, 9]),
                                  _block_hdr(3, 0), b"abc"]))
        Z.zstd_frame_decompress(bytes(bad))
    with pytest.raises(ValueError):
        Z.zstd_frame_decompress(b"")


def test_zstd_match_offset_beyond_window_raises():
    # hand-crafted compressed block: raw literals 'ab', then ONE sequence
    # under all-RLE tables (zero-bit states) whose offset code 10 demands
    # a 1021-byte backreference into an empty window — must raise, never
    # wrap. Bitstream = 10 offset extra bits (all zero) under the sentinel.
    block = bytes([
        0x10, ord("a"), ord("b"),  # raw literals header (regen=2) + 'ab'
        0x01,                       # one sequence
        0x54,                       # LL/OF/ML all RLE mode
        0x00, 0x0A, 0x00,           # RLE symbols: LL=0, OF=10, ML=0
        0x00, 0x04,                 # backward stream: sentinel + 10 zero bits
    ])
    frame = _frame(_block_hdr(len(block), 2) + block, 5)
    with pytest.raises(ValueError, match="beyond window"):
        Z.zstd_frame_decompress(frame)


# ---------------------------------------------------------------------------
# Registry entries: fixture-shape non-vacuity (oracle agreement is swept by
# the driver/sweep; here we pin that the five payload variants exist and
# the staged zstd parquet really uses ZSTD pages)
# ---------------------------------------------------------------------------


def test_zstd_roundtrip_entry_covers_all_variants(spark, sf_dir):
    rows = REGISTRY["mm_zstd_frame_roundtrip"].fn(spark, sf_dir).collect()
    assert len(rows) >= 100
    variants = {r["doc_id"] % 5 for r in rows}
    assert variants == {0, 1, 2, 3, 4}
    # repeated variants really are bigger than their stems
    by_id = {r["doc_id"]: r for r in rows}
    for did, r in by_id.items():
        if did % 5 == 2:
            assert r["n_bytes"] >= 200  # 200 x up-to-9-char stem


def test_zstd_parquet_fixture_is_really_zstd_paged(spark, sf_dir):
    from flock_spark.operators.formats import (
        parquet_footer_parse,
        _stage_parquet_codec,
    )

    path = _stage_parquet_codec(sf_dir, "zstd")
    content = open(f"{path}/documents_zstd.parquet", "rb").read()
    info = parquet_footer_parse(content)
    codecs = {c["codec"] for rg in info["row_groups"] for c in rg["columns"]}
    assert codecs == {"ZSTD"}
    # several pages per chunk (data_page_size=2048 in the staging writer)
    assert len(info["row_groups"]) >= 2


# ---------------------------------------------------------------------------
# Arrow IPC stream walk: from-spec flatbuffers + IPC framing
# ---------------------------------------------------------------------------


def _ipc_bytes(table) -> bytes:
    import io

    import pyarrow.ipc as ipc

    sink = io.BytesIO()
    with ipc.new_stream(sink, table.schema) as w:
        for b in table.to_batches(max_chunksize=max(1, table.num_rows // 3)):
            w.write_batch(b)
    return sink.getvalue()


def test_arrow_ipc_reads_all_supported_types_with_nulls():
    import pyarrow as pa

    from flock_spark.operators.arrow_ipc import arrow_ipc_stream_read

    t = pa.table(
        {
            "i64": pa.array([1, None, -3, 2**62, 5], pa.int64()),
            "i32": pa.array([7, 8, None, -1, 0], pa.int32()),
            "f64": pa.array([1.5, None, -2.25, 0.0, 3.0], pa.float64()),
            "s": pa.array(["a", "", None, "héllo", "zz"], pa.utf8()),
            "b": pa.array([True, False, None, True, False], pa.bool_()),
            "d": pa.array(["x", "y", "x", None, "y"]).dictionary_encode(),
        }
    )
    fields, cols = arrow_ipc_stream_read(_ipc_bytes(t))
    assert [f["name"] for f in fields] == ["i64", "i32", "f64", "s", "b", "d"]
    assert cols["i64"] == [1, None, -3, 2**62, 5]
    assert cols["i32"] == [7, 8, None, -1, 0]
    assert cols["f64"] == [1.5, None, -2.25, 0.0, 3.0]
    assert cols["s"] == ["a", "", None, "héllo", "zz"]
    assert cols["b"] == [True, False, None, True, False]
    assert cols["d"] == ["x", "y", "x", None, "y"]
    # the dictionary column really went through a DictionaryBatch
    assert next(f for f in fields if f["name"] == "d")["dict_id"] is not None


def test_arrow_ipc_framing_violations_raise():
    import pyarrow as pa

    from flock_spark.operators.arrow_ipc import arrow_ipc_stream_read

    t = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    raw = _ipc_bytes(t)
    with pytest.raises(ValueError, match="continuation"):
        arrow_ipc_stream_read(b"\x00\x00\x00\x00" + raw[4:])
    with pytest.raises(ValueError, match="end-of-stream|truncated|continuation"):
        arrow_ipc_stream_read(raw[:-8])  # EOS marker cut off
    with pytest.raises(ValueError):
        arrow_ipc_stream_read(raw[: len(raw) // 2])
    # unsupported type must raise loudly, not decode garbage
    t2 = pa.table({"ts": pa.array([1, 2], pa.timestamp("us"))})
    with pytest.raises(ValueError, match="unsupported Arrow type"):
        arrow_ipc_stream_read(_ipc_bytes(t2))


def test_arrow_ipc_entry_stream_really_has_gaps_and_dictionary(spark, sf_dir):
    rows = {r["col_name"]: r
            for r in REGISTRY["scan_arrow_ipc_stream_walk"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"doc_id", "n_chars_gap", "text", "source"}
    # every 7th doc_id is null in the gap column — nulls really exist
    assert rows["n_chars_gap"]["n_nulls"] > 0
    assert rows["doc_id"]["n_nulls"] == 0
    assert rows["doc_id"]["n_values"] == rows["text"]["n_values"]


# ---------------------------------------------------------------------------
# Arena window-completeness audit: replay the reference's collect() protocol
# ---------------------------------------------------------------------------


def test_arena_audit_matches_bitmap_replay(spark, sf_dir):
    """Replay the reference arena's collect() semantics imperatively
    (bitmap per window, Processed on duplicate seq_num, Ready exactly when
    distinct fragments reach seq_len — arena/mod.rs:192-232) over the same
    derived fragment stream and check the relational audit row by row."""
    rows = REGISTRY["arena_window_completeness_audit"].fn(spark, sf_dir).collect()
    assert rows
    import duckdb

    frags = duckdb.connect().execute(
        f"""SELECT o_orderkey, o_orderkey % 97,
                   (o_orderkey % 97) % 7 + 2,
                   1 + ((o_orderkey * 13) % ((o_orderkey % 97) % 7 + 2))
            FROM '{sf_dir}/orders.parquet'
            WHERE NOT (o_orderkey % 97 % 11 = 0
                 AND 1 + ((o_orderkey * 13) % ((o_orderkey % 97) % 7 + 2))
                     = (o_orderkey % 97) % 7 + 2)
            ORDER BY o_orderkey"""
    ).fetchall()
    state: dict[int, dict] = {}
    for pos, wid, slen, snum in frags:
        w = state.setdefault(wid, {"seq_len": slen, "bitmap": set(),
                                   "arrivals": 0, "processed": 0,
                                   "ready_epoch": None})
        w["arrivals"] += 1
        if snum in w["bitmap"]:
            w["processed"] += 1  # HashAggregateStatus::Processed
            continue
        w["bitmap"].add(snum)
        if len(w["bitmap"]) == w["seq_len"] and w["ready_epoch"] is None:
            w["ready_epoch"] = pos  # HashAggregateStatus::Ready fires here
    assert len(rows) == len(state)
    complete = incomplete = dup_windows = 0
    for r in rows:
        w = state[r["window_id"]]
        assert r["seq_len"] == w["seq_len"], r
        assert r["n_arrivals"] == w["arrivals"], r
        assert r["n_distinct"] == len(w["bitmap"]), r
        assert r["n_processed"] == w["processed"], r
        assert r["is_complete"] == (1 if w["ready_epoch"] is not None else 0), r
        assert r["ready_epoch"] == w["ready_epoch"], r
        complete += r["is_complete"]
        incomplete += 1 - r["is_complete"]
        dup_windows += 1 if r["n_processed"] > 0 else 0
    # non-vacuity: the fixture must exercise completion, waiting AND
    # retransmission — a degenerate all-complete stream proves nothing
    assert complete > 0
    assert incomplete > 0  # the lost-fragment windows wait forever
    assert dup_windows > 0


# ---------------------------------------------------------------------------
# End-to-end crawl chain: composition non-vacuity
# ---------------------------------------------------------------------------


def test_crawl_chain_exercises_every_stage(spark, sf_dir):
    rows = REGISTRY["crawl_chain_end_to_end"].fn(spark, sf_dir).collect()
    assert len(rows) == 7  # one row per host h0..h6
    hosts = {r["host"] for r in rows}
    assert hosts == {f"http://h{i}.example.com" for i in range(7)}
    for r in rows:
        # ingest flowed through: pages with real body bytes
        assert r["n_pages"] > 0 and r["sum_body_len"] > 0
        # the duplicate href collapsed somewhere: raw internal > candidates
        assert r["n_internal_raw"] > r["n_candidates"]
        # robots stage made BOTH kinds of decision on this host
        assert r["n_allowed"] > 0 and r["n_denied"] > 0
        assert r["n_candidates"] == r["n_allowed"] + r["n_denied"]
        # scheduler packed allowed URLs into waves with the 250ms slot
        assert r["n_waves"] == r["n_allowed"]
        assert r["makespan_ms"] == (r["n_waves"] - 1) * 250
        # external links existed and were excluded from the frontier
        assert r["n_links_raw"] > r["n_internal_raw"]


# ---------------------------------------------------------------------------
# From-spec ENCODER: real libzstd must read our frames
# ---------------------------------------------------------------------------


def test_zstd_encoder_frames_decode_in_real_libzstd():
    import pyarrow as pa

    rng = random.Random(11)
    words = [f"w{i}" for i in range(60)]
    payloads = [b"", b"a", b"xyz", b"q" * 500, b"hello world " * 40,
                rng.randbytes(1000),
                " ".join(rng.choice(words) for _ in range(5000)).encode(),
                " ".join(rng.choice(words) for _ in range(60000)).encode(),
                b"ab" * 100000]
    codec = pa.Codec("zstd")
    kinds = set()
    for p in payloads:
        f = Z.zstd_frame_compress(p)
        assert bytes(codec.decompress(f, len(p))) == p, len(p)
        assert Z.zstd_frame_decompress(f) == p, len(p)
        # classify emitted block types from the frame itself via our walker
        Z.STATS.clear()
        Z.zstd_frame_decompress(f)
        kinds |= {k for k in Z.STATS if k.startswith("block_type_")}
    # the encoder must have used all three block kinds across the corpus
    assert kinds == {"block_type_0", "block_type_1", "block_type_2"}


def test_zstd_encoder_actually_compresses_and_splits_blocks():
    text = b"the quick brown fox jumps over the lazy dog. " * 6000  # ~270 KB
    f = Z.zstd_frame_compress(text)
    assert len(f) < len(text) // 3  # real sequences, not raw passthrough
    Z.STATS.clear()
    assert Z.zstd_frame_decompress(f) == text
    assert Z.STATS["block_type_2"] >= 3  # >128 KiB split into blocks


def test_zstd_encoder_cli_reads_our_frames(tmp_path):
    cli = shutil.which("zstd")
    if cli is None:
        pytest.skip("no zstd CLI in this environment")
    p = b"cross-implementation: the CLI is a second real decoder " * 300
    (tmp_path / "ours.zst").write_bytes(Z.zstd_frame_compress(p))
    out = subprocess.run(
        [cli, "-d", "-q", "-c", str(tmp_path / "ours.zst")],
        check=True, capture_output=True,
    )
    assert out.stdout == p


# ---------------------------------------------------------------------------
# DataPageV2 + DELTA_BINARY_PACKED
# ---------------------------------------------------------------------------


def test_delta_binary_packed_unit():
    from flock_spark.operators.formats import delta_binary_packed_decode

    # hand-built stream: block_size=8 (1 miniblock of 8), 3 values,
    # first=-2 (zigzag 3), min_delta=1 (zigzag 2), width 1, packed deltas
    # [0,1] for values -2, -1, 1; trailing 6 slots padded
    data = bytes([8, 1, 3, 3, 2, 1, 0b00000010])
    vals, pos = delta_binary_packed_decode(data)
    assert vals == [-2, -1, 1]
    assert pos == len(data)
    # empty stream: zero values
    vals, _ = delta_binary_packed_decode(bytes([8, 1, 0, 0]))
    assert vals == []


def test_delta_binary_packed_matches_pyarrow_all_shapes(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flock_spark.operators.formats import (
        parquet_column_read,
        parquet_footer_parse,
    )

    rng = random.Random(4)
    cols = {
        "monotone": list(range(1000)),
        "negative": [-(i * 37) for i in range(1000)],
        "wild": [rng.randint(-2**40, 2**40) for _ in range(1000)],
        "constant": [7] * 1000,
        "gaps": [i if i % 5 else None for i in range(1000)],
    }
    t = pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})
    p = tmp_path / "delta.parquet"
    pq.write_table(
        t, p, version="2.6", data_page_version="2.0", use_dictionary=False,
        column_encoding={k: "DELTA_BINARY_PACKED" for k in cols},
        compression="zstd", data_page_size=1024,
    )
    content = p.read_bytes()
    info = parquet_footer_parse(content)
    names = [n for n, _ in info["schema"]]
    for k, want in cols.items():
        got = parquet_column_read(content, names.index(k))
        assert got == want, k


def test_delta_byte_array_matches_pyarrow(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flock_spark.operators.formats import (
        parquet_column_read,
        parquet_footer_parse,
    )

    rng = random.Random(8)
    # heavy shared prefixes (the front-coding win) + multibyte chars so the
    # BYTE-level prefix arithmetic is exercised, + empty strings
    vals = sorted(
        f"prefix/common/päth_{rng.randint(0, 99)}/leaf{i}" for i in range(500)
    ) + ["", "z"]
    t = pa.table({"s": pa.array(vals, pa.utf8()),
                  "t": pa.array(vals[::-1], pa.utf8())})
    p = tmp_path / "dba.parquet"
    pq.write_table(t, p, version="2.6", data_page_version="2.0",
                   use_dictionary=False,
                   column_encoding={"s": "DELTA_BYTE_ARRAY",
                                    "t": "DELTA_LENGTH_BYTE_ARRAY"},
                   compression="zstd", data_page_size=1024)
    content = p.read_bytes()
    names = [n for n, _ in parquet_footer_parse(content)["schema"]]
    assert parquet_column_read(content, names.index("s")) == vals
    assert parquet_column_read(content, names.index("t")) == vals[::-1]


# ---------------------------------------------------------------------------
# Arrow IPC FILE format (footer random access)
# ---------------------------------------------------------------------------


def test_arrow_ipc_file_footer_random_access(tmp_path):
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from flock_spark.operators.arrow_ipc import arrow_ipc_file_read

    t = pa.table(
        {
            "x": pa.array(range(100), pa.int64()),
            "d": pa.array([f"v{i % 3}" for i in range(100)]).dictionary_encode(),
        }
    )
    p = tmp_path / "f.arrow"
    with ipc.new_file(p, t.schema) as w:
        for b in t.to_batches(max_chunksize=30):
            w.write_batch(b)
    data = p.read_bytes()
    fields, cols, blocks = arrow_ipc_file_read(data)
    assert cols["x"] == list(range(100))
    assert cols["d"] == [f"v{i % 3}" for i in range(100)]
    assert len(blocks) == 4  # 30+30+30+10
    # corrupting either magic must raise, never mis-walk
    with pytest.raises(ValueError, match="magic"):
        arrow_ipc_file_read(b"XXXXXX" + data[6:])
    with pytest.raises(ValueError, match="magic"):
        arrow_ipc_file_read(data[:-6] + b"XXXXXX")


def test_arrow_ipc_file_entry_last_block_is_real_tail(spark, sf_dir):
    rows = {r["col_name"]: r
            for r in REGISTRY["scan_arrow_ipc_file_walk"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"doc_id", "n_chars_gap", "source", "doc_id_last_block"}
    # the last block holds strictly fewer rows than the file and a
    # strictly larger mean doc_id (the file is doc_id-sorted)
    full, tail = rows["doc_id"], rows["doc_id_last_block"]
    assert 0 < tail["n_values"] < full["n_values"]
    assert tail["sum_v"] * full["n_values"] > full["sum_v"] * tail["n_values"]


# ---------------------------------------------------------------------------
# PageIndex pruning
# ---------------------------------------------------------------------------


def test_page_index_prune_skips_most_pages(spark, sf_dir):
    from flock_spark.operators.formats import (
        _stage_parquet_page_index,
        page_index_prune_read,
    )

    path = _stage_parquet_page_index(sf_dir)
    content = open(f"{path}/documents_pageindex.parquet", "rb").read()
    st = page_index_prune_read(content, 0, "INT64", True)
    # non-vacuity: pruning must actually elide I/O — the cutoff keeps the
    # top quarter of a sorted column, so at most ~30% of pages are touched
    assert st["n_pages_total"] >= 8
    assert st["n_pages_scanned"] < st["n_pages_total"] * 0.4, st
    assert st["n_selected"] > 0
    # a corrupted index (page max understated) must make pruning raise or
    # the oracle mismatch — simulate by checking a lying min/max raises
    import re

    bad = bytearray(content)
    # flip a byte inside the first ColumnIndex min binary is fiddly to
    # target generically; instead verify the decoded-vs-index guard by
    # corrupting a page BODY (the index then disagrees with the data)
    from flock_spark.operators.formats import parquet_page_index_read

    groups = parquet_page_index_read(content, 0)
    # pick a page that will be scanned (last page of last group)
    p = groups[-1]["pages"][-1]
    off = p["offset"] + p["size"] - 1
    bad[off] ^= 0xFF
    with pytest.raises(ValueError):
        page_index_prune_read(bytes(bad), 0, "INT64", True)


# ---------------------------------------------------------------------------
# ORC stripe reader
# ---------------------------------------------------------------------------


def test_orc_reader_matches_spark_writer_all_paths(spark, tmp_path):
    """Spark's own ORC writer is the reference encoder: a synthetic table
    shaped to force every decode path — RLEv2 short-repeat (constant),
    delta (monotone), direct (random), patched-base (outliers), PRESENT
    bitmaps (nulls), DIRECT_V2 and DICTIONARY_V2 strings."""
    import glob
    import random as _r

    from flock_spark.operators import orc_format as O

    rng = _r.Random(17)
    n = 2000
    rows = [
        (
            i,                                   # delta
            7,                                   # short repeat
            rng.randint(-(2**35), 2**35),        # direct (wide)
            (i % 50) if i % 97 else 2**45,       # patched base (outliers)
            None if i % 7 == 0 else i * 3,       # PRESENT stream
            f"free-text-{rng.randint(0, 10**9)}",  # DIRECT_V2
            f"cat{i % 5}",                       # DICTIONARY_V2
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "mono long, const long, wide long, outl long, gaps long, "
        "freeform string, cat string",
    ).coalesce(1)
    out = tmp_path / "orc_out"
    df.write.format("orc").save(str(out))
    content = open(glob.glob(str(out / "*.orc"))[0], "rb").read()
    O.STATS.clear()
    names, cols = O.orc_read_columns(content)
    want = list(zip(*rows))
    for name, col in zip(
        ("mono", "const", "wide", "outl", "gaps", "freeform", "cat"), want
    ):
        assert cols[name] == list(col), name
    # every decode path must have fired
    for key in ("rlev2_delta", "rlev2_short_repeat", "rlev2_direct",
                "rlev2_patched_base", "present_stream", "string_direct",
                "string_dictionary", "chunk_zstd"):
        assert O.STATS.get(key), f"path never exercised: {key}"


def test_orc_framing_violations_raise():
    from flock_spark.operators import orc_format as O

    with pytest.raises(ValueError, match="magic"):
        O.orc_read_columns(b"NOTORC" + b"\x00" * 40 + b"\x05")
    with pytest.raises(ValueError):
        O.pb_decode(b"\x80\x80\x80\x80\x80\x80\x80\x80\x80\x80\x80")
    # protobuf field 0 is reserved
    with pytest.raises(ValueError, match="reserved"):
        O.pb_decode(b"\x00\x01")


def test_orc_entry_fixture_gaps_and_dictionary(spark, sf_dir):
    rows = {r["col_name"]: r
            for r in REGISTRY["scan_orc_stripe_decode"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"doc_id", "n_chars_gap", "text", "source"}
    assert rows["n_chars_gap"]["n_nulls"] > 0
    assert rows["doc_id"]["n_nulls"] == 0


# ---------------------------------------------------------------------------
# Epoch shuffle audit + formats consensus
# ---------------------------------------------------------------------------


def test_epoch_shuffle_properties(spark, sf_dir):
    rows = {r["epoch"]: r
            for r in REGISTRY["corpus_epoch_shuffle_audit"].fn(spark, sf_dir).collect()}
    assert set(rows) == {0, 1, 2}
    n = rows[0]["n_docs"]
    digests = set()
    for e, r in rows.items():
        assert r["is_permutation"] == 1, e
        assert r["shard_imbalance"] <= 1, e
        digests.add(r["order_md5"])
        if e == 0:
            assert r["displacement_vs_e0"] == 0
        else:
            # genuinely decorrelated epochs displace far more than n
            assert r["displacement_vs_e0"] > n, (e, r["displacement_vs_e0"])
    assert len(digests) == 3  # three different orders


def test_formats_consensus_rows_agree(spark, sf_dir):
    rows = REGISTRY["scan_formats_consensus"].fn(spark, sf_dir).collect()
    assert {r["fmt"] for r in rows} == {"arrow", "orc", "parquet"}
    assert len({(r["n_rows"], r["doc_id_sum"], r["text_md5"],
                 r["source_md5"]) for r in rows}) == 1


def test_orc_reader_handles_multistripe_files(spark, tmp_path):
    """Spark won't split stripes at fixture scale (its writer batches 1024
    rows and only checks stripe bounds between batches), so the stripe
    LOOP is certified here: a 120k-row table written with a 64 KiB stripe
    size produces dozens of stripes, and every value must survive
    cross-stripe reassembly (per-stripe dictionaries and RLE runs reset)."""
    import glob

    from flock_spark.operators import orc_format as O

    n = 120_000
    df = spark.range(n).selectExpr(
        "id", "cast(id % 13 as string) cat"
    ).coalesce(1)
    out = tmp_path / "ms"
    (df.write.format("orc")
       .option("orc.stripe.size", 65536)
       .option("orc.rows.between.memory.checks", 512)
       .save(str(out)))
    content = open(glob.glob(str(out / "*.orc"))[0], "rb").read()
    ps = O.pb_decode(content[len(content) - 1 - content[-1] : -1])
    footer = O.pb_decode(
        O.orc_chunks_decompress(
            content[len(content) - 1 - content[-1] - ps[1][0]:
                    len(content) - 1 - content[-1]], ps[2][0]))
    assert len(footer[3]) >= 5, f"only {len(footer[3])} stripes"
    names, cols = O.orc_read_columns(content)
    assert cols["id"] == list(range(n))
    assert cols["cat"] == [str(i % 13) for i in range(n)]


# ---------------------------------------------------------------------------
# bzip2: fifth compression family
# ---------------------------------------------------------------------------


def test_bzip2_roundtrip_against_stdlib_all_levels():
    import bz2

    from flock_spark.operators.multimodal import bzip2_decompress

    rng = random.Random(21)
    words = [f"w{i}" for i in range(80)]
    payloads = [b"a", b"hello world", b"x" * 1000, rng.randbytes(5000),
                " ".join(rng.choice(words) for _ in range(20000)).encode(),
                b"aaaabbbbccccdddd" * 500, bytes(range(256)) * 40,
                # level-1 blocks hold 100k post-RLE1 bytes: this payload
                # spans several blocks, exercising the combined CRC
                " ".join(rng.choice(words) for _ in range(300000)).encode()]
    for lvl in (1, 5, 9):
        for p in payloads:
            assert bzip2_decompress(bz2.compress(p, lvl)) == p, (lvl, len(p))


def test_bzip2_violations_raise():
    import bz2

    from flock_spark.operators.multimodal import bzip2_decompress

    comp = bz2.compress(b"corruption target " * 100, 1)
    with pytest.raises(ValueError, match="BZh"):
        bzip2_decompress(b"NOPE" + comp[4:])
    # a flipped bit mid-stream must fail a CRC (or framing), never pass
    bad = bytearray(comp)
    bad[len(bad) // 2] ^= 0x10
    with pytest.raises(ValueError):
        bzip2_decompress(bytes(bad))
    # truncated stream
    with pytest.raises(ValueError):
        bzip2_decompress(comp[: len(comp) // 2])


def test_bzip2_multistream_and_trailing():
    import bz2

    from flock_spark.operators.multimodal import bzip2_decompress

    parts = [b"first stream ", b"second stream ", b"third " * 100]
    multi = b"".join(bz2.compress(p, 1) for p in parts)
    # the Wikipedia multistream layout: byte-aligned concatenated streams
    assert bzip2_decompress(multi) == b"".join(parts)
    assert bz2.decompress(multi) == b"".join(parts)  # stdlib agrees
    with pytest.raises(ValueError, match="trailing"):
        bzip2_decompress(bz2.compress(b"x", 1) + b"JUNK")
