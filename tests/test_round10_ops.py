"""Round-10 operator tests: WARC record layer, boilerplate line filter.

Fixture discipline matches tests/test_round9b_ops.py: every parser is
exercised against (a) its own builder, (b) a hand-typed literal construction
it shares no code with, and (c) corrupted variants that must raise clear
ValueErrors at the exact violated layer.
"""

from __future__ import annotations

import pytest

from flock_spark.operators.multimodal import (
    gzip_multistream_walk,
    http_response_parse,
    warc_gz_build,
    warc_record_build,
    warc_record_parse,
)


# ---------------------------------------------------------------------------
# WARC record parse
# ---------------------------------------------------------------------------


def test_warc_roundtrip_through_own_builder():
    rec = warc_record_build(
        "response", "<urn:uuid:42>", b"hello block",
        extra=[("WARC-Target-URI", "http://x/y")],
    )
    fields, block = warc_record_parse(rec)
    assert fields["warc-type"] == "response"
    assert fields["warc-record-id"] == "<urn:uuid:42>"
    assert fields["warc-target-uri"] == "http://x/y"
    assert fields["content-length"] == "11"
    assert block == b"hello block"


def test_warc_parses_hand_typed_literal():
    """A record typed out byte-for-byte from the ISO 28500 grammar — shares
    nothing with warc_record_build, so a builder/parser co-bug cannot hide."""
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Record-ID: <urn:uuid:lit>\r\n"
        b"WARC-Date: 2019-06-01T00:00:00Z\r\n"
        b"Content-Length: 5\r\n"
        b"\r\n"
        b"abcde"
        b"\r\n\r\n"
    )
    fields, block = warc_record_parse(rec)
    assert fields["warc-type"] == "metadata"
    assert block == b"abcde"


def test_warc_content_length_frames_block_not_delimiters():
    """The block itself contains CRLF CRLF — octet framing must carry the
    parser past it; delimiter scanning would truncate at the embedded pair."""
    tricky = b"part1\r\n\r\npart2"
    rec = warc_record_build("resource", "<urn:uuid:t>", tricky)
    _, block = warc_record_parse(rec)
    assert block == tricky


def test_warc_rejects_violations_at_each_layer():
    good = warc_record_build("response", "<urn:uuid:x>", b"0123456789")
    with pytest.raises(ValueError, match="version"):
        warc_record_parse(good.replace(b"WARC/1.0", b"WARC/9.9", 1))
    with pytest.raises(ValueError, match="truncated WARC block"):
        warc_record_parse(good[:-7])  # cut into the block
    with pytest.raises(ValueError, match="terminator"):
        warc_record_parse(good[:-1])  # cut into the closing CRLF CRLF
    with pytest.raises(ValueError, match="duplicate"):
        warc_record_parse(
            good.replace(
                b"WARC-Type: response\r\n",
                b"WARC-Type: response\r\nWARC-Type: request\r\n",
                1,
            )
        )
    with pytest.raises(ValueError, match="missing mandatory"):
        warc_record_parse(good.replace(b"WARC-Record-ID", b"X-Record-ID", 1))
    with pytest.raises(ValueError, match="malformed WARC header"):
        warc_record_parse(
            good.replace(b"WARC-Date: ", b"WARC-Date ", 1)  # no colon
        )


def test_http_response_parse_and_rejections():
    block = (
        b"HTTP/1.1 404 Not Found\r\n"
        b"Content-Type: text/html\r\n"
        b"Content-Length: 9\r\n"
        b"\r\n"
        b"not found"
    )
    status, headers, body = http_response_parse(block)
    assert status == 404
    assert headers["content-type"] == "text/html"
    assert body == b"not found"
    with pytest.raises(ValueError, match="status line"):
        http_response_parse(b"ICY 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        http_response_parse(b"HTTP/1.1 200 OK\r\n\r\nbody")
    with pytest.raises(ValueError, match="body length"):
        http_response_parse(block[:-1])


def test_warc_gz_archive_walks_to_three_typed_records():
    archive = warc_gz_build(7, "http://example.com/doc_7", b"the doc body")
    members = gzip_multistream_walk(archive)
    assert len(members) == 3
    parsed = [warc_record_parse(m[2]) for m in members]
    assert [f["warc-type"] for f, _ in parsed] == [
        "warcinfo", "request", "response",
    ]
    status, _, body = http_response_parse(parsed[2][1])
    assert (status, body) == (200, b"the doc body")
    # request record carries the target URI; warcinfo does not
    assert parsed[1][0]["warc-target-uri"] == "http://example.com/doc_7"
    assert "warc-target-uri" not in parsed[0][0]


# ---------------------------------------------------------------------------
# Boilerplate line filter
# ---------------------------------------------------------------------------


def test_boilerplate_filter_drops_and_keeps_nonvacuously(spark, sf_dir):
    from flock_spark.registry import REGISTRY

    rows = REGISTRY["text_boilerplate_linefilter"].fn(spark, sf_dir).collect()
    assert rows
    # every page has its synthetic chrome: the 9-token header chunks into
    # two lines (8 + 1, both link-heavy), the footer into one, plus the
    # sidebar on odd doc_ids — all must fall to the LINK gate
    for r in rows:
        assert r["n_dropped_link"] == 3 + (r["doc_id"] % 2)
        assert r["n_lines"] == (
            r["n_dropped_link"] + r["n_dropped_lowstop"] + r["n_kept"]
        )
    # the stopword gate must really fire on CONTENT lines somewhere, and
    # real content must also survive somewhere — a vacuous classifier
    # (all-keep or all-drop) fails here
    assert any(r["n_dropped_lowstop"] > 0 for r in rows)
    assert any(r["n_kept"] > 0 for r in rows)
    assert any(r["kept_chars"] > 0 for r in rows)


def test_boilerplate_filter_matches_python_replay(spark, sf_dir):
    """Replay the classifier in plain Python for every document and demand
    identical verdict counts and identical kept-text digest."""
    import hashlib

    import duckdb

    from flock_spark.operators.text import (
        _BOILER_FOOTER,
        _BOILER_HEADER,
        _BOILER_SIDEBAR,
        BOILER_LINE_W,
    )
    from flock_spark.registry import REGISTRY

    got = {
        r["doc_id"]: r
        for r in REGISTRY["text_boilerplate_linefilter"].fn(spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    for doc_id, text in docs:
        parts = [(0, _BOILER_HEADER), (1, text), (2, _BOILER_FOOTER)]
        if doc_id % 2 == 1:
            parts.append((3, _BOILER_SIDEBAR))
        lines = []  # (part, line_no, line, verdict)
        for part, ptext in parts:
            words = ptext.split(" ")
            for ln in range(0, len(words), BOILER_LINE_W):
                chunk = words[ln : ln + BOILER_LINE_W]
                n_link = sum(w in ("<a>", "</a>") for w in chunk)
                n_stop = sum(w in ("a", "the") for w in chunk)
                verdict = (
                    "link" if 2 * n_link >= len(chunk)
                    else "lowstop" if n_stop == 0
                    else "keep"
                )
                lines.append((part, ln // BOILER_LINE_W, " ".join(chunk), verdict))
        kept = [l[2] for l in sorted(lines) if l[3] == "keep"]
        r = got[doc_id]
        assert r["n_lines"] == len(lines)
        assert r["n_kept"] == len(kept)
        assert r["kept_chars"] == sum(len(k) for k in kept)
        assert r["kept_md5"] == hashlib.md5("\n".join(kept).encode()).hexdigest()


# ---------------------------------------------------------------------------
# Baseline JPEG codec
# ---------------------------------------------------------------------------


def test_jpeg_entropy_layer_roundtrips_handbuilt_blocks():
    """Drive the run/size alphabet directly: EOB, ZRL chains (62-zero run),
    negatives, the DC prediction chain, and the category-10 edge."""
    from flock_spark.operators.multimodal import (
        _AC_BITS, _AC_VALS, _DC_BITS, _DC_VALS,
        _huff_decode_map, jpeg_decode_ecs, jpeg_encode_ecs,
    )

    dc = _huff_decode_map(_DC_BITS, _DC_VALS)
    ac = _huff_decode_map(_AC_BITS, _AC_VALS)
    blocks = [
        [5] + [0] * 62 + [3],            # 3 ZRLs then (14,2)
        [-9] + [0] * 63,                  # EOB immediately, negative DC diff
        [100, -1, 2, 0, 0, -3] + [0] * 58,
        [0] * 64,                         # zero block: diff 0 + EOB
        [7] + [1023, -1023] + [0] * 61,   # category-10 AC extremes
    ]
    ecs = jpeg_encode_ecs(blocks)
    out, end = jpeg_decode_ecs(ecs, 0, len(blocks), dc, ac)
    assert out == blocks
    assert end == len(ecs)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="category 10"):
        jpeg_encode_ecs([[0] + [1024] + [0] * 62])


def test_jpeg_full_stream_coefficient_lossless_and_pixels():
    """Encode a rich random image; the decoder (which rebuilds all tables
    from the stream) must recover the quantized coefficients exactly, and
    its pixels must equal an independent numpy dequant+IDCT replay."""
    import math

    import numpy as np

    from flock_spark.operators.multimodal import (
        _JPEG_QTABLE, _ZIGZAG, _dct_basis,
        jpeg_decode_baseline, jpeg_encode_baseline,
    )

    rng = np.random.RandomState(3)
    grid = rng.randint(0, 256, (16, 24)).astype(np.uint8)
    data = jpeg_encode_baseline(grid, np)
    dec, blocks = jpeg_decode_baseline(data, np)
    assert dec.shape == (16, 24)
    assert len(blocks) == 6
    C = _dct_basis(np)
    bi = 0
    for by in range(0, 16, 8):
        for bx in range(0, 24, 8):
            b = grid[by : by + 8, bx : bx + 8].astype(float) - 128.0
            coef = C @ b @ C.T
            coef[0, 0] = float(int(b.sum())) / 8.0
            want = [
                int(math.floor(coef[z // 8, z % 8] / _JPEG_QTABLE[i] + 0.5))
                for i, z in enumerate(_ZIGZAG)
            ]
            assert blocks[bi] == want, f"block {bi} coefficients diverge"
            cm = np.zeros((8, 8))
            for i, z in enumerate(_ZIGZAG):
                cm[z // 8, z % 8] = want[i] * _JPEG_QTABLE[i]
            pix = C.T @ cm @ C
            for i in range(8):
                for j in range(8):
                    assert dec[by + i, bx + j] == min(
                        255, max(0, int(math.floor(pix[i, j] + 128.5)))
                    )
            bi += 1


def test_jpeg_byte_stuffing_occurs_and_roundtrips():
    """Find a seed whose entropy segment contains a stuffed FF 00 — proving
    the writer emits 0xFF bytes and the reader unstuffs them."""
    import numpy as np

    from flock_spark.operators.multimodal import (
        jpeg_decode_baseline, jpeg_encode_baseline,
    )

    for seed in range(64):
        grid = (
            np.random.RandomState(seed).randint(0, 256, (16, 16)).astype(np.uint8)
        )
        data = jpeg_encode_baseline(grid, np)
        sos = data.find(b"\xff\xda")
        ecs = data[sos + 2 + int.from_bytes(data[sos + 2 : sos + 4], "big") : -2]
        if b"\xff\x00" in ecs:
            jpeg_decode_baseline(data, np)  # must not raise
            return
    pytest.fail("no seed produced a stuffed byte in 64 tries")


def test_jpeg_constant_block_closed_form_all_values():
    import numpy as np

    from flock_spark.operators.multimodal import (
        jpeg_decode_baseline, jpeg_encode_baseline,
    )

    for v in range(0, 256, 7):
        g = np.full((8, 8), v, dtype=np.uint8)
        dec, _ = jpeg_decode_baseline(jpeg_encode_baseline(g, np), np)
        expect = min(255, max(0, 2 * ((v + 129) // 2) - 128))
        assert set(dec.flatten().tolist()) == {expect}, f"v={v}"


def test_jpeg_decoder_rejects_malformed_streams():
    import numpy as np

    from flock_spark.operators.multimodal import (
        jpeg_decode_baseline, jpeg_encode_baseline,
    )

    grid = np.full((8, 8), 99, dtype=np.uint8)
    good = jpeg_encode_baseline(grid, np)
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode_baseline(b"\xff\xd9" + good[2:], np)
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode_baseline(good.replace(b"\xff\xc0", b"\xff\xc2", 1), np)
    with pytest.raises(ValueError, match="EOI|entropy"):
        jpeg_decode_baseline(good[:-4], np)  # cut into ECS + EOI
    # a marker byte planted inside the entropy segment must be caught
    sos = good.find(b"\xff\xda")
    ecs_start = sos + 2 + int.from_bytes(good[sos + 2 : sos + 4], "big")
    bad = good[:ecs_start] + b"\xff\xd4" + good[ecs_start:]
    with pytest.raises(ValueError, match="marker FFD4|invalid Huffman"):
        jpeg_decode_baseline(bad, np)


# ---------------------------------------------------------------------------
# Thrift compact protocol + parquet footer walk
# ---------------------------------------------------------------------------


def test_thrift_compact_reader_on_hand_built_bytes():
    """Hand-encoded compact-protocol struct, written out byte by byte from
    the public spec — field deltas, zigzag varints, a nested struct, a
    string list — with nothing shared with any writer."""
    from flock_spark.operators.formats import thrift_read_struct

    buf = bytes(
        [
            0x15,        # field 1, type 5 (i32)
            0x54,        # zigzag(42)
            0x28,        # field 3 (delta 2 from 1... delta=2? 0x28 = delta 2, type 8 binary)
            0x02, 0x68, 0x69,  # len 2, "hi"
            0x1C,        # field 4, type 12 (struct)
            0x16,        # inner field 1, i64
            0x03,        # zigzag(-2)
            0x00,        # inner STOP
            0x19,        # field 5, type 9 (list)
            0x28,        # 2 elements, type 8 (binary)
            0x01, 0x61,  # "a"
            0x01, 0x62,  # "b"
            0x00,        # STOP
        ]
    )
    fields, end = thrift_read_struct(buf, 0)
    assert end == len(buf)
    assert fields[1] == 42
    assert fields[3] == b"hi"
    assert fields[4] == {1: -2}
    assert fields[5] == [b"a", b"b"]


def test_thrift_reader_rejects_truncation():
    from flock_spark.operators.formats import thrift_read_struct

    with pytest.raises(ValueError, match="STOP|past end"):
        thrift_read_struct(bytes([0x15, 0x54]), 0)  # no STOP
    with pytest.raises(ValueError, match="varint"):
        thrift_read_struct(bytes([0x15, 0x80]), 0)  # unterminated varint
    with pytest.raises(ValueError, match="binary value past end"):
        thrift_read_struct(bytes([0x18, 0x10, 0x61, 0x00]), 0)


def test_parquet_footer_parse_matches_duckdb_metadata(sf_dir):
    """The decisive independence check: the from-spec walk must agree with
    DuckDB's own parquet reader on every chunk's fields and statistics."""
    import duckdb

    from flock_spark.operators.formats import parquet_footer_parse

    path = f"{sf_dir}/documents.parquet"
    info = parquet_footer_parse(open(path, "rb").read())
    meta = duckdb.sql(
        f"""SELECT row_group_id, path_in_schema, num_values,
                   stats_min_value, stats_max_value, compression
            FROM parquet_metadata('{path}')
            ORDER BY row_group_id, column_id"""
    ).fetchall()
    mine = [
        (gi, cc["path"], cc["num_values"], cc["stat_min"], cc["stat_max"],
         cc["codec"])
        for gi, rg in enumerate(info["row_groups"])
        for cc in rg["columns"]
    ]
    assert mine == [tuple(r) for r in meta]
    nrows = duckdb.sql(f"SELECT count(*) FROM '{path}'").fetchone()[0]
    assert info["num_rows"] == nrows


def test_parquet_footer_rejects_corruption():
    from flock_spark.operators.formats import parquet_footer_parse

    path = "/root/testdata/sf0.001/documents.parquet"
    content = open(path, "rb").read()
    with pytest.raises(ValueError, match="magic"):
        parquet_footer_parse(content[:-4] + b"XXXX")
    with pytest.raises(ValueError, match="magic"):
        parquet_footer_parse(b"X" + content[1:])
    bad_len = content[:-8] + (2**30).to_bytes(4, "little") + b"PAR1"
    with pytest.raises(ValueError, match="footer length"):
        parquet_footer_parse(bad_len)


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank
# ---------------------------------------------------------------------------


def test_wilcoxon_matches_direct_replay_and_partition_identity(spark, sf_dir):
    import duckdb

    from flock_spark.queries.analytics import KS_A, KS_B
    from flock_spark.registry import REGISTRY

    r = REGISTRY["analytics_wilcoxon_signed_rank"].fn(spark, sf_dir).collect()[0]
    n = r["n_nonzero"]
    assert r["w2_pos"] + r["w2_neg"] == n * (n + 1)
    # sequential textbook replay: per-user diffs, tie-averaged doubled ranks
    rows = duckdb.sql(
        f"""SELECT user_id,
                   sum(CASE WHEN event_type = '{KS_A}'
                            THEN CAST(floor(value*100) AS BIGINT) ELSE 0 END)
                   - sum(CASE WHEN event_type = '{KS_B}'
                              THEN CAST(floor(value*100) AS BIGINT) ELSE 0 END)
            FROM '{sf_dir}/events.parquet'
            WHERE event_type IN ('{KS_A}','{KS_B}') AND value IS NOT NULL
            GROUP BY user_id"""
    ).fetchall()
    diffs = [d for _, d in rows]
    nz = sorted((abs(d), d > 0) for d in diffs if d != 0)
    import bisect

    mags = [m for m, _ in nz]
    w2p = w2n = 0
    for m, pos in nz:
        lo = bisect.bisect_left(mags, m)
        hi = bisect.bisect_right(mags, m)
        r2 = (lo + 1) + hi  # doubled tie-averaged rank
        if pos:
            w2p += r2
        else:
            w2n += r2
    assert (r["n_nonzero"], r["n_zero"]) == (len(nz), len(diffs) - len(nz))
    assert (r["w2_pos"], r["w2_neg"]) == (w2p, w2n)
    assert r["w_pos_share_bp"] == w2p * 10000 // (len(nz) * (len(nz) + 1))


# ---------------------------------------------------------------------------
# Robots Exclusion Protocol (RFC 9309)
# ---------------------------------------------------------------------------


def test_rep_path_match_rfc_examples():
    """Matching examples from RFC 9309 §2.2.3 / the REP documentation."""
    from flock_spark.operators.text import rep_path_match

    assert rep_path_match("/", "/anything")
    assert rep_path_match("/fish", "/fish.html")
    assert rep_path_match("/fish", "/fishheads/yummy.html")
    assert not rep_path_match("/fish", "/Fish.asp")  # octet-exact
    assert rep_path_match("/fish*", "/fish/salmon.html")
    assert rep_path_match("/*.php", "/index.php")
    assert rep_path_match("/*.php", "/folder/any.php.file.html")
    assert not rep_path_match("/*.php", "/index.html")
    assert rep_path_match("/*.php$", "/folder/filename.php")
    assert not rep_path_match("/*.php$", "/filename.php?parameters")
    assert not rep_path_match("/*.php$", "/filename.php5")
    assert rep_path_match("/fish*.php", "/fishheads/catfish.php?parameters")
    assert rep_path_match("/x*$", "/x/anything")  # trailing *$ consumes rest
    assert rep_path_match("/exact$", "/exact")
    assert not rep_path_match("/exact$", "/exactly")
    # anchored patterns whose final literal segment ALSO occurs earlier in
    # the path: the matcher must anchor the last segment at the END, not
    # commit to its leftmost occurrence (r10 advisory)
    assert rep_path_match("/a*b$", "/aXbYb")
    assert rep_path_match("/*.php$", "/a.php.php")
    assert rep_path_match("/a*bc*c$", "/abcc")
    assert not rep_path_match("/a*b*b$", "/ab")  # needs two disjoint b's
    assert rep_path_match("/a*b*b$", "/abb")
    assert not rep_path_match("/a*bb$", "/aXbYb")  # end is 'Yb', not 'bb'


def test_rep_decision_longest_match_and_allow_tie():
    from flock_spark.operators.text import rep_decision

    rules = [("/p", "allow"), ("/", "disallow")]
    assert rep_decision(rules, "/page")[2] is True
    rules = [("/folder", "allow"), ("/folder", "disallow")]
    assert rep_decision(rules, "/folder/page")[2] is True  # tie -> allow
    rules = [("/page", "allow"), ("/*.htm", "disallow")]
    assert rep_decision(rules, "/page")[2] is True  # 5 > 5? no: longest tie
    rules = [("/", "allow"), ("/admin", "disallow")]
    assert rep_decision(rules, "/admin/db")[2] is False
    assert rep_decision([], "/anything")[2] is True  # implicit allow


def test_robots_entry_matches_python_decision_replay(spark, sf_dir):
    from flock_spark.operators.text import ROBOTS_RULES, rep_decision
    from flock_spark.registry import REGISTRY

    rows = REGISTRY["text_robots_longest_match"].fn(spark, sf_dir).collect()
    assert rows
    seen_disallow = seen_tie = False
    for r in rows:
        rule, verdict, allowed = rep_decision(ROBOTS_RULES, r["url"])
        assert r["match_rule"] == rule, r
        assert bool(r["allowed"]) == allowed, r
        assert r["rule_len"] == len(rule)
        if not allowed:
            seen_disallow = True
        if rule == "/doc_7":
            assert allowed  # the duplicate-rule tie resolved to allow
            seen_tie = True
    assert seen_disallow and seen_tie


# ---------------------------------------------------------------------------
# Snappy + parquet page decode
# ---------------------------------------------------------------------------


def test_snappy_decompress_hand_built_streams():
    """Hand-assembled snappy elements from the public format description:
    short literal, long literal (1-byte length), 11-bit-offset copy,
    2-byte-offset copy, and an overlapping RLE-style copy."""
    from flock_spark.operators.formats import snappy_decompress

    # literal "abc" -> tag (3-1)<<2 | 00
    assert snappy_decompress(bytes([3, (2 << 2), 97, 98, 99])) == b"abc"
    # 70-byte literal: tag 60<<2, one length byte 69
    body = bytes(range(70))
    assert snappy_decompress(bytes([70, (60 << 2), 69]) + body) == body
    # "ab" + copy1(len 4, off 2) -> "ababab"
    s = bytes([6, (1 << 2), 97, 98, 0b000_000_01, 2])
    assert snappy_decompress(s) == b"ababab"
    # copy2: "x" + 8 copies of it via offset 1 (overlapping run)
    s = bytes([9, (0 << 2), 120, ((8 - 1) << 2) | 2, 1, 0])
    assert snappy_decompress(s) == b"x" * 9
    with pytest.raises(ValueError, match="offset"):
        snappy_decompress(bytes([5, (0 << 2), 97, 0b000_000_01, 9]))
    with pytest.raises(ValueError, match="length"):
        snappy_decompress(bytes([9, (2 << 2), 97, 98, 99]))


def test_rle_bp_hybrid_decoder():
    from flock_spark.operators.formats import rle_bp_decode

    # RLE run: header 500<<1, width 1 byte, value 7
    vals, _ = rle_bp_decode(bytes([0xE8, 0x07, 0x07]), 0, 3, 500)
    assert vals == [7] * 500
    # bit-packed: 1 group of 8 3-bit values 0..7 packed LSB-first
    packed = 0
    for i, v in enumerate(range(8)):
        packed |= v << (3 * i)
    buf = bytes([0x03]) + packed.to_bytes(3, "little")
    vals, _ = rle_bp_decode(buf, 0, 3, 8)
    assert vals == list(range(8))


def test_parquet_column_read_matches_duckdb_all_columns(sf_dir):
    """Decode EVERY column of the real file — INT64 and BYTE_ARRAY,
    dictionary pages, definition levels — and demand cell-exact equality
    with DuckDB's own reader in file order."""
    import duckdb

    from flock_spark.operators.formats import parquet_column_read

    path = f"{sf_dir}/documents.parquet"
    content = open(path, "rb").read()
    expected = duckdb.sql(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{path}'"
    ).fetchall()
    cols = list(zip(*expected))
    for i, name in enumerate(["doc_id", "text", "lang", "source", "n_chars"]):
        mine = parquet_column_read(content, i)
        assert mine == list(cols[i]), f"column {name} diverges"


# ---------------------------------------------------------------------------
# Friedman test
# ---------------------------------------------------------------------------


def test_friedman_matches_sequential_replay(spark, sf_dir):
    import duckdb

    from flock_spark.registry import REGISTRY, _load_all

    _load_all()
    r = REGISTRY["analytics_friedman_test"].fn(spark, sf_dir).collect()[0]
    k = r["k_types"]
    assert k == 5
    # partition identity: within-block doubled ranks always sum to k(k+1)
    assert r["r2_total"] == r["n_users"] * k * (k + 1)
    assert r["r2_total"] == sum(
        r[f"r2_{t}"] for t in ("click", "error", "purchase", "signup", "view")
    )
    # textbook replay: rank each user's per-type cents, tie-averaged
    rows = duckdb.sql(
        f"""SELECT user_id, event_type,
                   sum(CAST(floor(value*100) AS BIGINT))
            FROM '{sf_dir}/events.parquet'
            WHERE value IS NOT NULL GROUP BY user_id, event_type"""
    ).fetchall()
    by_user: dict = {}
    for u, t, c in rows:
        by_user.setdefault(u, {})[t] = c
    r2 = {t: 0 for t in ("click", "error", "purchase", "signup", "view")}
    n = 0
    for u, d in by_user.items():
        if len(d) != 5:
            continue
        n += 1
        vals = sorted(d.values())
        for t, c in d.items():
            lo = vals.index(c)
            hi = len(vals) - vals[::-1].index(c)
            r2[t] += (lo + 1) + hi  # doubled tie-averaged rank
    assert r["n_users"] == n
    for t, s in r2.items():
        assert r[f"r2_{t}"] == s, t
    sq = sum(s * s for s in r2.values())
    q_milli = (3 * sq - 3 * n * n * 5 * 36) * 1000 // (n * 5 * 6)
    assert r["q_milli"] == q_milli
    assert r["q_milli"] >= 0


# ---------------------------------------------------------------------------
# HTTP chunked transfer coding
# ---------------------------------------------------------------------------


def test_http_chunked_roundtrip_and_hand_typed_stream():
    from flock_spark.operators.multimodal import (
        http_chunked_build,
        http_chunked_decode,
    )

    body = bytes(range(256)) * 3
    coded = http_chunked_build(body)
    out, n, trailers = http_chunked_decode(coded)
    assert out == body
    assert n == (len(body) + 99) // 100
    import hashlib

    assert trailers["x-body-md5"] == hashlib.md5(body).hexdigest()
    # hand-typed stream straight from the RFC 9112 grammar (wikipedia-style
    # example): sizes in hex, an ignored extension, trailers absent
    rec = (
        b"4\r\nWiki\r\n"
        b"7;ext=\"quoted\"\r\npedia i\r\n"
        b"B\r\nn \r\nchunks.\r\n"
        b"0\r\n"
        b"\r\n"
    )
    out, n, trailers = http_chunked_decode(rec)
    assert out == b"Wikipedia in \r\nchunks."
    assert n == 3 and trailers == {}


def test_http_chunked_rejects_framing_violations():
    from flock_spark.operators.multimodal import (
        http_chunked_build,
        http_chunked_decode,
    )

    good = http_chunked_build(b"x" * 150)
    with pytest.raises(ValueError, match="truncated chunk"):
        http_chunked_decode(good[:80])
    with pytest.raises(ValueError, match="bad chunk size"):
        http_chunked_decode(b"zz\r\nabc\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="missing CRLF"):
        http_chunked_decode(b"3\r\nabcXX0\r\n\r\n")
    with pytest.raises(ValueError, match="unterminated trailer|unterminated chunk"):
        http_chunked_decode(b"3\r\nabc\r\n0\r\n")  # no trailer terminator
    with pytest.raises(ValueError, match="after chunked body end"):
        http_chunked_decode(good + b"junk")
    # exact-multiple body: the 0-chunk must still terminate cleanly
    exact = http_chunked_build(b"y" * 200)
    out, n, _ = http_chunked_decode(exact)
    assert out == b"y" * 200 and n == 2


def test_parquet_column_read_multi_rowgroup_nulls_and_plain(tmp_path):
    """Harden the reader against layouts the testdata doesn't exercise:
    multiple row groups, nulls (definition level 0), dictionary DISABLED
    (pure PLAIN data pages), and uncompressed pages — all written by
    pyarrow, the independent writer."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from flock_spark.operators.formats import parquet_column_read

    ids = list(range(100))
    vals = [None if i % 7 == 0 else i * 3 for i in ids]
    names = [None if i % 11 == 0 else f"n{i}" for i in ids]
    table = pa.table(
        {"id": pa.array(ids, pa.int64()),
         "v": pa.array(vals, pa.int64()),
         "name": pa.array(names, pa.string())}
    )
    for use_dict, comp in ((False, "snappy"), (True, "none"), (False, "none")):
        path = tmp_path / f"f_{use_dict}_{comp}.parquet"
        pq.write_table(
            table, path, row_group_size=30, use_dictionary=use_dict,
            compression=comp,
        )
        content = path.read_bytes()
        assert parquet_column_read(content, 0) == ids, (use_dict, comp)
        assert parquet_column_read(content, 1) == vals, (use_dict, comp)
        assert parquet_column_read(content, 2) == names, (use_dict, comp)


def test_http_response_parse_any_both_framings():
    from flock_spark.operators.multimodal import (
        http_chunked_build,
        http_response_parse_any,
    )

    body = b"framed either way"
    cl = (
        b"HTTP/1.1 200 OK\r\nContent-Length: 17\r\n\r\n" + body
    )
    assert http_response_parse_any(cl)[2] == body
    ch = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        + http_chunked_build(body)
    )
    assert http_response_parse_any(ch)[2] == body
    with pytest.raises(ValueError, match="framing"):
        http_response_parse_any(b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nbody")
    # corrupted trailer digest must be caught
    bad = ch.replace(b"X-Body-MD5: ", b"X-Body-MD5: 0", 1)
    with pytest.raises(ValueError, match="digest"):
        http_response_parse_any(bad)


def test_wet_conversion_roundtrip_entry(spark, sf_dir):
    from flock_spark.registry import REGISTRY, _load_all

    _load_all()
    rows = REGISTRY["mm_wet_conversion_roundtrip"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows[:20]:
        # the WET record length formula: 216 fixed octets + digit widths
        assert r["wet_record_len"] == (
            216 + len(str(r["doc_id"])) + len(str(r["body_len"])) + r["body_len"]
        )
        assert r["n_chunks"] == (r["body_len"] + 99) // 100
