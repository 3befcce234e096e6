"""Round-11 additions: file-true WARC ingestion, wildcard robots rules as
data, and the LIKE-lowering that carries RFC 9309 '*'/'$' semantics into the
relational path."""

from __future__ import annotations

import gzip
import os

import pytest


# ---------------------------------------------------------------------------
# rep_like_pattern: RFC 9309 pattern -> SQL LIKE lowering
# ---------------------------------------------------------------------------


def test_rep_like_pattern_lowering():
    from flock_spark.operators.text import rep_like_pattern

    assert rep_like_pattern("/fish") == "/fish%"
    assert rep_like_pattern("/fish*") == "/fish%%"
    assert rep_like_pattern("/*.php$") == "/%.php"
    assert rep_like_pattern("/x*$") == "/x%"
    assert rep_like_pattern("/exact$") == "/exact"
    # LIKE metacharacters in the literal part must be escaped
    assert rep_like_pattern("/doc_1") == "/doc!_1%"
    assert rep_like_pattern("/a%b$") == "/a!%b"
    assert rep_like_pattern("/a!b") == "/a!!b%"


def test_rep_like_pattern_agrees_with_rep_path_match(spark):
    """The LIKE lowering and the Python matcher must agree verdict-for-
    verdict over a pattern x path grid that exercises '*', '$', both, and
    the metachar-escape path (URLs contain '_', a LIKE metachar)."""
    from pyspark.sql import functions as F

    from flock_spark.operators.text import rep_like_pattern, rep_path_match

    patterns = [
        "/", "/doc_", "/doc_1", "/doc_*1", "/doc_*1$", "/doc_1*", "/a*b$",
        "/*.php$", "/*.php", "/doc_2*7$", "/doc_44*$", "/exact$", "/a*b*b$",
    ]
    paths = [
        "/doc_1", "/doc_12", "/doc_21", "/doc_217", "/doc_44", "/doc_441",
        "/a.php.php", "/aXbYb", "/abb", "/ab", "/exact", "/exactly",
        "/index.php", "/doc_7", "/doc_107",
    ]
    rows = [(p, q) for p in patterns for q in paths]
    # build the LIKE patterns driver-side (they are literals in the real
    # entry too) and evaluate via one SQL projection
    lowered = [(p, q, rep_like_pattern(p)) for p, q in rows]
    df = spark.createDataFrame(
        lowered, "pattern string, path string, like_pat string"
    )
    for r in df.select(
        "pattern",
        "path",
        F.expr("path LIKE like_pat ESCAPE '!'").alias("m"),
    ).collect():
        assert bool(r["m"]) == rep_path_match(r["pattern"], r["path"]), (
            r["pattern"],
            r["path"],
        )


# ---------------------------------------------------------------------------
# text_robots_wildcard_match: wildcard rules decide real verdicts
# ---------------------------------------------------------------------------


def test_robots_wildcard_entry_replay(spark, sf_dir):
    """Every verdict the relational entry emits must equal the Python
    rep_decision replay over the same rule set, and the slate of winners
    must include at least one '*' rule and one '$' rule (the point of the
    entry: wildcard rules deciding real verdicts, not just test-pinned)."""
    from flock_spark.operators.text import ROBOTS_WILD_RULES, rep_decision
    from flock_spark.registry import REGISTRY, _load_all

    _load_all()
    rows = REGISTRY["text_robots_wildcard_match"].fn(spark, sf_dir).collect()
    assert rows
    seen_star = seen_anchor = seen_disallow = False
    for r in rows:
        rule, verdict, allowed = rep_decision(ROBOTS_WILD_RULES, r["url"])
        assert r["match_rule"] == rule, (r, rule)
        assert bool(r["allowed"]) == allowed, (r, verdict)
        core = rule[:-1] if rule.endswith("$") else rule
        assert r["rule_len"] == len(core), (r, rule)
        if "*" in rule:
            seen_star = True
        if rule.endswith("$"):
            seen_anchor = True
        if not allowed:
            seen_disallow = True
    assert seen_star and seen_anchor and seen_disallow


# ---------------------------------------------------------------------------
# mm_warc_file_ingest: file-true WARC ingestion
# ---------------------------------------------------------------------------


def test_warc_corpus_staged_files_are_real_gzip(sf_dir):
    """The staged corpus must be real on-disk .warc.gz shards readable by
    the STDLIB gzip module (cross-implementation check: our members were
    written by gzip_member_build, stdlib must accept them), with every
    record routed to the shard its doc_id promises."""
    from flock_spark.operators.multimodal import (
        WARC_N_SHARDS,
        _stage_warc_corpus,
    )

    path = _stage_warc_corpus(sf_dir)
    files = sorted(os.listdir(path))
    assert files == [
        f"shard-{s:05d}.warc.gz" for s in range(WARC_N_SHARDS)
    ]
    total_caps = 0
    for s, name in enumerate(files):
        raw = gzip.decompress(open(os.path.join(path, name), "rb").read())
        # stdlib concatenates all members; captures are 3 records each and
        # every response's URI doc id must belong to this shard
        recs = raw.count(b"WARC/1.0\r\n")
        assert recs % 3 == 0
        total_caps += recs // 3
        for ln in raw.split(b"\r\n"):
            if ln.startswith(b"WARC-Target-URI:"):
                did = int(ln.rsplit(b"_", 1)[1])
                assert did % WARC_N_SHARDS == s
    assert total_caps > 0


def test_warc_file_ingest_rejects_corrupt_shard(spark, sf_dir, tmp_path):
    """A truncated record inside a shard must fail loudly (Content-Length
    framing), not silently skip — corrupt-input behavior is part of the
    ingest contract."""
    from flock_spark.operators.multimodal import (
        gzip_member_build,
        gzip_multistream_walk,
        warc_record_build,
        warc_record_parse,
    )

    rec = warc_record_build("response", "<urn:uuid:1>", b"hello")
    member = gzip_member_build("", 1, rec[:-3])  # chop the terminator
    walked = gzip_multistream_walk(member)
    with pytest.raises(ValueError):
        warc_record_parse(walked[0][2])


# ---------------------------------------------------------------------------
# scan_parquet_gzip_page_decode: GZIP-compressed page path
# ---------------------------------------------------------------------------


def test_parquet_gzip_fixture_is_gzip_paged_multigroup(sf_dir):
    from flock_spark.operators.formats import (
        _stage_parquet_gzip,
        parquet_footer_parse,
    )

    path = _stage_parquet_gzip(sf_dir)
    content = open(os.path.join(path, "documents_gzip.parquet"), "rb").read()
    info = parquet_footer_parse(content)
    assert len(info["row_groups"]) >= 2  # multiple chunks per column
    codecs = {c["codec"] for rg in info["row_groups"] for c in rg["columns"]}
    assert codecs == {"GZIP"}


def test_parquet_gzip_column_read_matches_pyarrow(sf_dir):
    """The from-spec reader's decoded values over GZIP pages must equal
    pyarrow's read of the same staged file, value by value."""
    import pyarrow.parquet as pq

    from flock_spark.operators.formats import (
        _stage_parquet_gzip,
        parquet_column_read,
        parquet_footer_parse,
    )

    path = _stage_parquet_gzip(sf_dir)
    fpath = os.path.join(path, "documents_gzip.parquet")
    content = open(fpath, "rb").read()
    names = [n for n, _ in parquet_footer_parse(content)["schema"]]
    t = pq.read_table(fpath)
    for col in ("doc_id", "n_chars"):
        ours = parquet_column_read(content, names.index(col))
        theirs = t.column(col).to_pylist()
        assert ours == theirs, col


def test_gzip_page_decompress_rejects_corrupt_crc():
    from flock_spark.operators.formats import _gzip_page_decompress
    from flock_spark.operators.multimodal import gzip_member_build

    member = bytearray(gzip_member_build("", 0, b"payload bytes"))
    member[-5] ^= 0xFF  # flip a CRC32 byte in the trailer
    with pytest.raises(ValueError):
        _gzip_page_decompress(bytes(member))


# ---------------------------------------------------------------------------
# mm_jpeg_progressive_decode: T.81 Annex G spectral selection
# ---------------------------------------------------------------------------


def _prog_ac_map():
    from flock_spark.operators.multimodal import (
        _huff_decode_map,
        _PROG_AC_BITS,
        _PROG_AC_VALS,
    )

    return _huff_decode_map(_PROG_AC_BITS, _PROG_AC_VALS)


def test_jpeg_progressive_stream_structure():
    """SOF2 frame, three SOS segments, custom AC table present."""
    import numpy as np

    from flock_spark.operators.multimodal import (
        _jpeg_seed_grid,
        jpeg_encode_progressive,
    )

    data = jpeg_encode_progressive(
        _jpeg_seed_grid([ord(c) for c in "progressive-jpeg"], np), np
    )
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert data.count(b"\xff\xda") == 3


def test_jpeg_progressive_eobn_run_spans_blocks():
    """40 blocks with all-zero AC bands must code each AC scan as ONE EOBn
    symbol with extension bits (2 octets), not 40 EOB0s — and decode back
    exactly."""
    from flock_spark.operators.multimodal import (
        _jpeg_decode_ac_band,
        _JpegBitReader,
        jpeg_encode_progressive_scans,
    )

    blocks = [[d] + [0] * 63 for d in range(40)]
    scans = jpeg_encode_progressive_scans(blocks)
    assert [s[:2] for s in scans] == [(0, 0), (1, 5), (6, 63)]
    assert len(scans[1][2]) == 2 and len(scans[2][2]) == 2  # EOB5 + 8 bits
    ac_map = _prog_ac_map()
    coefs = [[b[0]] + [0] * 63 for b in blocks]
    for _, (ss, se, ecs) in zip((1, 2), scans[1:]):
        _jpeg_decode_ac_band(_JpegBitReader(ecs, 0), coefs, ss, se, ac_map)
    assert coefs == blocks


def test_jpeg_progressive_zrl_and_negative_coefs_roundtrip():
    from flock_spark.operators.multimodal import (
        _jpeg_decode_ac_band,
        _JpegBitReader,
        jpeg_encode_progressive_scans,
    )

    blk = [0] * 64
    blk[1], blk[40], blk[63] = 2, -3, -1  # ZRL runs inside band 6-63
    blocks = [blk, [0] * 64, list(blk)]
    scans = jpeg_encode_progressive_scans(blocks)
    ac_map = _prog_ac_map()
    coefs = [[b[0]] + [0] * 63 for b in blocks]
    for ss, se, ecs in scans[1:]:
        _jpeg_decode_ac_band(_JpegBitReader(ecs, 0), coefs, ss, se, ac_map)
    assert coefs == blocks


def test_jpeg_progressive_rejects_successive_approximation():
    import numpy as np

    from flock_spark.operators.multimodal import (
        _jpeg_seed_grid,
        jpeg_decode_progressive,
        jpeg_encode_progressive,
    )

    data = bytearray(
        jpeg_encode_progressive(
            _jpeg_seed_grid([65] * 16, np), np
        )
    )
    sos = data.find(b"\xff\xda")
    data[sos + 4 + 5] = 0x01  # Ah/Al byte of the first scan -> Al=1
    with pytest.raises(ValueError, match="successive"):
        jpeg_decode_progressive(bytes(data), np)


def test_jpeg_progressive_rejects_double_coded_band_and_baseline_frame():
    import numpy as np

    from flock_spark.operators.multimodal import (
        _jpeg_seed_grid,
        jpeg_decode_baseline,
        jpeg_decode_progressive,
        jpeg_encode_baseline,
        jpeg_encode_progressive,
    )

    grid = _jpeg_seed_grid([66] * 16, np)
    prog = jpeg_encode_progressive(grid, np)
    base = jpeg_encode_baseline(grid, np)
    with pytest.raises(ValueError, match="non-progressive"):
        jpeg_decode_progressive(base, np)
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg_decode_baseline(prog, np)


def test_jpeg_progressive_equals_baseline_pixels():
    import numpy as np

    from flock_spark.operators.multimodal import (
        _jpeg_seed_grid,
        jpeg_decode_baseline,
        jpeg_decode_progressive,
        jpeg_encode_baseline,
        jpeg_encode_progressive,
    )

    for seed in ("All work and no p", "0123456789abcdef", "\x00" * 16):
        chars = [ord(c) % 256 for c in seed[:16]]
        grid = _jpeg_seed_grid(chars, np)
        pd_, pb, ns = jpeg_decode_progressive(
            jpeg_encode_progressive(grid, np), np
        )
        bd, bb = jpeg_decode_baseline(jpeg_encode_baseline(grid, np), np)
        assert ns == 3 and pb == bb and (pd_ == bd).all()


# ---------------------------------------------------------------------------
# mm_png_filter_suite_decode: Average + Paeth filters
# ---------------------------------------------------------------------------


def test_paeth_predictor_tie_break_order():
    from flock_spark.operators.multimodal import _paeth

    # PNG spec §9.4: nearest of a/b/c to p = a+b-c; ties break left, up,
    # up-left
    assert _paeth(0, 0, 0) == 0
    assert _paeth(10, 20, 15) == 15  # pa=5 pb=5 pc=0 -> up-left
    assert _paeth(10, 20, 10) == 20  # pb=0 -> up
    assert _paeth(5, 200, 100) == 100  # pc=5 smallest -> up-left
    assert _paeth(10, 10, 4) == 10  # pa==pb tie -> left
    assert _paeth(0, 9, 3) == 9  # pb==pc==3 tie -> up beats up-left


def test_png_full_filter_roundtrip_all_types():
    import numpy as np

    from flock_spark.operators.multimodal import (
        png_filter_rows_full,
        png_unfilter_rows_full,
    )

    rng = [((y * 31 + x * 17 + (x * y) % 7) % 256) for y in range(10) for x in range(8)]
    grid = np.array(rng, dtype=np.uint8).reshape(10, 8)
    raw = png_filter_rows_full(grid, np)
    # row y carries filter type y % 5 — all five appear
    assert [raw[y * 9] for y in range(10)] == [y % 5 for y in range(10)]
    recon = png_unfilter_rows_full(raw, 8, np)
    assert (recon == grid).all()


def test_png_unfilter_rejects_unknown_type():
    import numpy as np

    from flock_spark.operators.multimodal import png_unfilter_rows_full

    raw = bytes([7]) + bytes(8)
    with pytest.raises(ValueError, match="unknown filter type"):
        png_unfilter_rows_full(raw, 8, np)


def test_png_average_floor_semantics():
    """Average filter uses floor((left+up)/2) on the RECONSTRUCTED
    neighbors — an off-by-rounding here corrupts every later pixel."""
    import numpy as np

    from flock_spark.operators.multimodal import (
        png_filter_rows_full,
        png_unfilter_rows_full,
    )

    # 5 rows so row 3 (Average) and row 4 (Paeth) both execute, with odd
    # sums to force the floor
    grid = np.array(
        [[255, 1, 3], [2, 254, 5], [7, 11, 13], [253, 17, 19], [23, 29, 251]],
        dtype=np.uint8,
    )
    recon = png_unfilter_rows_full(png_filter_rows_full(grid, np), 3, np)
    assert (recon == grid).all()


# ---------------------------------------------------------------------------
# text_cdx_surt_dedup: SURT canonicalization properties
# ---------------------------------------------------------------------------


def test_surt_keys_sort_friendly_and_canonical(spark, sf_dir):
    from flock_spark.registry import REGISTRY, _load_all

    _load_all()
    rows = REGISTRY["text_cdx_surt_dedup"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        key = r["surt_key"]
        # host reversed: every key starts at the TLD -> one domain's
        # captures form one contiguous prefix range
        assert key.startswith("com,example"), key
        # 'www' dropped, other subdomains kept after the domain labels
        assert ",www)" not in key
        # tracking params stripped, kept params sorted
        q = key.split("?", 1)[1]
        assert "utm_" not in q
        parts = q.split("&")
        assert parts == sorted(parts) and len(parts) == 2
        assert r["first_ts"] <= r["last_ts"]
        assert 1 <= r["n_unique_digests"] <= r["n_captures"]
    # the dedup is real: fewer keys than documents, some key has >1 capture
    assert any(r["n_captures"] > 1 for r in rows)


# ---------------------------------------------------------------------------
# LZ4 block codec + LZ4_RAW parquet pages
# ---------------------------------------------------------------------------


def test_lz4_roundtrip_properties():
    import random

    from flock_spark.operators.multimodal import (
        lz4_block_compress,
        lz4_block_decompress,
    )

    random.seed(11)
    cases = [
        b"a", b"x" * 12, b"x" * 13, b"a" * 5000,  # sub-13 all-literal rule
        b"abcabcabcabc tail", bytes(range(256)) * 4,
        bytes(random.randrange(256) for _ in range(4000)),  # incompressible
        (b"pat!" * 2000)[:6789],  # 255-extension match lengths
        b"L" * 300 + bytes(random.randrange(256) for _ in range(300)),
    ]
    for c in cases:
        comp = lz4_block_compress(c)
        assert lz4_block_decompress(comp) == c, len(c)
    # overlap copy (offset 1 RLE trick) must self-feed byte-at-a-time
    assert lz4_block_decompress(lz4_block_compress(b"z" * 1000)) == b"z" * 1000


def test_lz4_decoder_rejects_framing_violations():
    from flock_spark.operators.multimodal import lz4_block_decompress

    with pytest.raises(ValueError, match="empty"):
        lz4_block_decompress(b"")
    # offset 0 is illegal
    with pytest.raises(ValueError, match="offset"):
        lz4_block_decompress(bytes([0x10, ord("a"), 0x00, 0x00]))
    # offset beyond produced output
    with pytest.raises(ValueError, match="offset"):
        lz4_block_decompress(bytes([0x10, ord("a"), 0x05, 0x00]))
    # literal run past end of block
    with pytest.raises(ValueError, match="literal"):
        lz4_block_decompress(bytes([0x50, ord("a")]))
    # truncated length extension
    with pytest.raises(ValueError, match="extension"):
        lz4_block_decompress(bytes([0xF0]))


def test_parquet_lz4_fixture_decodes_real_pyarrow_output(sf_dir):
    """Cross-implementation: pages compressed by pyarrow's C++ lz4 must
    decode through OUR from-spec block decoder to pyarrow's own values."""
    import pyarrow.parquet as pq

    from flock_spark.operators.formats import (
        _stage_parquet_codec,
        parquet_column_read,
        parquet_footer_parse,
    )

    path = _stage_parquet_codec(sf_dir, "lz4")
    fpath = os.path.join(path, "documents_lz4.parquet")
    content = open(fpath, "rb").read()
    info = parquet_footer_parse(content)
    assert {
        c["codec"] for rg in info["row_groups"] for c in rg["columns"]
    } == {"LZ4_RAW"}
    names = [n for n, _ in info["schema"]]
    t = pq.read_table(fpath)
    for col in ("doc_id", "n_chars"):
        assert parquet_column_read(content, names.index(col)) == t.column(
            col
        ).to_pylist(), col


# ---------------------------------------------------------------------------
# tokenizer_unigram_viterbi: global optimum vs greedy
# ---------------------------------------------------------------------------


def test_unigram_viterbi_beats_greedy_where_it_should():
    from flock_spark.operators.text import (
        UNIGRAM_COSTS,
        _unigram_viterbi,
        _wp_greedy,
    )

    # 'xated': greedy takes x|ate|d (6+3+6=15); the optimum is x|at|ed
    # (6+4+4=14) — the case that separates the two algorithms
    cost, n, pieces = _unigram_viterbi("xated")
    assert (cost, pieces) == (14, "x|at|ed")
    g_n, g_pieces = _wp_greedy("xated")
    assert g_pieces == "x|ate|d"
    # brute-force cross-check on a word sample: Viterbi cost must equal
    # the exhaustive minimum, and the tie-break must be largest-step-first
    from itertools import product

    from flock_spark.operators.text import WP_VOCAB_2, WP_VOCAB_3

    def all_segs(word):
        def rec(pos):
            if pos == len(word):
                yield [], 0, ""
                return
            for stp, cst in ((3, UNIGRAM_COSTS[3]), (2, UNIGRAM_COSTS[2]),
                             (1, UNIGRAM_COSTS[1])):
                piece = word[pos : pos + stp]
                if len(piece) != stp:
                    continue
                if stp == 3 and piece not in WP_VOCAB_3:
                    continue
                if stp == 2 and piece not in WP_VOCAB_2:
                    continue
                for rest, rcost, rsteps in rec(pos + stp):
                    yield [piece] + rest, cst + rcost, str(stp) + rsteps
        return list(rec(0))

    for word in ("xated", "atent", "theater", "ingestion", "alteration",
                 "zzzz", "anding"):
        segs = all_segs(word)
        best = min(s[1] for s in segs)
        # among min-cost segmentations the DP picks the lexicographically
        # LARGEST step string (largest step earliest)
        want = max((s for s in segs if s[1] == best), key=lambda s: s[2])
        cost, n, pieces = _unigram_viterbi(word)
        assert cost == best, word
        assert pieces == "|".join(want[0]), word


# ---------------------------------------------------------------------------
# Punycode (RFC 3492)
# ---------------------------------------------------------------------------


def test_punycode_rfc_sample_strings():
    """RFC 3492 §7.1 sample strings (the CJK and mixed-case samples) plus
    stdlib cross-validation on every case."""
    from flock_spark.operators.text import punycode_decode, punycode_encode

    cjk = "".join(
        chr(c)
        for c in (0x4ED6, 0x4EEC, 0x4E3A, 0x4EC0, 0x4E48, 0x4E0D, 0x8BF4,
                  0x4E2D, 0x6587)
    )
    cases = {
        "ü": "tda",
        "bücher": "bcher-kva",
        cjk: "ihqwcrb4cv8a8dqg056pqjye",
        "MajiでKoiする5秒前": "MajiKoi5-783gue6qz075azm5e",
    }
    for s, want in cases.items():
        got = punycode_encode(s)
        assert got == want, (s, got)
        assert got == s.encode("punycode").decode("ascii")
        assert punycode_decode(got) == s
    # pure-ASCII label: everything basic, one trailing delimiter section
    assert punycode_encode("abc") == "abc-"
    assert punycode_decode("abc-") == "abc"


def test_punycode_decode_rejects_malformed():
    from flock_spark.operators.text import punycode_decode

    with pytest.raises(ValueError):
        punycode_decode("abc-!")  # invalid digit
    with pytest.raises(ValueError):
        punycode_decode("tda" + "9" * 1)  # truncated VLI tail is fine? no:
    # a dangling high-digit sequence with no terminating low digit
    with pytest.raises(ValueError):
        punycode_decode("zzzz")


def test_punycode_fuzz_roundtrip_vs_stdlib():
    import random

    from flock_spark.operators.text import punycode_decode, punycode_encode

    random.seed(13)
    ranges = ((97, 123), (0x4E00, 0x4F00), (0x3B1, 0x3C9))
    for _ in range(200):
        n = random.randrange(1, 20)
        s = "".join(
            chr(random.randrange(*ranges[random.randrange(3)]))
            for _ in range(n)
        )
        enc = punycode_encode(s)
        assert enc == s.encode("punycode").decode("ascii"), s
        assert punycode_decode(enc) == s, s


# ---------------------------------------------------------------------------
# text_robots_file_parse: group extraction from robots.txt files
# ---------------------------------------------------------------------------


def test_robots_file_parse_group_selection(spark, sf_dir):
    from flock_spark.operators.text import ROBOTS_CRAWLER
    from flock_spark.registry import REGISTRY, _load_all

    _load_all()
    rows = {
        r["host"]: r
        for r in REGISTRY["text_robots_file_parse"].fn(spark, sf_dir).collect()
    }
    assert len(rows) == 50
    for h, r in rows.items():
        if h % 2 == 0:
            # even hosts: the exact crawler group (opened by consecutive
            # UA lines) wins over '*' — 1 allow + 1 disallow
            assert r["matched_agent"] == ROBOTS_CRAWLER, r
            assert (r["n_allow"], r["n_disallow"]) == (1, 1), r
        else:
            # odd hosts: no exact group -> the '*' group; its crawl-delay
            # and unknown directives are ignored, leaving 1 allow + 1
            # disallow
            assert r["matched_agent"] == "*", r
            assert (r["n_allow"], r["n_disallow"]) == (1, 1), r


# ---------------------------------------------------------------------------
# crawl_url_resolve_rfc3986: three-way agreement
# ---------------------------------------------------------------------------


def test_rfc3986_remove_dot_segments_spec_examples():
    from flock_spark.operators.text import rfc3986_remove_dot_segments as rds

    # RFC 3986 §5.2.4 worked examples
    assert rds("/a/b/c/./../../g") == "/a/g"
    assert rds("mid/content=5/../6") == "mid/6"
    # boundary behavior
    assert rds("/../a") == "/a"  # '..' at root is consumed
    assert rds("/a/b/..") == "/a/"
    assert rds("/a/b/.") == "/a/b/"
    assert rds("/a//b") == "/a//b"  # empty segments survive


def test_url_resolution_three_way_agreement(spark, sf_dir):
    """Entry output == from-spec Python resolver == stdlib urljoin for
    every document and every reference shape."""
    from urllib.parse import urljoin

    from flock_spark.operators.text import rfc3986_resolve
    from flock_spark.registry import REGISTRY, _load_all

    _load_all()
    rows = REGISTRY["crawl_url_resolve_rfc3986"].fn(spark, sf_dir).collect()
    assert rows
    kinds_seen = set()
    refs = {
        0: lambda d: f"../up{d % 9}.html",
        1: lambda d: "./here.html",
        2: lambda d: f"rel/child.html?q={d % 4}",
        3: lambda d: f"/abs/../root{d % 9}.html",
        4: lambda d: f"../../x/../y{d % 9}.html",
        5: lambda d: f"//other{d % 4}.example.org/p/./q.html",
        # trailing dot-segment shapes: §5.2.4 keeps the trailing slash
        # ('/a/b/c/..' -> '/a/b/', not '/a/b') — regression fixtures for
        # the ADVICE r11 finding that both engines dropped it in lockstep
        6: lambda d: "..",
        7: lambda d: f"d{d % 9}/.",
    }
    for r in rows:
        d = r["doc_id"]
        base = (
            f"http://h{d % 7}.example.com/a{d % 3}/b{d % 5}/c/page.html"
        )
        ref = refs[r["kind"]](d)
        want = rfc3986_resolve(base, ref)
        assert r["resolved"] == want, (base, ref, r["resolved"], want)
        if r["kind"] != 5:
            assert r["resolved"] == urljoin(base, ref), (base, ref)
        else:
            # stdlib urljoin deviates from RFC 3986 §5.2.2 on network-path
            # references: it skips remove_dot_segments when the ref carries
            # its own authority ('//h/p/./q' keeps the '.'), while the RFC
            # requires T.path = remove_dot_segments(R.path) there too. The
            # entry follows the RFC; pin both facts.
            assert r["resolved"] == "http://other%d.example.org/p/q.html" % (
                d % 4
            )
            assert urljoin(base, ref).endswith("/p/./q.html")
        kinds_seen.add(r["kind"])
        if r["kind"] in (6, 7):
            assert r["resolved"].endswith("/"), (base, ref, r["resolved"])
    assert kinds_seen == set(range(8))


# ---------------------------------------------------------------------------
# scan_csv_rfc4180_parse: from-spec CSV state machine
# ---------------------------------------------------------------------------


def test_csv_rfc4180_parser_hazards_and_rejections():
    from flock_spark.operators.formats import csv_rfc4180_parse

    # doubled quotes, embedded comma and CRLF inside one quoted field
    data = b'1,"a,""b""\r\nc",2\r\n3,plain,4\r\n'
    rows = csv_rfc4180_parse(data)
    assert rows == [["1", 'a,"b"\r\nc', "2"], ["3", "plain", "4"]]
    # bare-LF line ends tolerated; trailing row without newline kept
    assert csv_rfc4180_parse(b"a,b\nc,d") == [["a", "b"], ["c", "d"]]
    # empty quoted field, empty unquoted field
    assert csv_rfc4180_parse(b'"",x,\r\n') == [["", "x", ""]]
    import pytest as _pt

    with _pt.raises(ValueError, match="garbage after closing quote"):
        csv_rfc4180_parse(b'"a"b,c\r\n')
    with _pt.raises(ValueError, match="quote inside unquoted"):
        csv_rfc4180_parse(b'ab"c,d\r\n')
    with _pt.raises(ValueError, match="bare CR"):
        csv_rfc4180_parse(b"a\rb\r\n")
    with _pt.raises(ValueError, match="EOF inside quoted"):
        csv_rfc4180_parse(b'"abc')


def test_csv_rfc4180_three_way_reader_agreement(spark, sf_dir):
    """Our parser, Spark's multiLine CSV reader and DuckDB's read_csv must
    agree row-for-row on the same staged hazard-dense file."""
    import duckdb

    from flock_spark.operators.formats import (
        _stage_csv_rfc4180,
        csv_rfc4180_parse,
    )

    path = _stage_csv_rfc4180(sf_dir)
    fpath = os.path.join(path, "docs.csv")
    ours = csv_rfc4180_parse(open(fpath, "rb").read())
    # escape='"' selects RFC 4180 quote-doubling (Spark's default escape
    # is backslash, which misparses '""' and splits on the quoted CRLF)
    spark_rows = (
        spark.read.option("multiLine", True)
        .option("header", False)
        .option("escape", '"')
        .csv(f"file://{fpath}")
        .collect()
    )
    # univocity (Spark's CSV parser) NORMALIZES line separators inside
    # quoted fields to '\n'; our parser and DuckDB keep the raw CRLF
    # octets. Compare on the normalized form and pin that the raw forms
    # really differed (the quirk is real, not hypothetical).
    assert any("\r\n" in r[1] for r in ours)
    assert all("\r" not in r["_c1"] for r in spark_rows)
    got_spark = sorted(
        (int(r["_c0"]), r["_c1"], int(r["_c2"])) for r in spark_rows
    )
    duck_rows = duckdb.sql(
        f"SELECT * FROM read_csv('{fpath}', header=false, "
        "columns={'a':'BIGINT','b':'VARCHAR','c':'BIGINT'})"
    ).fetchall()
    got_ours = sorted(
        (int(a), b.replace("\r\n", "\n"), int(c)) for a, b, c in ours
    )
    got_duck = sorted(
        (a, b.replace("\r\n", "\n"), c) for a, b, c in duck_rows
    )
    assert got_ours == got_spark == got_duck


# ---------------------------------------------------------------------------
# sketch_roaring_bitmap_ops: container types and typed algebra
# ---------------------------------------------------------------------------


def test_roaring_type_decision_boundaries():
    from flock_spark.operators.sketches import roaring_container_type

    # one run of n values: 6 bytes beats 2*card once card >= 4
    assert roaring_container_type(3, 1) == ("array", 6)
    assert roaring_container_type(4, 1) == ("run", 6)
    # all-singleton runs never win
    assert roaring_container_type(100, 100) == ("array", 200)
    # dense: one giant run beats the bitmap
    assert roaring_container_type(60000, 1) == ("run", 6)
    # dense, fragmented: bitmap wins once runs and array are both bigger
    assert roaring_container_type(5000, 4000) == ("bitmap", 8192)
    assert roaring_container_type(4096, 4096) == ("array", 8192)
    assert roaring_container_type(4097, 4097) == ("bitmap", 8192)


def test_roaring_typed_algebra_all_pairs():
    import random

    from flock_spark.operators.sketches import RoaringContainer

    random.seed(17)
    # shapes that force each native type
    dense_run = list(range(100, 9000))                      # run
    sparse = sorted(random.sample(range(65536), 900))       # array
    fragmented = sorted(random.sample(range(65536), 9000))  # bitmap
    shapes = {"run": dense_run, "array": sparse, "bitmap": fragmented}
    for na, la in shapes.items():
        ca = RoaringContainer(la)
        assert ca.ctype == na, (na, ca.ctype)
        assert ca.to_sorted() == la, na  # native roundtrip
        for nb, lb in shapes.items():
            cb = RoaringContainer(lb)
            assert ca.op(cb, union=False) == sorted(set(la) & set(lb)), (
                na, nb, "and",
            )
            assert ca.op(cb, union=True) == sorted(set(la) | set(lb)), (
                na, nb, "or",
            )


# ---------------------------------------------------------------------------
# mm_quoted_printable_roundtrip + crawl_link_extract_resolve
# ---------------------------------------------------------------------------


def test_qp_codec_spec_behaviors():
    from flock_spark.operators.multimodal import (
        QP_MAX_LINE,
        qp_decode,
        qp_encode,
    )

    # '=' always escapes; control bytes escape; printables pass through
    assert qp_encode(b"a=b") == b"a=3Db"
    assert qp_decode(b"a=3Db") == b"a=b"
    # line-final space must be protected
    assert qp_encode(b"x ").endswith(b"=20")
    # soft breaks keep lines within 76 octets and vanish on decode
    blob = bytes(range(256)) * 3
    enc = qp_encode(blob)
    assert all(len(ln) <= QP_MAX_LINE for ln in enc.split(b"\r\n"))
    assert qp_decode(enc) == blob
    # stdlib cross: both soft-break conventions decode
    import quopri

    assert qp_decode(quopri.encodestring(blob)) == blob
    assert quopri.decodestring(enc) == blob
    with pytest.raises(ValueError, match="truncated"):
        qp_decode(b"abc=4")
    with pytest.raises(ValueError, match="bad quoted-printable"):
        qp_decode(b"abc=ZZ")


def test_link_extract_resolve_counts(spark, sf_dir):
    from flock_spark.registry import REGISTRY, _load_all

    _load_all()
    rows = REGISTRY["crawl_link_extract_resolve"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 5 raw anchors, the duplicate collapses, 2 internal + 2 external
        assert r["n_raw"] == 5 and r["n_distinct"] == 4, r
        assert r["n_internal"] == 2 and r["n_external"] == 2, r
