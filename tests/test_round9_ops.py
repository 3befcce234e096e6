"""Round-9 codec operators: genuinely compressed payload decode.

Non-vacuity discipline: these tests prove the codecs actually compress and
actually decode — property-based roundtrips across width boundaries and the
KwKwK case, framing/checksum rejection, and a dictionary-compression
assertion a passthrough implementation cannot satisfy."""

import hashlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flock_spark.operators.multimodal import (
    PNG_ROW_W,
    _adler32,
    lzw_decode,
    lzw_encode,
    png_filter_rows,
    png_inflate_stored,
    png_stored_deflate,
    png_unfilter_rows,
)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=3), max_size=3000))
def test_lzw_roundtrip_random(pixels):
    assert lzw_decode(lzw_encode(pixels)) == pixels


def test_lzw_roundtrip_long_crosses_width_boundaries():
    # >4096 table entries forces every width 3..12 plus the frozen-table
    # (deferred clear) regime
    rng = np.random.default_rng(11)
    pixels = rng.integers(0, 4, size=60_000).tolist()
    assert lzw_decode(lzw_encode(pixels)) == pixels


def test_lzw_kwkwk_case():
    # the classic self-referencing pattern: emitted code == next table slot
    pixels = [0, 0, 0, 0, 0, 0, 0, 0]
    assert lzw_decode(lzw_encode(pixels)) == pixels


def test_lzw_actually_compresses_repetitive_input():
    pixels = [1] * 4000  # 4000 px = 1000 bytes at raw 2bpp
    compressed = lzw_encode(pixels)
    assert len(compressed) < 1000 // 4, (
        f"dictionary not working: {len(compressed)} bytes for 4000 repeated px"
    )
    assert lzw_decode(compressed) == pixels


def test_lzw_stream_is_gif_framed():
    enc = lzw_encode([0, 1, 2, 3])
    assert enc[0] == 2  # min code size
    assert enc[-1] == 0  # block terminator
    # every sub-block's declared length walks exactly to the terminator
    pos = 1
    while enc[pos] != 0:
        pos += 1 + enc[pos]
    assert pos == len(enc) - 1


def test_lzw_rejects_malformed():
    with pytest.raises(ValueError):
        lzw_decode(b"")
    with pytest.raises(ValueError):
        lzw_decode(bytes([2, 5, 1, 2, 3]))  # block runs past end, no terminator


# ---------------------------------------------------------------------------
# PNG stored-block inflate + unfilter
# ---------------------------------------------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=1, max_value=40), st.integers(min_value=0, max_value=2**32 - 1))
def test_png_roundtrip_random_grids(h, seed):
    rng = np.random.default_rng(seed)
    grid = rng.integers(0, 256, size=(h, PNG_ROW_W), dtype=np.uint8)
    stream = png_stored_deflate(png_filter_rows(grid, np))
    recon = png_unfilter_rows(png_inflate_stored(stream), PNG_ROW_W, np)
    assert (recon == grid).all()


def test_png_multi_block_stream():
    # >65535 bytes of scanlines forces more than one stored block
    grid = np.arange(70_000 * PNG_ROW_W, dtype=np.int64).astype(np.uint8)[
        : 2200 * PNG_ROW_W
    ].reshape(2200, PNG_ROW_W)
    raw = png_filter_rows(grid, np)
    assert len(raw) > 65535
    stream = png_stored_deflate(raw)
    assert png_inflate_stored(stream) == raw


def test_png_filters_are_not_passthrough():
    # Sub/Up filtering must change the bytes (a passthrough "filter" would
    # make the inflate test vacuous)
    grid = np.arange(4 * PNG_ROW_W, dtype=np.uint8).reshape(4, PNG_ROW_W)
    raw = png_filter_rows(grid, np)
    stripped = b"".join(
        raw[y * (PNG_ROW_W + 1) + 1 : (y + 1) * (PNG_ROW_W + 1)] for y in range(4)
    )
    assert stripped != grid.tobytes()


def test_png_rejects_corruption():
    grid = np.arange(2 * PNG_ROW_W, dtype=np.uint8).reshape(2, PNG_ROW_W)
    stream = bytearray(png_stored_deflate(png_filter_rows(grid, np)))
    # flip one payload byte -> adler must catch it
    stream[10] ^= 0xFF
    with pytest.raises(ValueError, match="adler32|LEN"):
        png_inflate_stored(bytes(stream))
    # bad zlib header check bits
    with pytest.raises(ValueError, match="header"):
        png_inflate_stored(b"\x78\x02" + bytes(10))
    # non-stored BTYPE
    bad = b"\x78\x01" + bytes([0x02]) + bytes(10)
    with pytest.raises(ValueError, match="stored"):
        png_inflate_stored(bad)


def test_adler32_matches_zlib():
    import zlib

    for data in [b"", b"a", b"hello world" * 100, bytes(range(256)) * 300]:
        assert _adler32(data) == zlib.adler32(data)


# ---------------------------------------------------------------------------
# operator-level: decoded md5 equals the direct hash of the source sequence
# ---------------------------------------------------------------------------


def test_gif_lzw_operator_md5_matches_direct(spark, sf_dir):
    from flock_spark.registry import REGISTRY

    rows = {
        r["doc_id"]: r
        for r in REGISTRY["mm_gif_lzw_decode"].fn(spark, sf_dir).collect()
    }
    import duckdb

    src = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' LIMIT 20"
    ).fetchall()
    checked = 0
    for doc_id, text in src:
        b = text.encode("utf-8")
        if not b or doc_id not in rows:
            continue
        px = [v % 4 for v in b]
        expect = hashlib.md5(",".join(map(str, px)).encode()).hexdigest()
        assert rows[doc_id]["decoded_md5"] == expect
        assert rows[doc_id]["n_px"] == len(px)
        checked += 1
    assert checked >= 10
