"""From-spec snappy + LZ4 codec tests.

Decoders are pinned against HAND-CONSTRUCTED wires built element by
element from the public format descriptions (google/snappy
``format_description.txt``; lz4 block + frame specs), so they are
validated against the spec independently of our encoders; xxHash32 is
pinned against published sanity vectors. Round trips then prove the
encoders emit conforming streams, and hypothesis sweeps the domain.
When the native libs happen to be installed, cross-interop tests run
both directions (skipped otherwise — not present in this container).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tigate_spark.functions import lz4_codec as lz
from tigate_spark.functions import snappy_codec as sc
from tigate_spark.functions.compress import (
    compress_bytes,
    decompress_bytes,
    supported,
)


# ------------------------------------------------------------------ xxHash32

def test_xxh32_published_vectors():
    # seed 0 classics + the xxhash sanity prime-seed vector + the
    # python-xxhash README vector (exercises the >=16-byte lane)
    assert lz.xxh32(b"") == 0x02CC5D05
    assert lz.xxh32(b"a") == 0x550D7456
    assert lz.xxh32(b"abc") == 0x32D153FF
    assert lz.xxh32(b"", seed=2654435761) == 0x36B78AE7
    assert lz.xxh32(b"Nobody inspects the spammish repetition") == 0xE2293B2F


# ------------------------------------------------------- snappy decode (spec)

def test_snappy_decode_literal_only():
    # preamble varint 5, tag (5-1)<<2 | 00, then the bytes
    wire = bytes([5, (4 << 2) | 0]) + b"hello"
    assert sc.decompress(wire) == b"hello"


def test_snappy_decode_long_literal_length_byte():
    # tag 60<<2 means next 1 byte holds length-1
    body = bytes(range(70))
    wire = sc._write_uvarint(70) + bytes([60 << 2, 69]) + body
    assert sc.decompress(wire) == body


def test_snappy_decode_copy_one_byte_offset():
    # "abcd" literal then copy len 4 off 4 -> "abcdabcd"
    wire = bytes([8, (3 << 2) | 0]) + b"abcd" + bytes([
        ((4 >> 8) << 5) | ((4 - 4) << 2) | 1, 4 & 0xFF])
    assert sc.decompress(wire) == b"abcdabcd"


def test_snappy_decode_copy_two_byte_offset():
    wire = bytes([8, (3 << 2) | 0]) + b"wxyz" + bytes(
        [((4 - 1) << 2) | 2]) + (4).to_bytes(2, "little")
    assert sc.decompress(wire) == b"wxyzwxyz"


def test_snappy_decode_overlapping_copy_rle():
    # 1-byte literal "A", copy len 7 off 1 -> "A"*8 (classic RLE form)
    wire = bytes([8, 0]) + b"A" + bytes(
        [((1 >> 8) << 5) | ((7 - 4) << 2) | 1, 1])
    assert sc.decompress(wire) == b"A" * 8


def test_snappy_decode_rejects_bad_offset_and_length_mismatch():
    with pytest.raises(sc.SnappyError):
        sc.decompress(bytes([4, ((4 - 4) << 2) | 1, 9]))  # copy before start
    with pytest.raises(sc.SnappyError):
        sc.decompress(bytes([9, (3 << 2) | 0]) + b"abcd")  # preamble lies
    with pytest.raises(sc.SnappyError):
        sc.decompress(bytes([5, (4 << 2) | 0]) + b"hel")  # truncated body


# ---------------------------------------------------------- lz4 decode (spec)

def test_lz4_block_decode_hand_built():
    # token 0x55: lit=5, match len 5+4=9; offset 5 -> overlapping copy
    # replays "abcde" forward; then a final literal-only sequence
    blk = bytes([0x55]) + b"abcde" + (5).to_bytes(2, "little") \
        + bytes([0x10]) + b"!"
    assert lz.block_decompress(blk) == b"abcde" + b"abcdeabcd" + b"!"


def test_lz4_block_decode_extended_lengths():
    # final literal-only run of 255: token nibble 15, ext byte 240
    lits = bytes(range(255))
    blk = bytes([0xF0, 240]) + lits
    assert lz.block_decompress(blk) == lits
    # extended MATCH length: lit=1, ml ext 15+3+4=22, offset 1 (RLE)
    blk2 = bytes([0x1F]) + b"z" + (1).to_bytes(2, "little") + bytes([3]) \
        + bytes([0x50]) + b"tail!"
    assert lz.block_decompress(blk2) == b"z" * 23 + b"tail!"


def test_lz4_block_decode_rejects_zero_offset():
    blk = bytes([0x14]) + b"a" + (0).to_bytes(2, "little")
    with pytest.raises(lz.LZ4Error):
        lz.block_decompress(blk)


def test_lz4_frame_decode_hand_built_stored_block():
    # hand-assemble: magic, FLG (v1, b-indep), BD 64KB, HC, one stored
    # block, EndMark — no content checksum
    header = bytes([(1 << 6) | (1 << 5), 4 << 4])
    hc = (lz.xxh32(header) >> 8) & 0xFF
    payload = b"stored-block-payload"
    frame = (0x184D2204).to_bytes(4, "little") + header + bytes([hc]) \
        + (len(payload) | 0x80000000).to_bytes(4, "little") + payload \
        + (0).to_bytes(4, "little")
    assert lz.frame_decompress(frame) == payload


def test_lz4_frame_decode_block_checksum_and_content_size():
    # FLG: v1, b-indep, block-checksum, content-size, content-checksum
    flg = (1 << 6) | (1 << 5) | (1 << 4) | (1 << 3) | (1 << 2)
    header = bytes([flg, 4 << 4]) + (11).to_bytes(8, "little")
    hc = (lz.xxh32(header) >> 8) & 0xFF
    payload = b"hello world"
    frame = (0x184D2204).to_bytes(4, "little") + header + bytes([hc]) \
        + (len(payload) | 0x80000000).to_bytes(4, "little") + payload \
        + lz.xxh32(payload).to_bytes(4, "little") \
        + (0).to_bytes(4, "little") \
        + lz.xxh32(payload).to_bytes(4, "little")
    assert lz.frame_decompress(frame) == payload


def test_lz4_frame_rejects_bad_magic_header_checksum_and_content():
    good = lz.frame_compress(b"payload bytes here")
    with pytest.raises(lz.LZ4Error):
        lz.frame_decompress(b"\x00" + good[1:])
    bad_hc = bytearray(good)
    bad_hc[6] ^= 0xFF
    with pytest.raises(lz.LZ4Error):
        lz.frame_decompress(bytes(bad_hc))
    bad_cc = bytearray(good)
    bad_cc[-1] ^= 0xFF
    with pytest.raises(lz.LZ4Error):
        lz.frame_decompress(bytes(bad_cc))


# ------------------------------------------------------------- round trips

_CORPUS = st.one_of(
    st.binary(max_size=4096),
    # repetitive / RLE-ish shapes where match emission dominates
    st.builds(lambda b, n: b * n, st.binary(min_size=1, max_size=16),
              st.integers(min_value=1, max_value=2000)),
    st.builds(lambda a, b, n: a + b * n + a,
              st.binary(max_size=64),
              st.binary(min_size=1, max_size=8),
              st.integers(min_value=0, max_value=500)),
)


@settings(max_examples=150, deadline=None)
@given(_CORPUS)
def test_snappy_roundtrip_property(data):
    assert sc.decompress(sc.compress(data)) == data


@settings(max_examples=150, deadline=None)
@given(_CORPUS)
def test_lz4_block_roundtrip_property(data):
    assert lz.block_decompress(lz.block_compress(data)) == data


@settings(max_examples=100, deadline=None)
@given(_CORPUS, st.booleans())
def test_lz4_frame_roundtrip_property(data, checksum):
    wire = lz.frame_compress(data, content_checksum=checksum)
    assert lz.frame_decompress(wire) == data


def test_lz4_frame_multi_block():
    data = (b"0123456789abcdef" * 5000) + b"tail"  # > 64 KiB
    wire = lz.frame_compress(data, block_max=1 << 16)
    assert lz.frame_decompress(wire) == data


def test_lz4_block_end_rules_hold():
    # encoder must leave the last 5 bytes as literals and no match
    # starting past len-12 — verify on a worst case (pure repetition)
    data = b"ab" * 64
    blk = lz.block_compress(data)
    # walk sequences; the final sequence must be literal-only with >= 5
    pos, n = 0, len(blk)
    last_lit = 0
    while pos < n:
        token = blk[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = blk[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        pos += lit
        if pos == n:
            last_lit = lit
            break
        pos += 2
        ml = token & 0xF
        if ml == 15:
            while True:
                b = blk[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
    assert last_lit >= 5


# ------------------------------------------------------------ seam plumbing

def test_seam_reference_codecs_always_supported():
    assert supported("snappy") and supported("lz4")
    for cc in ("snappy", "lz4"):
        data = b"seam payload " * 300
        assert decompress_bytes(cc, compress_bytes(cc, data)) == data


def test_native_snappy_cross_interop():
    snappy = pytest.importorskip("snappy")
    data = b"cross interop payload " * 200
    # native reads ours; we read native's
    assert snappy.decompress(sc.compress(data)) == data
    assert sc.decompress(snappy.compress(data)) == data


def test_native_lz4_cross_interop():
    lz4f = pytest.importorskip("lz4.frame")
    data = b"cross interop payload " * 200
    assert lz4f.decompress(lz.frame_compress(data)) == data
    assert lz.frame_decompress(lz4f.compress(data)) == data


def test_lz4_frame_block_dependent_decode():
    """FLG B.Indep clear: matches reach into previous blocks' content.
    Hand-build a 2-block dependent frame: block 2 copies a pattern
    that lives entirely in block 1."""
    pat = b"0123456789abcdef" * 8  # 128 bytes, in block 1
    blk1 = lz.block_compress(pat)
    # block 2: 4 literals then a 32-byte match at offset 132 — the
    # match source lies entirely in block 1's content
    blk2 = bytes([(4 << 4) | 15]) + b"WXYZ" \
        + (132).to_bytes(2, "little") + bytes([32 - 4 - 15]) \
        + bytes([0x50]) + b"tail!"
    header = bytes([(1 << 6), 4 << 4])  # v1, B.Indep CLEAR, 64KB
    hc = (lz.xxh32(header) >> 8) & 0xFF
    frame = (0x184D2204).to_bytes(4, "little") + header + bytes([hc]) \
        + len(blk1).to_bytes(4, "little") + blk1 \
        + len(blk2).to_bytes(4, "little") + blk2 \
        + (0).to_bytes(4, "little")
    got = lz.frame_decompress(frame)
    expect = pat + b"WXYZ" + (pat + b"WXYZ")[-132:-132 + 32] + b"tail!"
    assert got == expect
