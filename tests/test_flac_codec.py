"""From-spec FLAC codec (RFC 9639 subset): encoder/decoder round trips
across the subframe matrix, Rice partition/escape lanes, wasted bits,
UTF-8-coded frame numbers, and the CRC dead-letter contract."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tigate_spark.functions.flac import (
    _BitReader,
    _BitWriter,
    _utf8_coded,
    crc8,
    crc16,
    flac_decode,
    flac_encode,
)


def _pcm(seed: int, n: int = 256) -> list[int]:
    return [((seed * 211 + 17 * j * j + 37 * j) % 4096) - 2048
            for j in range(n)]


# -- bit I/O and primitives ---------------------------------------------------

def test_bit_roundtrip():
    w = _BitWriter()
    vals = [(5, 3), (0, 1), (1023, 10), (1, 1), (0xABCDE, 20)]
    for v, b in vals:
        w.write(v, b)
    w.align()
    r = _BitReader(w.bytes())
    for v, b in vals:
        assert r.read(b) == v


def test_signed_reads():
    w = _BitWriter()
    for v in (-1, -32768, 32767, 0, -5):
        w.write(v & 0xFFFF, 16)
    w.align()
    r = _BitReader(w.bytes())
    for v in (-1, -32768, 32767, 0, -5):
        assert r.read_signed(16) == v


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 against independently
    # computed references ("123456789" checks: 0xF4 and 0xFEE8)
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


@pytest.mark.parametrize("n", [0, 1, 127, 128, 2047, 2048, 65535, 65536,
                               (1 << 21) - 1, 1 << 21, (1 << 36) - 1])
def test_utf8_coded_roundtrip(n):
    from tigate_spark.functions.flac import _read_utf8_coded

    r = _BitReader(_utf8_coded(n))
    assert _read_utf8_coded(r) == n


# -- subframe matrix round trips ----------------------------------------------

@pytest.mark.parametrize("plan", [
    ("verbatim",),
    ("fixed", 0), ("fixed", 1), ("fixed", 2), ("fixed", 3), ("fixed", 4),
    ("lpc", [3, -1], 1, 5),
    ("lpc", [2], 0, 4),
    ("lpc", [5, -4, 1], 2, 6),
])
def test_subframe_roundtrip(plan):
    samples = _pcm(9)
    data = flac_encode(samples, frame_plan=lambda f: plan)
    rate, got = flac_decode(data)
    assert rate == 8000
    assert got == samples


def test_constant_subframe():
    samples = [-321] * 64 + _pcm(3, 192)
    data = flac_encode(
        samples,
        frame_plan=lambda f: ("constant",) if f == 0 else ("fixed", 2))
    assert flac_decode(data)[1] == samples


@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=64, max_size=64),
       st.sampled_from([("verbatim",), ("fixed", 1), ("fixed", 2),
                        ("fixed", 4), ("lpc", [3, -1], 1, 5)]))
@settings(max_examples=60, deadline=None)
def test_lossless_property(samples, plan):
    """Any int16 PCM round-trips exactly through any subframe choice —
    FLAC is lossless; residual magnitudes never truncate (the Rice
    escape-free encoder handles full-range residuals via unary)."""
    data = flac_encode(samples, blocksize=64, frame_plan=lambda f: plan)
    assert flac_decode(data)[1] == samples


def test_multiframe_utf8_frame_numbers():
    """> 127 frames exercises the multi-byte UTF-8-coded frame number."""
    samples = _pcm(5, 8 * 200)
    data = flac_encode(samples, blocksize=8)
    assert flac_decode(data)[1] == samples


# -- decoder-only lanes (hand-built bitstreams) -------------------------------

def _frame_with_residual(samples, residual_writer):
    """One fixed-order-0 frame whose residual block is written by
    ``residual_writer(w)`` — lets tests exercise decoder-only lanes
    (escape partitions, partition order > 0, Rice2)."""
    blocksize = len(samples)
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(blocksize, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0110, 4)
    hdr.write(0b0000, 4)
    hdr.write(0b0000, 4)
    hdr.write(0b100, 3)
    hdr.write(0, 1)
    head = bytearray(hdr.bytes()) + b"\x00" + bytes([blocksize - 1])
    head.append(crc8(bytes(head)))
    w = _BitWriter()
    w.write(0, 1)
    w.write(8, 6)      # FIXED order 0
    w.write(0, 1)
    residual_writer(w)
    w.align()
    frame = bytes(head) + w.bytes()
    return bytes(out) + frame + struct.pack(">H", crc16(frame))


def test_escape_partition_decodes_raw():
    samples = _pcm(7, 64)

    def write(w):
        w.write(0, 2)          # Rice method 0
        w.write(0, 4)          # one partition
        w.write(15, 4)         # escape
        w.write(13, 5)         # 13 raw bits per residual
        for s in samples:
            w.write(s & 0x1FFF, 13)

    assert flac_decode(_frame_with_residual(samples, write))[1] == samples


def test_partitioned_rice_and_rice2():
    samples = _pcm(11, 64)

    def zz(e):
        return (e << 1) if e >= 0 else ((-e - 1) << 1) | 1

    def write(w):
        w.write(1, 2)          # Rice2 method (5-bit params)
        w.write(2, 4)          # 4 partitions of 16
        for k in range(4):
            w.write(6, 5)
            for e in samples[k * 16:(k + 1) * 16]:
                u = zz(e)
                w.write_unary(u >> 6)
                w.write(u, 6)

    assert flac_decode(_frame_with_residual(samples, write))[1] == samples


def test_wasted_bits_shift():
    samples = [s * 4 for s in _pcm(13, 64)]  # 2 wasted (low) bits

    def write_sub(w):
        pass

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(64, 16)
    si.write(64, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(64, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0110, 4)
    hdr.write(0, 4)
    hdr.write(0, 4)
    hdr.write(0b100, 3)
    hdr.write(0, 1)
    head = bytearray(hdr.bytes()) + b"\x00" + bytes([63])
    head.append(crc8(bytes(head)))
    w = _BitWriter()
    w.write(0, 1)
    w.write(1, 6)          # VERBATIM
    w.write(1, 1)          # wasted-bits flag
    w.write_unary(1)       # k-1=1 -> 2 wasted bits
    for s in samples:
        w.write((s >> 2) & 0x3FFF, 14)  # eff bps = 16 - 2
    w.align()
    frame = bytes(head) + w.bytes()
    data = bytes(out) + frame + struct.pack(">H", crc16(frame))
    assert flac_decode(data)[1] == samples


# -- dead-letter contract ------------------------------------------------------

def test_dead_letter_lanes():
    samples = _pcm(17)
    data = flac_encode(samples)
    cases = {
        "magic": (0, 0xFF),
        # total-samples field: decode must notice the count mismatch
        # (min/max-frame-size bytes are legitimately inert hints)
        "streaminfo": (22, 0xFF),
        "frame header": (4 + 4 + 34 + 1, 0x10),
        "frame body": (len(data) - 6, 0xFF),
        "frame crc16": (len(data) - 1, 0x01),
    }
    for name, (off, mask) in cases.items():
        b = bytearray(data)
        b[off] ^= mask
        with pytest.raises(ValueError):
            flac_decode(bytes(b))
    with pytest.raises(ValueError):
        flac_decode(data[:-3])            # truncated footer
    with pytest.raises(ValueError):
        flac_decode(data[:40])            # truncated metadata


def test_decode_features_dead_letter(spark):
    from tigate_spark.functions.flac import decode_flac_features

    samples = _pcm(23)
    ok = flac_encode(samples)
    bad = bytearray(ok)
    bad[-4] ^= 0xFF
    df = spark.createDataFrame(
        [(1, bytes(ok)), (2, bytes(bad))], "clip_id long, data binary")
    rows = {r["clip_id"]: r for r in decode_flac_features(df).collect()}
    assert rows[1]["decode_ok"] == 1
    assert rows[1]["n_samples"] == 256
    assert rows[1]["sum_pcm"] == sum(samples)
    assert rows[2]["decode_ok"] == 0
    assert rows[2]["sum_pcm"] is None
