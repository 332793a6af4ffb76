"""From-spec GIF89a / LZW codec (functions/gif.py): LZW round trips
across the table-cap and KwKwK paths, container parse/reject matrix,
and lossless pixel recovery."""

from __future__ import annotations

import random
import struct

import pytest

from tigate_spark.functions.gif import (
    decode_gif_features,
    gif_decode,
    gif_encode,
    gif_palette,
    lzw_compress,
    lzw_decompress,
)


def test_lzw_roundtrip_random_and_adversarial():
    rng = random.Random(11)
    for _ in range(8):
        seq = [rng.randrange(256) for _ in range(rng.randrange(1, 30000))]
        assert lzw_decompress(lzw_compress(seq)) == seq
    # KwKwK (repeated runs) + 12-bit table-cap re-CLEAR + width bumps
    seq = [5] * 6000 + [1, 2] * 3000 + list(range(256)) * 30
    assert lzw_decompress(lzw_compress(seq)) == seq
    # compresses for real on repetitive input
    assert len(lzw_compress([7] * 10000)) < 400


def test_lzw_invalid_code_rejected():
    with pytest.raises(ValueError):
        lzw_decompress(b"\xff\xff\xff\xff")
    with pytest.raises(ValueError):
        lzw_decompress(b"")


def test_container_lossless():
    idx = [[(x * 3 + y * 7) % 256 for x in range(40)] for y in range(24)]
    w, h, rgb = gif_decode(gif_encode(idx))
    assert (w, h) == (40, 24)
    exp = [c for row in idx for px in row for c in gif_palette(px)]
    assert rgb == exp


def test_extension_blocks_skipped():
    data = bytearray(gif_encode([[1, 2], [3, 4]]))
    # splice a graphic-control extension right before the image block
    img_at = data.index(0x2C, 13 + 768)
    ext = bytes([0x21, 0xF9, 0x04, 0, 0, 0, 0, 0])
    spliced = bytes(data[:img_at]) + ext + bytes(data[img_at:])
    w, h, rgb = gif_decode(spliced)
    assert (w, h) == (2, 2) and len(rgb) == 12


def test_corruption_matrix():
    data = gif_encode([[i % 256 for i in range(16)] for _ in range(8)])
    for off, why in ((0, "magic"), (10, "LSD flags")):
        b = bytearray(data)
        b[off] ^= 0xFF
        with pytest.raises((ValueError, struct.error, IndexError)):
            gif_decode(bytes(b))
    with pytest.raises((ValueError, struct.error, IndexError)):
        gif_decode(data[: len(data) // 2])
    # interlace flag set → explicit reject, not garbled output
    b = bytearray(data)
    img_at = b.index(0x2C, 13 + 768)
    b[img_at + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        gif_decode(bytes(b))


def test_decode_features_mapinpandas(spark):
    ids = spark.range(5).selectExpr("id * 97 as img_id")

    def gen(batches):
        import pandas as pd

        from tigate_spark.functions.gif import gif_encode as enc

        for pdf in batches:
            rows = []
            for i in pdf["img_id"]:
                d = int(i)
                data = enc([[(d + x + y) % 256 for x in range(8)]
                            for y in range(8)])
                if d == 0:
                    data = data[:30]
                rows.append((d, data))
            yield pd.DataFrame(rows, columns=["img_id", "data"])

    out = decode_gif_features(
        ids.mapInPandas(gen, "img_id bigint, data binary")).collect()
    by_id = {r.img_id: r for r in out}
    assert by_id[0].decode_ok == 0
    assert all(r.decode_ok == 1 and (r.width, r.height) == (8, 8)
               for r in out if r.img_id != 0)
