"""From-spec PNG codec (functions/png.py) — the real entropy-coded
decode path: all five scanline predictors invert byte-exactly, chunk
CRCs are enforced, and malformed payloads fail typed (dead-letter),
never silently."""

from __future__ import annotations

import struct
import zlib

import pytest

from tigate_spark.functions.png import png_decode, png_encode

W, H = 24, 16


def _px(d, x, y, c):
    return (d * 31 + x * 7 + y * 13 + c * 17) % 256


def _pixels(d, channels=3):
    return [[[_px(d, x, y, c) for c in range(channels)]
             for x in range(W)] for y in range(H)]


@pytest.mark.parametrize("mode", [-1, 0, 1, 2, 3, 4])
def test_round_trip_every_filter(mode):
    pixels = _pixels(7)
    w, h, c, recon = png_decode(png_encode(pixels, mode))
    assert (w, h, c) == (W, H, 3)
    assert recon == bytes(v for row in pixels for p in row for v in p)


def test_round_trip_greyscale():
    g = _pixels(3, channels=1)
    w, h, c, recon = png_decode(png_encode(g))
    assert (w, h, c) == (W, H, 1)
    assert recon == bytes(v for row in g for p in row for v in p)


def test_decodes_external_encoder_output():
    """Cross-check against an INDEPENDENT writer when one is available
    (PIL in dev environments); skipped in the sandbox — the in-repo
    encoder/decoder meet only at the byte level either way."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = PIL.new("RGB", (5, 4))
    img.putdata([(i % 256, (i * 3) % 256, (i * 7) % 256)
                 for i in range(20)])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    w, h, c, recon = png_decode(buf.getvalue())
    assert (w, h, c) == (5, 4, 3)
    assert recon[:3] == bytes([0, 0, 0])


@pytest.mark.parametrize("mutate,msg", [
    (lambda b: b"\x00" + b[1:], "signature"),
    (lambda b: b[:25] + bytes([b[25] ^ 0xFF]) + b[26:], "crc"),
    (lambda b: b[:-8], "truncated|missing"),
])
def test_malformed_payloads_fail_typed(mutate, msg):
    data = png_encode(_pixels(1))
    with pytest.raises(ValueError, match=msg):
        png_decode(mutate(data))


def test_unsupported_features_rejected():
    # 16-bit depth
    data = bytearray(png_encode(_pixels(1)))
    ihdr_off = 8 + 8
    data[ihdr_off + 8] = 16  # bit depth byte
    body = bytes(data[ihdr_off:ihdr_off + 13])
    crc = zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF
    data[ihdr_off + 13:ihdr_off + 17] = struct.pack(">I", crc)
    with pytest.raises(ValueError, match="unsupported bit depth"):
        png_decode(bytes(data))


def test_bad_filter_type_rejected():
    """A syntactically valid stream whose scanline declares filter 9."""
    raw = bytearray()
    for y in range(2):
        raw.append(9 if y == 1 else 0)
        raw += bytes(3 * 2)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    from tigate_spark.functions.png import _SIG, _chunk

    data = (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="unknown filter"):
        png_decode(data)
