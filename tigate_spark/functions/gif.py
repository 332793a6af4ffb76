"""From-spec GIF89a codec (LZW entropy coding) — the fourth from-spec
codec family on the multimodal path (PNG/DEFLATE, JPEG/Huffman+DCT,
ADPCM/adaptive-PCM, now GIF/LZW), stdlib-only.

The DECODER is general:

- header + logical screen descriptor + global color table parse,
- image descriptor (local color tables and interlacing rejected
  explicitly, not misread),
- the GIF variant of LZW from the spec (89a appendix F): variable
  code width starting at ``min_code_size + 1``, CLEAR and EOI codes,
  dictionary growth with width bumps at ``2^width``, the 12-bit cap,
  and the KwKwK case (``code == next_code``),
- palette application → RGB.

The ENCODER is a real LZW compressor (dictionary-building, emitting
CLEAR when the table fills) used by the fixture producer — pixels in,
entropy-coded bytes out, nothing precomputed. GIF is LOSSLESS, so the
catalog oracle reproduces decoded channel sums from the pixel-index
formula + palette arithmetic exactly (the PNG oracle discipline).

Reference parity note: the CDC reference has no image pipeline — this
belongs to the LLM-data-pipeline extension surface (BASELINE.json).
"""

from __future__ import annotations

import struct


# --------------------------------------------------------------------------
# LZW (GIF variant)
# --------------------------------------------------------------------------

def lzw_compress(indices: list[int], min_code_size: int = 8) -> bytes:
    """GIF-variant LZW over a code stream of ``2^min_code_size``-ary
    symbols: emits CLEAR, then dictionary-built codes, bumping the code
    width as the table grows, re-CLEARing at the 12-bit cap, EOI last."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table():
        return ({(i,): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh_table()
    put(clear, width)
    cur: tuple = ()
    for sym in indices:
        cand = cur + (sym,)
        if cand in table:
            cur = cand
            continue
        put(table[cur], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code == (1 << 12) + 1:
            put(clear, width)
            table, next_code, width = fresh_table()
        cur = (sym,)
    if cur:
        put(table[cur], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decompress(data: bytes, min_code_size: int = 8) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def get(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def fresh():
        return ({i: (i,) for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh()
    out: list[int] = []
    prev: tuple | None = None
    while True:
        code = get(width)
        if code == clear:
            table, next_code, width = fresh()
            prev = None
            continue
        if code == eoi:
            return out
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"invalid LZW code {code}")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------

def gif_palette(i: int) -> tuple[int, int, int]:
    """The fixture palette formula (shared with the catalog oracle)."""
    return (i * 7) % 256, (i * 13) % 256, (i * 29) % 256


def gif_encode(indices: list[list[int]]) -> bytes:
    """GIF89a, one image, 256-entry global color table from
    :func:`gif_palette`; ``indices``: H x W palette indices 0-255."""
    h = len(indices)
    w = len(indices[0])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    for i in range(256):
        out += bytes(gif_palette(i))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)  # LZW min code size
    comp = lzw_compress([px for row in indices for px in row])
    for off in range(0, len(comp), 255):
        chunk = comp[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)      # block terminator
    out.append(0x3B)   # trailer
    return bytes(out)


def gif_decode(data: bytes):
    """(width, height, interleaved RGB ints). Raises ValueError on
    structural corruption (dead-letter lane)."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        palette = [tuple(data[pos + 3 * i:pos + 3 * i + 3])
                   for i in range(n)]
        if len(palette[-1]) != 3:
            raise ValueError("truncated color table")
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            raise ValueError("no image data before trailer")
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02x}")
        left, top, iw, ih, iflags = struct.unpack(
            "<HHHHB", data[pos + 1:pos + 10])
        pos += 10
        if iflags & 0x80:
            raise ValueError("local color tables unsupported")
        if iflags & 0x40:
            raise ValueError("interlaced images unsupported")
        if palette is None:
            raise ValueError("no color table")
        min_code = data[pos]
        pos += 1
        comp = bytearray()
        while True:
            ln = data[pos]
            pos += 1
            if ln == 0:
                break
            comp += data[pos:pos + ln]
            pos += ln
        idx = lzw_decompress(bytes(comp), min_code)
        if len(idx) < iw * ih:
            raise ValueError("pixel data short")
        rgb: list[int] = []
        for px in idx[: iw * ih]:
            if px >= len(palette):
                raise ValueError("palette index out of range")
            rgb.extend(palette[px])
        return iw, ih, rgb
    raise ValueError("no image block found")


def decode_gif_features(df, data_col: str = "data", id_col: str = "img_id"):
    """Binary GIF column → typed per-image features over Arrow
    ``mapInPandas`` (same shape as the PNG/JPEG feature decoders)."""
    schema = (f"{id_col} bigint, width bigint, height bigint, "
              "channels bigint, sum_r bigint, sum_g bigint, "
              "sum_b bigint, decode_ok bigint")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for raw_id, payload in zip(pdf[id_col], pdf[data_col]):
                img_id = int(raw_id)
                try:
                    w, h, rgb = gif_decode(bytes(payload))
                    rows.append((img_id, w, h, 3, sum(rgb[0::3]),
                                 sum(rgb[1::3]), sum(rgb[2::3]), 1))
                except (ValueError, struct.error, IndexError):
                    rows.append((img_id, None, None, None,
                                 None, None, None, 0))
            yield pd.DataFrame(rows, columns=[
                id_col, "width", "height", "channels",
                "sum_r", "sum_g", "sum_b", "decode_ok"])

    return df.mapInPandas(run, schema)
