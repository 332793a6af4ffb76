"""From-spec JPEG baseline codec (ITU-T T.81 / JFIF), stdlib + numpy
only — extending the PNG precedent (``functions/png.py``) to the
Huffman-entropy-coded format, retiring the last env-stub note on the
multimodal decode path (PIL/av absent in this sandbox).

The DECODER is a general baseline implementation:

- marker/segment parse (SOI, DQT, SOF0, DHT, SOS, EOI; progressive
  SOF2 and unsupported markers rejected, not misread),
- canonical Huffman tables rebuilt from the file's DHT BITS/HUFFVAL,
- entropy decode with byte unstuffing (FF 00), DC prediction per
  component, AC run-length (EOB/ZRL) per T.81 F.2,
- dezigzag + dequantize per the file's DQT,
- 2-D IDCT (orthonormal matrix form, numpy),
- 4:2:0 / 4:4:4 chroma upsampling + JFIF YCbCr→RGB.

The ENCODER is the test-fixture producer (general FDCT path — it
quantizes real DCT output, not precomputed coefficients). Both ends
pin DC quantization step = 8 in the shipped tables: dequantized DC/8
is then integral, so a FLAT 8x8 block round-trips bit-exactly and the
catalog oracle can reproduce decoded pixels with pure closed-form
arithmetic (the same trick as the PNG pixel-formula oracle — the
oracle never sees bytes). Non-flat content exercises the full AC path
under the spec's accuracy bounds in pytest instead (cross-engine
float cos() is not bit-pinnable, so it stays out of the oracle).

Rounding contract shared by encoder, decoder, and the DuckDB oracle:
``floor(x + 0.5)`` everywhere (written identically on both engines),
quantization rounds half away from zero symmetrically.

Reference parity note: the CDC reference has no image pipeline — this
belongs to the LLM-data-pipeline extension surface (BASELINE.json).
"""

from __future__ import annotations

import math
import struct

import numpy as np

# --------------------------------------------------------------------------
# tables
# --------------------------------------------------------------------------

#: classic example quantization tables (T.81 Annex K.1) with the DC step
#: OVERRIDDEN to 8 — see module docstring (flat-block exactness)
_Q_LUMA = [
    8, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_Q_CHROMA = [
    8, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def _zigzag() -> list[int]:
    """natural index for each zigzag position (generated, not typed)."""
    order = sorted(((x + y, (y if (x + y) % 2 else x), x, y)
                    for y in range(8) for x in range(8)))
    return [y * 8 + x for (_, _, x, y) in order]


_ZIGZAG = _zigzag()

#: our DHT layout (spec-valid canonical tables; the decoder reads
#: whatever the file declares, so these only pin the ENCODER side):
#: DC = 12 category symbols, all 4-bit codes; AC = the 162 baseline
#: symbols (EOB, 16 runs x 10 sizes, ZRL), all 9-bit codes — flat
#: lengths keep the all-ones max-length prefix unused, as T.81 requires
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_BITS = [0] * 8 + [162] + [0] * 7
_AC_VALS = [0x00] + [(r << 4) | s for r in range(16)
                     for s in range(1, 11)] + [0xF0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """symbol -> (code, length) per the T.81 C.2 canonical assignment."""
    if sum(bits) != len(vals):
        raise ValueError("corrupt Huffman table: BITS/HUFFVAL mismatch")
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_matrix() -> np.ndarray:
    c = np.zeros((8, 8))
    for u in range(8):
        cu = math.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            c[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return c


_C = _dct_matrix()


def _round_half_up(a: np.ndarray) -> np.ndarray:
    return np.floor(a + 0.5)


def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """round half away from zero, symmetric (libjpeg's behavior)."""
    return np.sign(coef) * np.floor(np.abs(coef) / q + 0.5)


# --------------------------------------------------------------------------
# bit I/O (entropy-coded segment; FF bytes stuffed with 00)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per F.1.2.3
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("entropy segment truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("entropy segment truncated at FF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    """F.2.2.1 EXTEND: map the `size` raw bits to a signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# --------------------------------------------------------------------------
# encoder (fixture producer)
# --------------------------------------------------------------------------

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)
    cb = np.floor(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5)
    cr = np.floor(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5)
    return np.clip(np.stack([y, cb, cr], axis=-1), 0, 255)


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int, dc_codes: dict, ac_codes: dict) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    qc = _quantize(coef, q.reshape(8, 8)).astype(np.int64)
    zz = [int(qc.flat[_ZIGZAG[i]]) for i in range(64)]
    diff = zz[0] - pred
    size = _category(diff)
    code, ln = dc_codes[size]
    bw.put(code, ln)
    if size:
        bw.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    # AC run-length per F.1.2.2
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            c, l = ac_codes[0xF0]  # ZRL
            bw.put(c, l)
            run -= 16
        s = _category(zz[i])
        c, l = ac_codes[(run << 4) | s]
        bw.put(c, l)
        bw.put(zz[i] if zz[i] >= 0 else zz[i] + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = ac_codes[0x00]  # EOB
        bw.put(c, l)
    return zz[0]


def jpeg_encode(pixels) -> bytes:
    """Baseline 4:2:0 JFIF encoder over an H x W x 3 array (H, W
    multiples of 16; the fixture producer — general FDCT + quantize +
    Huffman, not a flat-block shortcut)."""
    rgb = np.asarray(pixels, dtype=np.float64)
    h, w = rgb.shape[0], rgb.shape[1]
    if h % 16 or w % 16:
        raise ValueError("encoder fixture requires 16-aligned dims")
    ycc = _rgb_to_ycbcr(rgb)
    y = ycc[..., 0]
    # 4:2:0: chroma = rounded mean of each 2x2 (flat regions: identity)
    cb = np.floor(ycc[..., 1].reshape(h // 2, 2, w // 2, 2)
                  .mean(axis=(1, 3)) + 0.5)
    cr = np.floor(ycc[..., 2].reshape(h // 2, 2, w // 2, 2)
                  .mean(axis=(1, 3)) + 0.5)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    ql = np.array(_Q_LUMA, dtype=np.float64)
    qc = np.array(_Q_CHROMA, dtype=np.float64)

    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    blk = y[my * 16 + by * 8:my * 16 + by * 8 + 8,
                            mx * 16 + bx * 8:mx * 16 + bx * 8 + 8]
                    preds[0] = _encode_block(
                        bw, blk, ql, preds[0], dc_codes, ac_codes)
            for ci, comp in ((1, cb), (2, cr)):
                blk = comp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                preds[ci] = _encode_block(
                    bw, blk, qc, preds[ci], dc_codes, ac_codes)
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFDB, bytes([0]) + bytes(_Q_LUMA))          # DQT Tq=0
    out += seg(0xFFDB, bytes([1]) + bytes(_Q_CHROMA))        # DQT Tq=1
    out += seg(0xFFC0, struct.pack(                          # SOF0
        ">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])    # Y: h=2 v=2, quant 0
        + bytes([2, 0x11, 1])    # Cb: 1x1, quant 1
        + bytes([3, 0x11, 1]))   # Cr
    out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder (general baseline)
# --------------------------------------------------------------------------

def _decode_huffman(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def jpeg_decode(data: bytes):
    """(width, height, n_components, interleaved pixel list). Raises
    ValueError on any structural corruption (dead-letter lane)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> (len,code)->sym
    sof = None
    scan_comps = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("EOI before SOS")
        if marker in (0xC2, 0xC1, 0xC3):
            raise ValueError("only baseline SOF0 is supported")
        (ln,) = struct.unpack(">H", data[pos:pos + 2])
        seg = data[pos + 2:pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit DQT unsupported in baseline")
                qt[tq] = np.array(list(seg[p + 1:p + 65]),
                                  dtype=np.float64)
                if qt[tq].size != 64 or not qt[tq].all():
                    raise ValueError("corrupt DQT")
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                if len(vals) != nv:
                    raise ValueError("corrupt DHT: truncated HUFFVAL")
                codes = _canonical_codes(bits, vals)
                huff[(tc, th)] = {(l, c): s for s, (c, l) in codes.items()}
                p += 17 + nv
            if p != len(seg):
                raise ValueError("corrupt DHT: trailing bytes")
        elif marker == 0xC0:  # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            sof = {"w": w, "h": h, "comps": comps}
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4,
                           seg[2 + 2 * i] & 0x0F) for i in range(ns)]
            pos += ln
            break
        pos += ln
    if sof is None or scan_comps is None:
        raise ValueError("missing SOF/SOS")

    comps = sof["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(c["h"] in (1, 2) and c["v"] in (1, 2) for c in comps):
        raise ValueError("unsupported sampling factors")
    mcux = -(-sof["w"] // (8 * hmax))
    mcuy = -(-sof["h"] // (8 * vmax))
    for cid, td, ta in scan_comps:
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("scan references missing Huffman table")

    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)))
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    tbl = {c["id"]: (huff[(0, td)], huff[(1, ta)])
           for cid, td, ta in scan_comps
           for c in comps if c["id"] == cid}
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                dct, act = tbl[c["id"]]
                q = qt.get(c["tq"])
                if q is None:
                    raise ValueError("missing DQT")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        size = _decode_huffman(br, dct)
                        diff = _extend(br.bits(size), size)
                        preds[ci] += diff
                        zz = [0] * 64
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _decode_huffman(br, act)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, s = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63 or s == 0:
                                raise ValueError("AC index out of range")
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        coef = np.zeros(64)
                        for i in range(64):
                            coef[_ZIGZAG[i]] = zz[i] * q[i]
                        blk = _C.T @ coef.reshape(8, 8) @ _C
                        samp = np.clip(_round_half_up(blk + 128.0), 0, 255)
                        oy = (my * c["v"] + by) * 8
                        ox = (mx * c["h"] + bx) * 8
                        planes[ci][oy:oy + 8, ox:ox + 8] = samp

    w, h = sof["w"], sof["h"]
    up = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, hmax // c["h"], axis=1),
                      vmax // c["v"], axis=0)
        up.append(p[:h, :w])
    if len(comps) == 1:
        return w, h, 1, [int(v) for v in up[0].astype(np.int64).flat]
    y, cb, cr = up[0], up[1], up[2]
    r = np.clip(np.floor(y + 1.402 * (cr - 128.0) + 0.5), 0, 255)
    g = np.clip(np.floor(y - 0.344136 * (cb - 128.0)
                         - 0.714136 * (cr - 128.0) + 0.5), 0, 255)
    b = np.clip(np.floor(y + 1.772 * (cb - 128.0) + 0.5), 0, 255)
    inter = np.stack([r, g, b], axis=-1).astype(np.int64)
    return w, h, 3, [int(v) for v in inter.flat]


def decode_jpeg_features(df, data_col: str = "data", id_col: str = "img_id"):
    """Binary JPEG column → typed per-image features over Arrow
    ``mapInPandas`` (same shape as ``decode_png_features``): (img_id,
    width, height, channels, sum_r, sum_g, sum_b, decode_ok). Corrupt
    images land in the dead-letter lane (decode_ok=0, null fields)."""
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
                    w, h, c, recon = jpeg_decode(bytes(payload))
                    sums = [0, 0, 0]
                    for ch in range(c):
                        sums[ch] = sum(recon[ch::c])
                    rows.append((img_id, w, h, c, sums[0],
                                 sums[1] if c == 3 else None,
                                 sums[2] if c == 3 else None, 1))
                except (ValueError, KeyError, IndexError, struct.error):
                    rows.append((img_id, None, None, None,
                                 None, None, None, 0))
            yield pd.DataFrame(rows, columns=[
                id_col, "width", "height", "channels",
                "sum_r", "sum_g", "sum_b", "decode_ok"])

    return df.mapInPandas(run, schema)
