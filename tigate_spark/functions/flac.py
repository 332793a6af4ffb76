"""From-spec FLAC audio codec (RFC 9639 subset) — the sixth from-spec
codec family (PNG/DEFLATE, JPEG/Huffman+DCT, GIF/LZW, ADPCM/IMA), and
the second REAL audio container feeding the audio-dedup chain,
stdlib-only.

The DECODER is general over the subset a curation pipeline meets:
``fLaC`` magic, STREAMINFO metadata block (+ skipping any others),
fixed-blocking frames with CRC-8-checked headers and CRC-16-checked
bodies, and the four subframe families — CONSTANT, VERBATIM, FIXED
(orders 0-4) and LPC (any order, quantized coefficients + shift) — with
Rice/Rice2-coded residual partitions including the escape-to-raw lane
and wasted-bits shifting. Every structural or CRC violation raises
``ValueError`` (the dead-letter lane, same contract as the sibling
codecs).

The ENCODER is a real subset compressor: per-frame subframe choice
(verbatim / fixed predictor / explicit quantized-LPC), best-fit Rice
parameter per partition, and the bit-exact header/CRC framing — used by
the fixture producer AND by round-trip property tests. FLAC is
LOSSLESS, so the catalog oracle never replays codec state: decoded PCM
equals the closed-form sample formula, and the oracle reproduces the
aggregates from the formula alone (the GIF lossless-oracle discipline).

Bit-level forms (RFC 9639):

- unary = n ``0`` bits then a ``1``; Rice value = (unary<<p)|p-bit LSBs,
  then zigzag ``(u >> 1) ^ -(u & 1)``.
- frame header: 14-bit sync ``0b11111111111110``, reserved 0, blocking
  strategy; 4-bit blocksize code / 4-bit sample-rate code; 4-bit channel
  assignment / 3-bit sample-size code / reserved 0; UTF-8-coded frame
  number; tail blocksize/rate fields; CRC-8 (poly 0x07).
- subframe header: pad 0, 6-bit type (0 CONSTANT, 1 VERBATIM, 8+k FIXED,
  32+k-1 LPC), wasted-bits flag + unary count.
- fixed predictors: 0; x1; 2x1-x2; 3x1-3x2+x3; 4x1-6x2+4x3-x4.
- LPC: order warmup, precision-1 (4 bits), shift (5 bits, signed),
  order signed coefficients; pred = (sum c_j * x_{i-1-j}) >> shift.
- residual: 2-bit method (0 Rice/4-bit params, 1 Rice2/5-bit), 4-bit
  partition order; per partition a parameter or the all-ones escape
  followed by 5-bit raw bit count.
- frame tail: zero-pad to byte, CRC-16 (poly 0x8005) of the whole frame.

Reference parity note: the CDC reference has no audio pipeline — this
belongs to the LLM-data-pipeline extension surface (BASELINE.json).
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# CRCs (RFC 9639 §9.2: CRC-8 poly 0x07, CRC-16 poly 0x8005, both init 0)
# ---------------------------------------------------------------------------

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07 if _c & 0x80 else _c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005 if _c & 0x8000 else _c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16_TABLE[(c >> 8) ^ b] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# bit I/O (MSB-first, like the wire)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self._acc = (self._acc << bits) | (value & ((1 << bits) - 1))
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def bytes(self) -> bytes:
        assert self._n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, bits: int) -> int:
        v = 0
        while bits:
            if self.byte >= len(self.data):
                raise ValueError("bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            chunk = (self.data[self.byte] >> (avail - take)) & (
                (1 << take) - 1)
            v = (v << take) | chunk
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        return v - (1 << bits) if v >> (bits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("unary run overflow")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


# ---------------------------------------------------------------------------
# encoder (fixture producer + round-trip tests)
# ---------------------------------------------------------------------------

_FIXED_PRED = (
    lambda x, i: 0,
    lambda x, i: x[i - 1],
    lambda x, i: 2 * x[i - 1] - x[i - 2],
    lambda x, i: 3 * x[i - 1] - 3 * x[i - 2] + x[i - 3],
    lambda x, i: 4 * x[i - 1] - 6 * x[i - 2] + 4 * x[i - 3] - x[i - 4],
)


def _best_rice_param(residuals: list[int], max_param: int = 14) -> int:
    if not residuals:
        return 0
    tot = sum((e << 1) ^ (e >> 63) if e >= 0 else ((-e - 1) << 1) | 1
              for e in residuals)
    best, best_bits = 0, None
    for p in range(max_param + 1):
        bits = len(residuals) * (p + 1) + (tot >> p)
        if best_bits is None or bits < best_bits:
            best, best_bits = p, bits
    return best


def _write_rice_block(w: _BitWriter, residuals: list[int],
                      partition_order: int = 0) -> None:
    """Residual coding method 0 (Rice, 4-bit params) over 2^order equal
    partitions (the caller guarantees divisibility)."""
    w.write(0, 2)                       # method 0: RICE
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    per = len(residuals) // nparts
    for k in range(nparts):
        part = residuals[k * per:(k + 1) * per]
        p = _best_rice_param(part)
        w.write(p, 4)
        for e in part:
            u = (e << 1) ^ (e >> 63) if e >= 0 else ((-e - 1) << 1) | 1
            w.write_unary(u >> p)
            w.write(u, p)


def _utf8_coded(n: int) -> bytes:
    """The frame-number coding (UTF-8-style, up to 36 bits): an m-byte
    form carries (7 - m) leading-byte bits + 6 per continuation."""
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        if n < 1 << ((7 - nbytes) + 6 * (nbytes - 1)):
            break
    else:
        raise ValueError("frame number out of the 36-bit domain")
    shift = 6 * (nbytes - 1)
    lead_prefix = (0xFF << (8 - nbytes)) & 0xFF
    out = [lead_prefix | (n >> shift)]
    for _ in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def flac_encode(samples: list[int], sample_rate: int = 8000,
                blocksize: int = 64, bps: int = 16,
                frame_plan=None) -> bytes:
    """Subset FLAC stream: STREAMINFO + fixed-blocking mono frames.

    ``frame_plan(frame_idx)`` returns the subframe choice for that
    frame: ``("verbatim",)``, ``("constant",)`` (frame must be flat),
    ``("fixed", order)`` or ``("lpc", coeffs, shift, precision)`` —
    default picks the cheapest fixed order per frame. Lossless for any
    int PCM within ``bps``."""
    if len(samples) % blocksize:
        raise ValueError("sample count must be a multiple of blocksize")
    nframes = len(samples) // blocksize
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)                       # channels - 1 (mono)
    si.write(bps - 1, 5)
    si.write(len(samples), 36)
    body = si.bytes() + b"\x00" * 16     # md5 unset (decoder skips)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for f in range(nframes):
        x = samples[f * blocksize:(f + 1) * blocksize]
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)  # sync
        hdr.write(0, 1)                  # reserved
        hdr.write(0, 1)                  # fixed blocksize strategy
        hdr.write(0b0110, 4)             # blocksize: 8-bit at end
        hdr.write(0b0000, 4)             # rate: from STREAMINFO
        hdr.write(0b0000, 4)             # channels: mono
        hdr.write(0b100, 3)              # sample size: 16
        hdr.write(0, 1)                  # reserved
        head = bytearray(hdr.bytes())
        head += _utf8_coded(f)
        head.append(blocksize - 1)       # the 8-bit tail blocksize
        head.append(crc8(bytes(head)))

        w = _BitWriter()
        choice = frame_plan(f) if frame_plan else ("fixed", _pick_order(x))
        if choice[0] == "constant":
            if any(s != x[0] for s in x):
                raise ValueError("constant subframe on non-flat block")
            w.write(0, 1)
            w.write(0, 6)
            w.write(0, 1)
            w.write(x[0] & ((1 << bps) - 1), bps)
        elif choice[0] == "verbatim":
            w.write(0, 1)
            w.write(1, 6)
            w.write(0, 1)
            for s in x:
                w.write(s & ((1 << bps) - 1), bps)
        elif choice[0] == "fixed":
            order = choice[1]
            w.write(0, 1)
            w.write(8 + order, 6)
            w.write(0, 1)
            for s in x[:order]:
                w.write(s & ((1 << bps) - 1), bps)
            res = [x[i] - _FIXED_PRED[order](x, i)
                   for i in range(order, len(x))]
            _write_rice_block(w, res)
        elif choice[0] == "lpc":
            _, coeffs, shift, precision = choice
            order = len(coeffs)
            w.write(0, 1)
            w.write(32 + order - 1, 6)
            w.write(0, 1)
            for s in x[:order]:
                w.write(s & ((1 << bps) - 1), bps)
            w.write(precision - 1, 4)
            w.write(shift & 0x1F, 5)
            for c in coeffs:
                w.write(c & ((1 << precision) - 1), precision)
            res = [x[i] - (sum(coeffs[j] * x[i - 1 - j]
                               for j in range(order)) >> shift)
                   for i in range(order, len(x))]
            _write_rice_block(w, res)
        else:
            raise ValueError(f"unknown frame plan {choice!r}")
        w.align()
        frame = bytes(head) + w.bytes()
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)


def _pick_order(x: list[int]) -> int:
    best, best_cost = 0, None
    for order in range(min(5, len(x))):
        cost = sum(abs(x[i] - _FIXED_PRED[order](x, i))
                   for i in range(order, len(x)))
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


# ---------------------------------------------------------------------------
# decoder (independent from-spec parser; ValueError = dead-letter)
# ---------------------------------------------------------------------------


def _read_utf8_coded(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8-coded frame number")
    v = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(r: _BitReader, blocksize: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("bad residual partition geometry")
    res: list[int] = []
    for k in range(nparts):
        n = (blocksize >> porder) - (order if k == 0 else 0)
        if n <= 0:
            raise ValueError("bad residual partition geometry")
        p = r.read(pbits)
        if p == escape:
            raw = r.read(5)
            for _ in range(n):
                res.append(r.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << p) | r.read(p)
                res.append((u >> 1) ^ -(u & 1))
    return res


def _read_subframe(r: _BitReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1):
        raise ValueError("subframe header padding bit set")
    ty = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if ty == 0:                                   # CONSTANT
        v = r.read_signed(eff)
        x = [v] * blocksize
    elif ty == 1:                                 # VERBATIM
        x = [r.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= ty <= 12:                           # FIXED
        order = ty - 8
        x = [r.read_signed(eff) for _ in range(order)]
        for e in _read_residual(r, blocksize, order):
            x.append(e + _FIXED_PRED[order](x, len(x)))
    elif ty >= 32:                                # LPC
        order = ty - 31
        x = [r.read_signed(eff) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coeffs = [r.read_signed(precision) for _ in range(order)]
        for e in _read_residual(r, blocksize, order):
            pred = sum(coeffs[j] * x[len(x) - 1 - j]
                       for j in range(order)) >> shift
            x.append(e + pred)
    else:
        raise ValueError(f"reserved subframe type {ty}")
    if wasted:
        x = [s << wasted for s in x]
    return x


#: frame-header blocksize codes → (fixed value | ('tail', bits))
_BS_CODE = {1: 192, **{n: 576 << (n - 2) for n in range(2, 6)},
            6: ("tail", 8), 7: ("tail", 16),
            **{n: 256 << (n - 8) for n in range(8, 16)}}


def flac_decode(data: bytes) -> tuple[int, list[int]]:
    """(sample_rate, PCM samples). Raises ValueError on any structural
    corruption or CRC mismatch (the dead-letter lane)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + ln]
        if len(body) != ln:
            raise ValueError("truncated metadata block")
        if btype == 0:
            if ln != 34:
                raise ValueError("bad STREAMINFO length")
            r = _BitReader(body)
            min_bs, max_bs = r.read(16), r.read(16)
            r.read(24), r.read(24)
            rate = r.read(20)
            channels = r.read(3) + 1
            bps = r.read(5) + 1
            total = r.read(36)
            info = (min_bs, max_bs, rate, channels, bps, total)
        elif btype == 127:
            raise ValueError("invalid metadata block type")
        pos += 4 + ln
        if last:
            break
    if info is None:
        raise ValueError("missing STREAMINFO")
    min_bs, max_bs, rate, channels, bps, total = info
    if channels != 1:
        raise ValueError("only mono supported")
    samples: list[int] = []
    while pos < len(data) and len(samples) < total:
        r = _BitReader(data, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        if r.read(1):
            raise ValueError("frame header reserved bit set")
        r.read(1)                         # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan = r.read(4)
        size_code = r.read(3)
        if r.read(1):
            raise ValueError("frame header reserved bit set")
        if chan != 0:
            raise ValueError("only mono frames supported")
        _read_utf8_coded(r)
        if bs_code == 0:
            raise ValueError("reserved blocksize code")
        bs = _BS_CODE[bs_code]
        if isinstance(bs, tuple):
            bs = r.read(bs[1]) + 1
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise ValueError("invalid sample-rate code")
        r.align()
        if r.byte >= len(data):
            raise ValueError("truncated frame header")
        if crc8(data[pos:r.byte]) != data[r.byte]:
            raise ValueError("frame header CRC-8 mismatch")
        r.byte += 1
        if size_code == 3:
            raise ValueError("reserved sample-size code")
        eff_bps = {0: bps, 1: 8, 2: 12, 4: 16, 5: 20, 6: 24,
                   7: 32}[size_code]
        x = _read_subframe(r, bs, eff_bps)
        r.align()
        if r.byte + 2 > len(data):
            raise ValueError("truncated frame footer")
        if crc16(data[pos:r.byte]) != struct.unpack(
                ">H", data[r.byte:r.byte + 2])[0]:
            raise ValueError("frame CRC-16 mismatch")
        samples.extend(x)
        pos = r.byte + 2
    if len(samples) != total:
        raise ValueError("decoded sample count != STREAMINFO total")
    return rate, samples


# ---------------------------------------------------------------------------
# Spark consumer surface (Arrow mapInPandas — the multimodal decode shape)
# ---------------------------------------------------------------------------


def decode_flac_features(df, data_col: str = "data",
                         id_col: str = "clip_id"):
    """Binary FLAC column → typed per-clip features over Arrow
    ``mapInPandas``: (clip_id, sample_rate, n_samples, sum_pcm, min_pcm,
    max_pcm, decode_ok); corrupt clips dead-letter with decode_ok=0."""
    schema = (f"{id_col} bigint, sample_rate bigint, n_samples bigint, "
              "sum_pcm bigint, min_pcm bigint, max_pcm bigint, "
              "decode_ok bigint")

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for raw_id, payload in zip(pdf[id_col], pdf[data_col]):
                cid = int(raw_id)
                try:
                    rate, pcm = flac_decode(bytes(payload))
                    rows.append((cid, rate, len(pcm), sum(pcm),
                                 min(pcm), max(pcm), 1))
                except (ValueError, struct.error, IndexError, KeyError):
                    rows.append((cid, None, None, None, None, None, 0))
            yield pd.DataFrame(rows, columns=[
                id_col, "sample_rate", "n_samples", "sum_pcm",
                "min_pcm", "max_pcm", "decode_ok"])

    return df.mapInPandas(run, schema)
