"""From-spec LZ4 block + frame codec and xxHash32 (pure Python).

The reference compresses per-message values with tiflow
``pkg/compression`` (none/lz4/snappy); its lz4 lane writes the LZ4
FRAME format (``lz4.NewWriter`` over a bytes buffer). This module
implements, from the public specs only:

- xxHash32 (the frame format's header/content checksum hash),
- the LZ4 block format (token / literal-run / 2-byte offset / match
  run, min match 4, end-of-block rules),
- the LZ4 frame format (magic ``0x184D2204``, FLG/BD descriptor +
  header checksum byte, data blocks with a high-bit uncompressed
  marker, EndMark, optional block and content checksums),

so the seam produces and consumes reference-interoperable lz4 wires
without the native lib — the same from-spec posture as the snappy
sibling (``snappy_codec.py``) and the media codec families. The
encoder emits block-independent frames with a content checksum; the
decoder accepts any conforming frame (either checksum optional,
compressed or stored blocks, any block-max size). ``block_compress``
honors the spec's end-of-block constraints (last 5 bytes are literals;
no match starts within the last 12 bytes) so any decoder —
including the reference's — reads the output.
"""

from __future__ import annotations


class LZ4Error(ValueError):
    """Corrupt or truncated LZ4 block/frame."""


# ---------------------------------------------------------------- xxHash32

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M32, 13) * _P1) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 over ``data`` (reference vectors pinned in tests)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            v1 = _round(v1, int.from_bytes(data[pos:pos + 4], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 4:pos + 8], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 8:pos + 12], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 12:pos + 16], "little"))
            pos += 16
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
               + _rotl(v4, 18)) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        acc = (_rotl(
            (acc + int.from_bytes(data[pos:pos + 4], "little") * _P3) & _M32,
            17) * _P4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl((acc + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


# ------------------------------------------------------------- block format


def block_decompress(data: bytes, max_size: int | None = None,
                     prefix: bytes = b"") -> bytes:
    """Decode one LZ4 block (sequences of literals + matches).

    ``prefix`` is the already-decoded frame content for BLOCK-DEPENDENT
    frames (FLG B.Indep clear): matches may reach up to 64 KiB back
    into it. Returns only this block's bytes."""
    out = bytearray(prefix[-65536:] if prefix else b"")
    base = len(out)
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise LZ4Error("truncated literal length")
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise LZ4Error("truncated literals")
        out += data[pos:pos + lit]
        pos += lit
        if pos == n:  # last sequence carries literals only
            break
        if pos + 2 > n:
            raise LZ4Error("truncated match offset")
        off = int.from_bytes(data[pos:pos + 2], "little")
        pos += 2
        if off == 0 or off > len(out):
            raise LZ4Error(f"match offset {off} out of range")
        ml = token & 0xF
        if ml == 15:
            while True:
                if pos >= n:
                    raise LZ4Error("truncated match length")
                b = data[pos]
                pos += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        src = len(out) - off
        if off >= ml:
            out += out[src:src + ml]
        else:  # overlap: repeat the pattern forward
            for i in range(ml):
                out.append(out[src + i])
        if max_size is not None and len(out) - base > max_size:
            raise LZ4Error("block exceeds declared content size")
    return bytes(out[base:])


def _emit_seq(out: bytearray, lits: bytes, off: int, ml: int) -> None:
    lit = len(lits)
    tok_lit = 15 if lit >= 15 else lit
    if ml:  # ml is the full match length (>= 4); token stores ml-4
        m = ml - 4
        tok_m = 15 if m >= 15 else m
    else:
        tok_m = 0
    out.append((tok_lit << 4) | tok_m)
    if lit >= 15:
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += lits
    if ml:
        out += off.to_bytes(2, "little")
        m = ml - 4
        if m >= 15:
            rem = m - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)


def block_compress(data: bytes) -> bytes:
    """Encode one LZ4 block (greedy 4-byte-hash matcher).

    Honors the end-of-block rules: the final 5 bytes are always
    literals and no match extends into the last 5 or starts past
    ``len-12``; inputs < 13 bytes are emitted as one literal run.
    """
    n = len(data)
    out = bytearray()
    if n < 13:
        _emit_seq(out, data, 0, 0)
        return bytes(out)
    table: dict[bytes, int] = {}
    setdefault = table.setdefault
    pos = 0
    lit_start = 0
    match_limit = n - 12  # last match must start before here (spec)
    end_guard = n - 5     # matches may not cover the last 5 bytes
    while pos < match_limit:
        quad = data[pos:pos + 4]
        cand = setdefault(quad, pos)
        if cand == pos:
            pos += 1
            continue
        if pos - cand > 0xFFFF:  # stale entry beyond the window:
            table[quad] = pos    # refresh and move on
            pos += 1
            continue
        # extend the match: 64-byte slice compares (C speed) then a
        # byte-wise tail — a long match must not cost a Python loop
        # iteration per byte
        ln = 4
        while (pos + ln + 64 <= end_guard
               and data[cand + ln:cand + ln + 64]
               == data[pos + ln:pos + ln + 64]):
            ln += 64
        while pos + ln < end_guard and data[cand + ln] == data[pos + ln]:
            ln += 1
        _emit_seq(out, data[lit_start:pos], pos - cand, ln)
        pos += ln
        lit_start = pos
    _emit_seq(out, data[lit_start:], 0, 0)
    return bytes(out)


# ------------------------------------------------------------- frame format

_MAGIC = 0x184D2204
#: BD max-size code -> bytes (frame spec table)
_BD_SIZES = {4: 1 << 16, 5: 1 << 18, 6: 1 << 20, 7: 1 << 22}


def frame_compress(data: bytes, block_max: int = 1 << 22,
                   content_checksum: bool = True) -> bytes:
    """Write one LZ4 frame: block-independent, optional content checksum."""
    bd_code = next(
        (c for c, s in sorted(_BD_SIZES.items()) if s >= block_max), 7)
    flg = (1 << 6) | (1 << 5) | ((1 << 2) if content_checksum else 0)
    bd = bd_code << 4
    header = bytes([flg, bd])
    out = bytearray(_MAGIC.to_bytes(4, "little"))
    out += header
    out.append((xxh32(header) >> 8) & 0xFF)
    size = _BD_SIZES[bd_code]
    for start in range(0, len(data), size):
        chunk = data[start:start + size]
        comp = block_compress(chunk)
        if len(comp) < len(chunk):
            out += len(comp).to_bytes(4, "little")
            out += comp
        else:  # stored block: high bit flags uncompressed
            out += (len(chunk) | 0x80000000).to_bytes(4, "little")
            out += chunk
    out += (0).to_bytes(4, "little")  # EndMark
    if content_checksum:
        out += xxh32(data).to_bytes(4, "little")
    return bytes(out)


def frame_decompress(data: bytes) -> bytes:
    """Read one LZ4 frame (any conforming layout)."""
    if len(data) < 7:
        raise LZ4Error("truncated frame header")
    if int.from_bytes(data[0:4], "little") != _MAGIC:
        raise LZ4Error("bad LZ4 frame magic")
    flg = data[4]
    if (flg >> 6) != 1:
        raise LZ4Error(f"unsupported frame version {flg >> 6}")
    block_indep = bool(flg & (1 << 5))
    block_checksum = bool(flg & (1 << 4))
    content_size_flag = bool(flg & (1 << 3))
    content_checksum = bool(flg & (1 << 2))
    if flg & 1:
        raise LZ4Error("dictionary frames not supported")
    bd = data[5]
    bd_code = (bd >> 4) & 7
    if bd_code not in _BD_SIZES:
        raise LZ4Error(f"reserved block-max-size code {bd_code}")
    pos = 6
    declared = None
    if content_size_flag:
        if len(data) < pos + 8:
            raise LZ4Error("truncated content size")
        declared = int.from_bytes(data[pos:pos + 8], "little")
        pos += 8
    hc = data[pos]
    pos += 1
    if ((xxh32(data[4:pos - 1]) >> 8) & 0xFF) != hc:
        raise LZ4Error("frame header checksum mismatch")
    out = bytearray()
    max_block = _BD_SIZES[bd_code]
    while True:
        if len(data) < pos + 4:
            raise LZ4Error("truncated block size")
        word = int.from_bytes(data[pos:pos + 4], "little")
        pos += 4
        if word == 0:  # EndMark
            break
        stored = bool(word & 0x80000000)
        size = word & 0x7FFFFFFF
        if size > max_block:
            raise LZ4Error("block larger than declared maximum")
        if len(data) < pos + size:
            raise LZ4Error("truncated block body")
        body = data[pos:pos + size]
        pos += size
        if block_checksum:
            if len(data) < pos + 4:
                raise LZ4Error("truncated block checksum")
            if int.from_bytes(data[pos:pos + 4], "little") != xxh32(body):
                raise LZ4Error("block checksum mismatch")
            pos += 4
        if stored:
            out += body
        else:
            # dependent blocks (B.Indep clear) may match into the
            # previous 64 KiB of decoded content
            out += block_decompress(
                body, max_block,
                prefix=b"" if block_indep else bytes(out))
    if content_checksum:
        if len(data) < pos + 4:
            raise LZ4Error("truncated content checksum")
        if int.from_bytes(data[pos:pos + 4], "little") != xxh32(bytes(out)):
            raise LZ4Error("content checksum mismatch")
        pos += 4
    if declared is not None and declared != len(out):
        raise LZ4Error(
            f"content size {declared} != decoded {len(out)}")
    return bytes(out)
