"""From-spec IMA ADPCM audio codec (the IMA/DVI 4-bit algorithm, WAV
format tag 0x11) — the audio member of the from-spec codec family
(PNG: ``functions/png.py``, JPEG: ``functions/jpeg.py``), stdlib-only.

The DECODER is general: RIFF/WAVE container parse (fmt tag 0x11,
mono), per-block state header (int16 predictor + step index), then one
sample per 4-bit nibble via the IMA recurrence:

    step = STEP_TABLE[index]
    diff = step>>3 (+ step>>2 if b0) (+ step>>1 if b1) (+ step if b2)
    pred ± diff (sign bit b3), clamped to int16
    index += INDEX_TABLE[code], clamped to [0, 88]

Every operation is INTEGER arithmetic, so a DuckDB recursive CTE can
replay the recurrence bit-exactly — the catalog oracle reproduces
decoded sample aggregates from the nibble formula without ever seeing
bytes (the PNG/JPEG oracle discipline, now over a stateful stream
where each output depends on ALL previous codes, which a corrupt
nibble anywhere would cascade through).

The ENCODER half is both the container packer (the fixture producer
writes arbitrary nibble streams into valid WAV blocks) and a real PCM
compressor (``adpcm_compress``) for round-trip accuracy tests.

Reference parity note: the CDC reference has no audio pipeline — this
belongs to the LLM-data-pipeline extension surface (BASELINE.json).
"""

from __future__ import annotations

import struct

INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8,
               -1, -1, -1, -1, 2, 4, 6, 8]

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
]


def _clamp16(v: int) -> int:
    return max(-32768, min(32767, v))


def ima_step(pred: int, index: int, code: int) -> tuple[int, int]:
    """One IMA ADPCM decode step → (new predictor, new index)."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    pred = _clamp16(pred - diff if code & 8 else pred + diff)
    index = max(0, min(88, index + INDEX_TABLE[code]))
    return pred, index


def adpcm_compress(samples: list[int], pred: int = 0,
                   index: int = 0) -> list[int]:
    """Real IMA compressor: per sample, pick the nibble whose decode
    lands nearest the target (the canonical bit-accumulation encoder),
    tracking the decoder's own state so errors don't accumulate."""
    codes = []
    for s in samples:
        delta = s - pred
        code = 8 if delta < 0 else 0
        delta = abs(delta)
        step = STEP_TABLE[index]
        if delta >= step:
            code |= 4
            delta -= step
        if delta >= step >> 1:
            code |= 2
            delta -= step >> 1
        if delta >= step >> 2:
            code |= 1
        codes.append(code)
        pred, index = ima_step(pred, index, code)
    return codes


def wav_ima_encode(blocks: list[tuple[int, int, list[int]]],
                   sample_rate: int = 8000) -> bytes:
    """Mono WAV container, format tag 0x11: each block is
    (predictor0, index0, nibbles) → 4-byte state header + packed
    nibbles (low nibble first, zero-padded to even count). All blocks
    must share a nibble count (block_align is per-file)."""
    n_nib = len(blocks[0][2])
    if any(len(b[2]) != n_nib for b in blocks):
        raise ValueError("uniform nibble count per block required")
    data = bytearray()
    for pred0, idx0, nibbles in blocks:
        data += struct.pack("<hBB", pred0, idx0, 0)
        padded = list(nibbles) + ([0] if len(nibbles) % 2 else [])
        for j in range(0, len(padded), 2):
            data.append((padded[j] & 0x0F) | ((padded[j + 1] & 0x0F) << 4))
    block_align = 4 + (n_nib + 1) // 2
    samples_per_block = n_nib + 1  # header predictor IS sample 0
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, sample_rate,
                      sample_rate * block_align // samples_per_block,
                      block_align, 4, 2, samples_per_block)
    out = bytearray()
    out += b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + bytes(data)
    return bytes(out)


def wav_ima_decode(data: bytes) -> tuple[int, list[int]]:
    """(sample_rate, PCM int16 samples). Raises ValueError on any
    structural corruption (dead-letter lane)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            payload = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _, block_align, bits, cb, spb = struct.unpack(
        "<HHIIHHHH", fmt[:20])
    if tag != 0x11 or bits != 4:
        raise ValueError("not IMA ADPCM (tag 0x11, 4-bit)")
    if channels != 1:
        raise ValueError("only mono supported")
    # spb = 1 header sample + one per nibble; nibbles must fit the
    # block's data bytes ((block_align-4) bytes = 2 nibbles each)
    if block_align < 5 or not (1 <= spb - 1 <= (block_align - 4) * 2):
        raise ValueError("inconsistent block geometry")
    if len(payload) % block_align:
        raise ValueError("data not block-aligned")
    samples: list[int] = []
    for off in range(0, len(payload), block_align):
        block = payload[off:off + block_align]
        pred, index, reserved = struct.unpack("<hBB", block[:4])
        if index > 88 or reserved != 0:
            raise ValueError("corrupt block state header")
        samples.append(pred)  # header predictor is sample 0
        emitted = 1
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):
                if emitted >= spb:
                    break
                pred, index = ima_step(pred, index, code)
                samples.append(pred)
                emitted += 1
    return rate, samples


def decode_adpcm_features(df, data_col: str = "data",
                          id_col: str = "clip_id"):
    """Binary WAV-IMA column → typed per-clip features over Arrow
    ``mapInPandas`` (the multimodal decode shape): (clip_id, sample_rate,
    n_samples, sum_pcm, min_pcm, max_pcm, decode_ok); corrupt clips
    dead-letter with decode_ok=0."""
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
                    rate, pcm = wav_ima_decode(bytes(payload))
                    rows.append((cid, rate, len(pcm), sum(pcm),
                                 min(pcm), max(pcm), 1))
                except (ValueError, struct.error, IndexError):
                    rows.append((cid, None, None, None, None, None, 0))
            yield pd.DataFrame(rows, columns=[
                id_col, "sample_rate", "n_samples", "sum_pcm",
                "min_pcm", "max_pcm", "decode_ok"])

    return df.mapInPandas(run, schema)
