"""From-spec IMA ADPCM codec (functions/adpcm.py): recurrence
exactness vs an independent step implementation, real-compressor
round-trip accuracy, container corruption dead-lettering, and the
Spark mapInPandas integration shape."""

from __future__ import annotations

import math
import struct

import pytest

from tigate_spark.functions.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    adpcm_compress,
    decode_adpcm_features,
    ima_step,
    wav_ima_decode,
    wav_ima_encode,
)


def _ref_step(pred, index, code):
    """Independent spelling of the IMA recurrence (multiplication form
    is NOT used — the bit-accumulation form is the spec's)."""
    step = STEP_TABLE[index]
    diff = step >> 3
    for bit, shift in ((1, 2), (2, 1), (4, 0)):
        if code & bit:
            diff += step >> shift
    pred = pred - diff if code & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    return pred, max(0, min(88, index + INDEX_TABLE[code]))


def test_step_recurrence_all_codes_all_indices():
    for index in range(89):
        for code in range(16):
            assert ima_step(1000, index, code) == _ref_step(1000, index, code)
            assert ima_step(-31000, index, code) == _ref_step(
                -31000, index, code)


def test_container_roundtrip_exact():
    nibs = [(j * 13 + 5) % 16 for j in range(255)]
    data = wav_ima_encode([(-12345, 42, nibs)])
    rate, pcm = wav_ima_decode(data)
    assert rate == 8000 and len(pcm) == 256 and pcm[0] == -12345
    p, i = -12345, 42
    for j, c in enumerate(nibs):
        p, i = ima_step(p, i, c)
        assert pcm[j + 1] == p, j


def test_multiblock_state_resets():
    """Each block carries its own state header — block 2 must decode
    from ITS header, not block 1's trailing state."""
    nibs = [3] * 15
    data = wav_ima_encode([(100, 0, nibs), (-200, 80, nibs)])
    _, pcm = wav_ima_decode(data)
    assert len(pcm) == 32 and pcm[0] == 100 and pcm[16] == -200


def test_compressor_tracks_signal():
    sig = [int(8000 * math.sin(t / 15)) for t in range(255)]
    codes = adpcm_compress(sig)
    _, pcm = wav_ima_decode(wav_ima_encode([(0, 0, codes)]))
    # skip the attack transient; steady state must track within ~2 steps
    errs = [abs(a - b) for a, b in zip(pcm[33:], sig[32:])]
    assert max(errs) < 2500 and sum(errs) / len(errs) < 400


def test_corruption_matrix():
    data = wav_ima_encode([(0, 0, [1] * 255)])
    for off in (0, 9, 12):   # RIFF magic, WAVE magic, fmt chunk id
        b = bytearray(data)
        b[off] ^= 0xFF
        with pytest.raises(ValueError):
            wav_ima_decode(bytes(b))
    # corrupt block header index > 88
    b = bytearray(data)
    data_off = data.index(b"data") + 8
    b[data_off + 2] = 200
    with pytest.raises(ValueError):
        wav_ima_decode(bytes(b))
    with pytest.raises((ValueError, struct.error)):
        wav_ima_decode(data[: len(data) - 7])  # breaks block alignment


def test_decode_features_mapinpandas(spark):
    ids = spark.range(6).selectExpr("id * 97 as clip_id")

    def gen(batches):
        import pandas as pd

        from tigate_spark.functions.adpcm import wav_ima_encode as enc

        for pdf in batches:
            rows = []
            for i in pdf["clip_id"]:
                d = int(i)
                data = enc([(d % 1000, d % 89, [(d + j) % 16
                                                for j in range(255)])])
                if d == 0:
                    data = data[:20]
                rows.append((d, data))
            yield pd.DataFrame(rows, columns=["clip_id", "data"])

    out = decode_adpcm_features(
        ids.mapInPandas(gen, "clip_id bigint, data binary")).collect()
    by_id = {r.clip_id: r for r in out}
    assert by_id[0].decode_ok == 0 and by_id[0].n_samples is None
    assert all(r.decode_ok == 1 and r.n_samples == 256
               for r in out if r.clip_id != 0)
