"""From-spec JPEG baseline codec (functions/jpeg.py): flat-block
exactness (the oracle contract), spec-accuracy round trips on real AC
content, structural-corruption dead-lettering, and the Spark
mapInPandas integration shape."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tigate_spark.functions.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    _canonical_codes,
    decode_jpeg_features,
    jpeg_decode,
    jpeg_encode,
)


def _flat_img(d: int) -> np.ndarray:
    img = np.zeros((32, 32, 3), dtype=np.int64)
    for my in range(2):
        for mx in range(2):
            base = (d * 37 + mx * 11 + my * 23) % 256
            img[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16] = [
                base, (base + 85) % 256, (base + 170) % 256]
    return img


def _color_roundtrip(r: int, g: int, b: int) -> tuple[int, int, int]:
    fl = math.floor
    cl = lambda v: min(255, max(0, v))  # noqa: E731
    y = cl(fl(0.299 * r + 0.587 * g + 0.114 * b + 0.5))
    cb = cl(fl(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5))
    cr = cl(fl(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5))
    return (cl(fl(y + 1.402 * (cr - 128.0) + 0.5)),
            cl(fl(y - 0.344136 * (cb - 128.0)
                  - 0.714136 * (cr - 128.0) + 0.5)),
            cl(fl(y + 1.772 * (cb - 128.0) + 0.5)))


def test_flat_blocks_decode_exactly():
    """DC quant step 8 → a flat block's DCT round trip is EXACT: the
    decode equals pure color-conversion arithmetic for every value."""
    for d in range(0, 256, 7):
        w, h, c, px = jpeg_decode(jpeg_encode(_flat_img(d)))
        assert (w, h, c) == (32, 32, 3)
        arr = np.array(px).reshape(32, 32, 3)
        for my in range(2):
            for mx in range(2):
                base = (d * 37 + mx * 11 + my * 23) % 256
                exp = _color_roundtrip(base, (base + 85) % 256,
                                       (base + 170) % 256)
                blk = arr[my * 16:(my + 1) * 16, mx * 16:(mx + 1) * 16]
                assert (blk == np.array(exp)).all(), (d, mx, my)


def test_smooth_gradient_within_spec_accuracy():
    img = (np.arange(32)[:, None, None] * 4
           + np.arange(32)[None, :, None] * 3
           + np.arange(3)[None, None, :] * 10).astype(np.int64)
    _, _, _, px = jpeg_decode(jpeg_encode(img))
    err = np.abs(np.array(px).reshape(32, 32, 3) - img)
    assert err.max() <= 8 and err.mean() < 4


def test_ac_path_actually_exercised_and_bounded():
    """Real AC content (luma sinusoid) must round-trip within the loss
    the Annex-K-style tables imply — and its wire must be bigger than a
    flat image's (i.e. AC symbols were really coded)."""
    yy, xx = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    lum = (128 + 100 * np.sin(xx / 8) * np.cos(yy / 10)).astype(np.int64)
    img = np.stack([lum] * 3, axis=-1)
    data = jpeg_encode(img)
    assert len(data) > len(jpeg_encode(_flat_img(3)))
    _, _, _, px = jpeg_decode(data)
    err = np.abs(np.array(px).reshape(32, 32, 3) - img)
    assert err.max() <= 32 and err.mean() < 10


def test_corruption_matrix_dead_letters():
    data = jpeg_encode(_flat_img(5))
    cases = {
        "soi": 0,                                   # not a JPEG
        "dht_bits": data.index(b"\xff\xc4") + 5,    # BITS/HUFFVAL mismatch
        "sof_marker": data.index(b"\xff\xc0") + 1,  # unknown marker
    }
    for name, off in cases.items():
        b = bytearray(data)
        b[off] ^= 0xFF
        with pytest.raises((ValueError, KeyError, IndexError)):
            jpeg_decode(bytes(b))
    # truncated entropy segment
    with pytest.raises((ValueError, IndexError, KeyError)):
        jpeg_decode(data[:len(data) // 2])


def test_huffman_tables_are_spec_valid():
    dc = _canonical_codes(_DC_BITS, _DC_VALS)
    ac = _canonical_codes(_AC_BITS, _AC_VALS)
    assert len(dc) == 12 and len(ac) == 162
    # prefix-free and the all-ones code of each length unused (T.81 C.2)
    for tbl in (dc, ac):
        codes = sorted((ln, c) for c, ln in tbl.values())
        seen = set()
        for ln, c in codes:
            assert c < (1 << ln) - 1 or ln == 16
            for pl, pc in seen:
                assert ln <= pl or (c >> (ln - pl)) != pc
            seen.add((ln, c))


def test_decode_features_mapinpandas(spark):
    ids = spark.range(10).select((F.col("id") * 97).alias("img_id"))

    def gen(batches):
        # self-contained: test modules aren't importable on executors
        import numpy as _np
        import pandas as pd

        from tigate_spark.functions.jpeg import jpeg_encode as enc

        for pdf in batches:
            rows = []
            for i in pdf["img_id"]:
                d = int(i)
                img = _np.zeros((32, 32, 3), dtype=_np.int64)
                for my in range(2):
                    for mx in range(2):
                        base = (d * 37 + mx * 11 + my * 23) % 256
                        img[my * 16:(my + 1) * 16,
                            mx * 16:(mx + 1) * 16] = [
                            base, (base + 85) % 256, (base + 170) % 256]
                data = enc(img)
                if d == 0:
                    data = data[:40]  # truncated → dead-letter
                rows.append((d, data))
            yield pd.DataFrame(rows, columns=["img_id", "data"])

    out = decode_jpeg_features(
        ids.mapInPandas(gen, "img_id bigint, data binary")).collect()
    by_id = {r.img_id: r for r in out}
    assert by_id[0].decode_ok == 0 and by_id[0].width is None
    good = [r for r in out if r.img_id != 0]
    assert all(r.decode_ok == 1 and r.width == 32 and r.channels == 3
               for r in good)
    # sums match the closed form
    for r in good:
        exp = 0
        for my in range(2):
            for mx in range(2):
                base = (r.img_id * 37 + mx * 11 + my * 23) % 256
                exp += 256 * _color_roundtrip(
                    base, (base + 85) % 256, (base + 170) % 256)[0]
        assert r.sum_r == exp
