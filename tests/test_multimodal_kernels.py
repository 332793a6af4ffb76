"""Real-kernel multimodal tests: the numpy box-filter resize and PCM
frame-energy paths against hand-computed values (no oracle involved)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def one_doc(spark):
    return spark.createDataFrame([(7,)], "doc_id long")


def test_box_resize_matches_hand_computed(spark, one_doc):
    from tigate_spark.functions.multimodal import resize_box, synth_raw_image

    row = resize_box(synth_raw_image(one_doc)).first()
    # pixel(r,c) = (7*31 + r*8 + c) % 256 = (217 + 8r + c) % 256
    def p(r, c):
        return (217 + 8 * r + c) % 256

    expect = [
        (p(2 * R, 2 * C) + p(2 * R, 2 * C + 1)
         + p(2 * R + 1, 2 * C) + p(2 * R + 1, 2 * C + 1)) // 4
        for R in range(4) for C in range(4)
    ]
    assert row["out_w"] == 4 and row["out_h"] == 4
    assert [int(v) for v in row["resized_csv"].split(",")] == expect
    assert list(row["payload"]) == [v % 256 for v in expect]


def test_pcm_energy_matches_hand_computed(spark, one_doc):
    from tigate_spark.functions.multimodal import (
        audio_frame_energy,
        synth_raw_pcm,
    )

    rows = {
        r["frame_idx"]: r
        for r in audio_frame_energy(synth_raw_pcm(one_doc)).collect()
    }
    # sample(i) = ((7*7 + 13 i) % 4096) - 2048
    samples = [((49 + 13 * i) % 4096) - 2048 for i in range(64)]
    for f in range(4):
        fr = samples[f * 16:(f + 1) * 16]
        assert rows[f]["energy_ms"] == sum(v * v for v in fr) // 16
        assert rows[f]["n_samples"] == 16
    assert len(rows) == 4


def test_pcm_negative_samples_roundtrip(spark):
    """The int16 two's-complement LE encoding must survive the
    encode(JVM hex) → np.frombuffer('<i2') round trip for negative
    samples (doc_id=0 starts at 49-2048 < 0)."""
    import numpy as np

    from tigate_spark.functions.multimodal import synth_raw_pcm

    df = spark.createDataFrame([(0,)], "doc_id long")
    payload = bytes(synth_raw_pcm(df).first()["payload"])
    a = np.frombuffer(payload, dtype="<i2")
    expect = [((0 + 13 * i) % 4096) - 2048 for i in range(64)]
    assert a.tolist() == expect


def test_bmp_synth_is_valid_and_parse_matches_hand_computed(spark, one_doc):
    """synth_bmp must emit a structurally valid BMP (magic, offsets,
    declared file size == actual) and parse_bmp_meta must recover every
    field from the bytes alone."""
    import struct

    from tigate_spark.functions.multimodal import parse_bmp_meta, synth_bmp

    payload = bytes(synth_bmp(one_doc).first()["payload"])
    # independent header decode (not via parse_bmp_meta)
    assert payload[:2] == b"BM"
    fsz, _, off = struct.unpack_from("<III", payload, 2)
    hsz, w, h, planes, bpp, comp, img = struct.unpack_from("<IiiHHII", payload, 14)
    assert (fsz, off, hsz, planes, bpp, comp) == (len(payload), 54, 40, 1, 24, 0)
    # doc_id=7: w = 7%6+2 = 3, h = 7%4+1 = 4, rs = (9+3)//4*4 = 12
    assert (w, h, img) == (3, 4, 48)

    row = parse_bmp_meta(synth_bmp(one_doc)).first()
    pix_sum = sum(
        (7 * 31 + r * 12 + c) % 256 for r in range(4) for c in range(9)
    )
    assert (row["width"], row["height"], row["bpp"]) == (3, 4, 24)
    assert row["n_bytes"] == len(payload)
    assert row["mean_px"] == pix_sum // (3 * 4 * 3)
    assert row["mime"] == "image/bmp"


def test_bmp_parse_rejects_corrupt_payloads(spark, one_doc):
    """Truncated or magic-corrupted BMPs must raise (the dead-letter
    contract), not parse to garbage."""
    from pyspark.sql import functions as F

    from tigate_spark.functions.multimodal import parse_bmp_meta, synth_bmp

    good = synth_bmp(one_doc)
    truncated = good.select("doc_id", F.expr("substring(payload, 1, 40)").alias("payload"))
    bad_magic = good.select(
        "doc_id",
        F.expr("concat(unhex('4142'), substring(payload, 3))").alias("payload"),
    )
    for bad in (truncated, bad_magic):
        with pytest.raises(Exception, match="bmp: bad magic/size"):
            parse_bmp_meta(bad).collect()


def test_raw_frame_sampling_matches_hand_computed(spark, one_doc):
    """sample_frames: n_frames parsed from payload length, stride-2
    sampling, per-frame sum and hex digest from the bytes."""
    import hashlib

    from tigate_spark.functions.multimodal import sample_frames, synth_raw_video

    rows = {r["frame_idx"]: r
            for r in sample_frames(synth_raw_video(one_doc), every_n=2).collect()}
    # doc_id=7: n_frames = 7%5+2 = 4 → sampled frames 0, 2
    assert sorted(rows) == [0, 2]
    for f in (0, 2):
        frame = bytes((7 * 17 + f * 16 + j) % 256 for j in range(16))
        assert rows[f]["n_frames"] == 4
        assert rows[f]["frame_sum"] == sum(frame)
        assert rows[f]["frame_hex_md5"] == hashlib.md5(frame.hex().encode()).hexdigest()


def test_bmp_parse_fuzz_never_garbage(spark):
    """Fuzz the BMP parser directly (no Spark round trip): random
    single-byte corruption and truncation of valid payloads must either
    raise ValueError/struct.error or — when the mutated byte is in the
    pixel area or a don't-care header field — still parse to the original
    dimensions. A parse that silently returns different dimensions than
    the (intact) header declares would be a garbage decode."""
    import random
    import struct

    from tigate_spark.functions.multimodal import parse_bmp, synth_bmp

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    payloads = [bytes(r["payload"]) for r in synth_bmp(docs).collect()]
    rng = random.Random(20260814)
    for b in payloads:
        base = parse_bmp(b)
        for _ in range(60):
            mut = bytearray(b)
            pos = rng.randrange(len(mut))
            mut[pos] = (mut[pos] + rng.randrange(1, 256)) % 256
            try:
                got = parse_bmp(bytes(mut))
            except (ValueError, struct.error):
                continue
            # survived: header geometry must be unchanged (pixel-area or
            # reserved-field mutation); mean may legitimately differ
            assert got[1:4] == base[1:4], (pos, got, base)
        for cut in (0, 1, 13, 53, len(b) - 1):
            with pytest.raises((ValueError, struct.error)):
                parse_bmp(b[:cut])


def test_bmp_parse_rejects_bpp_zero(spark):
    """ADVICE r06: a crafted header with bpp=0 (and img=0, so every
    size-consistency check is vacuous at rs=0) must hit the documented
    ValueError dead-letter contract, not ZeroDivisionError."""
    import struct

    from tigate_spark.functions.multimodal import parse_bmp, synth_bmp

    b = bytearray(
        synth_bmp(spark.createDataFrame([(1,)], "doc_id long"))
        .first()["payload"]
    )
    struct.pack_into("<H", b, 28, 0)        # bpp := 0
    struct.pack_into("<I", b, 34, 0)        # img := 0 (rs*h == 0 matches)
    with pytest.raises(ValueError):
        parse_bmp(bytes(b))


def test_frame_sampling_rejects_partial_frames(spark):
    """ADVICE r06: payloads that are not a whole number of frames (or are
    empty) raise ValueError instead of silently truncating / emitting
    zero rows — same malformed-payload contract as parse_bmp."""
    from pyspark.errors import PythonException

    from tigate_spark.functions.multimodal import sample_frames, synth_raw_video

    good = synth_raw_video(spark.createDataFrame([(3,)], "doc_id long"))
    chopped = good.selectExpr(
        "doc_id", "substring(payload, 1, length(payload) - 1) AS payload")
    with pytest.raises(PythonException, match="not a positive multiple"):
        sample_frames(chopped).collect()
    empty = good.selectExpr("doc_id", "cast(x'' as binary) AS payload")
    with pytest.raises(PythonException, match="not a positive multiple"):
        sample_frames(empty).collect()
