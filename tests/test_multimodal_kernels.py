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
