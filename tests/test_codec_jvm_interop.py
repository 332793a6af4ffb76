"""Cross-interop of the from-spec codecs vs the REFERENCE
implementations bundled in Spark's JVM.

The sandbox has no python-snappy/lz4/zstandard, but the JVM on every
Spark classpath carries the real codecs: zstd-jni (the C zstd the
reference's Go bindings wrap), xerial snappy-java (the same raw block
format as the Go ``snappy.Encode`` the reference calls), and lz4-java
(standard LZ4 frames). Driving them through py4j turns the from-spec
twins' conformance claims into measured facts — every wire here is
produced or consumed by the reference implementation, not by our own
code."""

from __future__ import annotations

import random

import pytest

from tigate_spark.functions import lz4_codec as lz
from tigate_spark.functions import snappy_codec as sc
from tigate_spark.functions import zstd_codec as z


@pytest.fixture(scope="module")
def corpora():
    rng = random.Random(3)
    return {
        "repetitive": b"abcabcabc" * 20000,
        "rle": b"\x00" * 150000,
        "random": rng.randbytes(200000),
        "json-ish": b"".join(
            b'{"pk":%d,"event":"click_%d","v":%d}' % (i, i % 7, i * 13)
            for i in range(4000)),
        "mixed": (rng.randbytes(50) + b"A" * 120000 + rng.randbytes(99)
                  + b"pattern" * 9000),
        "empty": b"",
        "tiny": b"x",
    }


def _jvm(spark):
    return spark._jvm


def test_zstd_decodes_reference_c_frames(spark, corpora):
    """zstd-jni (the C implementation) at levels 1/3/12/19: the
    from-spec decoder reads every frame — FSE-compressed sequence
    tables, Huffman literals, treeless blocks, RLE blocks, whatever
    the real compressor chose per corpus/level."""
    Zstd = _jvm(spark).com.github.luben.zstd.Zstd
    for name, data in corpora.items():
        for level in (1, 3, 12, 19):
            wire = bytes(Zstd.compress(data, level))
            assert z.decompress(wire) == data, (name, level)


def test_zstd_reference_reads_our_frames(spark, corpora):
    Zstd = _jvm(spark).com.github.luben.zstd.Zstd
    for name, data in corpora.items():
        back = bytes(Zstd.decompress(z.compress(data), len(data)))
        assert back == data, name


def test_snappy_cross_interop_both_directions(spark, corpora):
    """xerial snappy-java = the raw block format (the Go reference's
    snappy.Encode/Decode): both directions byte-correct."""
    Snappy = _jvm(spark).org.xerial.snappy.Snappy
    for name, data in corpora.items():
        assert sc.decompress(bytes(Snappy.compress(data))) == data, name
        assert bytes(Snappy.uncompress(sc.compress(data))) == data, name


def test_lz4_frame_cross_interop_both_directions(spark, corpora):
    jvm = _jvm(spark)
    for name, data in corpora.items():
        baos = jvm.java.io.ByteArrayOutputStream()
        fos = jvm.net.jpountz.lz4.LZ4FrameOutputStream(baos)
        fos.write(data)
        fos.close()
        wire = bytes(baos.toByteArray())
        assert wire[:4] == (0x184D2204).to_bytes(4, "little")
        assert lz.frame_decompress(wire) == data, name
        # reverse: lz4-java reads OUR frames (py4j maps bytes -> byte[])
        bais = jvm.java.io.ByteArrayInputStream(lz.frame_compress(data))
        fis = jvm.net.jpountz.lz4.LZ4FrameInputStream(bais)
        got = bytes(fis.readAllBytes())
        fis.close()
        assert got == data, name


def test_zstd_hypothesis_vs_reference_c(spark):
    """Property sweep: random/structured corpora compressed by the C
    implementation decode byte-exact — the strongest conformance
    evidence available for the FSE/Huffman/sequence paths."""
    import random

    Zstd = _jvm(spark).com.github.luben.zstd.Zstd
    rng = random.Random(1234)
    for trial in range(60):
        kind = trial % 4
        n = rng.randint(0, 30000)
        if kind == 0:
            data = rng.randbytes(n)
        elif kind == 1:
            unit = rng.randbytes(rng.randint(1, 24)) or b"q"
            data = unit * (n // max(1, len(unit)))
        elif kind == 2:
            data = b"".join(
                b'{"k%d":%d}' % (i % 11, i * 7) for i in range(n // 10))
        else:
            data = bytes(rng.choice(b"aab") for _ in range(n))
        level = rng.choice((1, 2, 3, 6, 12, 19, 22))
        wire = bytes(Zstd.compress(data, level))
        assert z.decompress(wire) == data, (trial, kind, n, level)


def test_zstd_our_compressed_blocks_really_compress_and_jni_reads(
        spark, corpora):
    """The encoder's compressed-block path actually engages (wire
    smaller than input on matchable corpora) and the reference C
    implementation decodes those frames byte-exact."""
    Zstd = _jvm(spark).com.github.luben.zstd.Zstd
    for name in ("repetitive", "json-ish", "mixed"):
        data = corpora[name]
        wire = z.compress(data)
        assert len(wire) < len(data) // 2, (name, len(wire), len(data))
        assert bytes(Zstd.decompress(wire, len(data))) == data, name


def test_zstd_huffman_only_blocks_jni_reads(spark):
    """r14: ASCII data with NO matches compresses through the
    Huffman-literals-only path (nseq=0 sequences section, direct-weight
    tree description) and the reference C implementation reads it."""
    import random as _r

    rng = _r.Random(11)
    data = bytes(rng.randrange(32, 127) for _ in range(60000))
    wire = z.compress(data)
    assert len(wire) < len(data)  # Huffman gain on 95-symbol alphabet
    Zstd = _jvm(spark).com.github.luben.zstd.Zstd
    assert bytes(Zstd.decompress(wire, len(data))) == data
    assert z.decompress(wire) == data


def test_zstd_custom_fse_tables_jni_reads(spark):
    """r15: custom FSE-described sequence tables (mode 2) — a
    skewed-sequence corpus engages them (asserted via the lane
    planner) and the reference C implementation decodes the frame
    byte-exact; RLE sequence lanes likewise."""
    data = b"".join(b'{"id":%d,"user":"u%d","ev":"click","v":%d}\n'
                    % (i, i % 97, i * 7 % 1000) for i in range(4000))
    modes = []
    orig = z._lane_plan

    def spy(syms, kind, prev=None):
        plan = orig(syms, kind, prev)
        modes.append(plan[0])
        return plan

    z._lane_plan = spy
    try:
        wire = z.compress(data)
    finally:
        z._lane_plan = orig
    assert 2 in modes, modes
    Zstd = _jvm(spark).com.github.luben.zstd.Zstd
    assert bytes(Zstd.decompress(wire, len(data))) == data
    assert z.decompress(wire) == data
    rle_data = b"ABCDEFGH" * 8000
    rle_wire = z.compress(rle_data)
    assert bytes(Zstd.decompress(rle_wire, len(rle_data))) == rle_data


def test_zstd_fse_weights_description_jni_reads(spark):
    """r15: FSE-compressed Huffman-weight descriptions (§4.2.1.2, two
    interleaved ANS states, over-read termination) — a >128-symbol
    alphabet forces the form (direct weights can't express it) and the
    reference C implementation decodes the frame byte-exact."""
    import random as _r

    rng = _r.Random(5)
    data = bytes(rng.randrange(130, 250) for _ in range(50000))
    wire = z.compress(data)
    assert len(wire) < len(data)  # Huffman engages above symbol 128
    Zstd = _jvm(spark).com.github.luben.zstd.Zstd
    assert bytes(Zstd.decompress(wire, len(data))) == data
    assert z.decompress(wire) == data
    # ascii corpus: the selector may pick either form; whichever wins,
    # jni must read it
    data2 = bytes(rng.randrange(32, 127) for _ in range(60000))
    wire2 = z.compress(data2)
    assert bytes(Zstd.decompress(wire2, len(data2))) == data2


def test_zstd_repeat_mode_jni_reads(spark):
    """r15: a frame with cross-block Repeat_Mode lanes (forced by a
    stride corpus whose per-block histograms are identical) decodes
    byte-exact on the reference C implementation."""
    modes = []
    orig = z._lane_plan

    def spy(syms, kind, prev=None):
        plan = orig(syms, kind, prev)
        modes.append(plan[0])
        return plan

    z._lane_plan = spy
    try:
        data = b"ABCDEFGH" * 40000
        wire = z.compress(data)
    finally:
        z._lane_plan = orig
    assert 3 in modes, modes
    Zstd = _jvm(spark).com.github.luben.zstd.Zstd
    assert bytes(Zstd.decompress(wire, len(data))) == data
    assert z.decompress(wire) == data


def test_zstd_treeless_literals_jni_reads(spark):
    """r15: frames whose later blocks carry TREELESS literal sections
    decode byte-exact on the reference C implementation — with this the
    encoder emits every form its decoder accepts."""
    import random as _r

    rng = _r.Random(4)
    words = [bytes(rng.choice(b"abcdefghijklmnopqrstuvwxyz")
                   for _ in range(rng.randrange(3, 9))) for _ in range(500)]
    text = b" ".join(rng.choice(words) for _ in range(120000))
    ltypes = []
    orig = z._huffman_literals_section

    def spy(lits, huff_ctx=None):
        sec = orig(lits, huff_ctx=huff_ctx)
        if sec is not None:
            ltypes.append(sec[0] & 3)
        return sec

    z._huffman_literals_section = spy
    try:
        wire = z.compress(text)
    finally:
        z._huffman_literals_section = orig
    assert 3 in ltypes, ltypes
    Zstd = _jvm(spark).com.github.luben.zstd.Zstd
    assert bytes(Zstd.decompress(wire, len(text))) == text
    assert z.decompress(wire) == text
