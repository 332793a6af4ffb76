"""Message compression seam — the tiflow ``pkg/compression``
``Encode``/``Decode`` twin the open codec applies per message VALUE
(``pkg/sink/codec/open/codec.go:85,120`` via
``pkg/sink/codec/common/compress.go:23-41``), validated at config time
(``pkg/config/large_message.go:52-59`` ``compression.Supported``).

Codecs: ``none`` (identity), ``gzip``/``zlib`` (stdlib), and the
REFERENCE set ``lz4``/``snappy`` — native libs when importable, else
the from-spec pure-Python twins (``snappy_codec.py`` raw block format =
``snappy.Encode`` twin; ``lz4_codec.py`` frame format = ``lz4.
NewWriter`` twin, xxHash32 included), so the reference's wire codecs
(``pkg/compression/compression.go``: none/lz4/snappy) are ALWAYS
executable here and the wires interoperate with reference consumers.
``zstd`` (the kafka producer's remaining sarama codec, sarama.go:89-90,
and the reference event store's value codec) likewise: native lib when
importable, else the from-spec RFC 8878 twin (``zstd_codec.py`` — full
decoder incl. FSE/Huffman/sequences; conforming raw/RLE-block frames
on encode). NOTE:
gzip/zlib remain ENGINE EXTENSIONS — a gzip/zlib wire is not readable
by reference consumers, and their error text says so. The gzip wire
pins ``mtime=0`` so compressed bytes are deterministic across
executors.

Column forms are Arrow-batched pandas UDFs (binary → binary): there is
no JVM-side SQL compress function, and per-value DEFLATE is exactly the
genuinely-non-expressible case the Pandas-UDF lane exists for. Identity
(``none``) stays zero-Python.
"""

from __future__ import annotations

import functools
import gzip
import zlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def _lz4_mod():
    try:
        import lz4.frame  # type: ignore

        return lz4.frame
    except ImportError:
        return None


def _zstd_mod():
    try:
        import zstandard  # type: ignore

        return zstandard
    except ImportError:
        return None


def _snappy_mod():
    # the reference's other wire codec (pkg/compression: none/lz4/snappy);
    # python-snappy when present, else the seam reports unsupported
    try:
        import snappy  # type: ignore

        return snappy
    except ImportError:
        return None


#: codecs the seam knows about (reference list: none/lz4/snappy; gzip and
#: zlib are the stdlib-available stand-ins this environment can execute)
KNOWN = ("none", "gzip", "zlib", "lz4", "snappy", "zstd")

#: codecs a REFERENCE consumer can decode (pkg/compression's set);
#: gzip/zlib wires are engine-local extensions
REFERENCE_INTEROP = ("none", "lz4", "snappy")


def supported(cc: str) -> bool:
    """``compression.Supported`` twin — known AND executable here.

    All six codecs are always executable: gzip/zlib via the stdlib and
    lz4/snappy/zstd via the from-spec twins (native libs are preferred
    when importable, but absence never disables a codec).
    """
    return cc in ("none", "gzip", "zlib", "lz4", "snappy", "zstd")


def ensure_supported(cc: str) -> None:
    """Config-time guard (large_message.go:57-59) — unretryable wording."""
    if not supported(cc):
        raise ValueError(
            f"compression is not supported, got {cc!r} "
            f"(executable here: none/gzip/zlib/lz4/snappy/zstd; "
            f"gzip/zlib wires are engine extensions NOT readable by "
            f"reference consumers)")


def compress_bytes(cc: str, data: bytes) -> bytes:
    if cc == "none":
        return data
    if cc == "gzip":
        return gzip.compress(data, mtime=0)
    if cc == "zlib":
        return zlib.compress(data, 6)
    if cc == "lz4":
        mod = _lz4_mod()
        if mod is not None:
            return mod.compress(data)
        from tigate_spark.functions import lz4_codec

        return lz4_codec.frame_compress(data)
    if cc == "snappy":
        mod = _snappy_mod()
        if mod is not None:
            return mod.compress(data)
        from tigate_spark.functions import snappy_codec

        return snappy_codec.compress(data)
    if cc == "zstd":
        mod = _zstd_mod()
        if mod is not None:
            return mod.ZstdCompressor().compress(data)
        from tigate_spark.functions import zstd_codec

        # from-spec frames with real compressed blocks (greedy matcher
        # + predefined-FSE sequences, zstd-jni cross-validated); the
        # native lib still wins on ratio when importable
        return zstd_codec.compress(data)
    raise ValueError(f"compression is not supported, got {cc!r}")


def decompress_bytes(cc: str, data: bytes) -> bytes:
    if cc == "none":
        return data
    if cc == "gzip":
        return gzip.decompress(data)
    if cc == "zlib":
        return zlib.decompress(data)
    if cc == "lz4":
        mod = _lz4_mod()
        if mod is not None:
            return mod.decompress(data)
        from tigate_spark.functions import lz4_codec

        return lz4_codec.frame_decompress(data)
    if cc == "snappy":
        mod = _snappy_mod()
        if mod is not None:
            return mod.decompress(data)
        from tigate_spark.functions import snappy_codec

        return snappy_codec.decompress(data)
    if cc == "zstd":
        mod = _zstd_mod()
        if mod is not None:
            return mod.ZstdDecompressor().decompress(data)
        from tigate_spark.functions import zstd_codec

        return zstd_codec.decompress(data)
    raise ValueError(f"compression is not supported, got {cc!r}")


def _series_codec(fn):
    def inner(s):
        return s.map(lambda b: None if b is None else fn(bytes(b)))

    return inner


def compress_col(col: Column, cc: str) -> Column:
    """binary → binary: per-value compress (Arrow-batched; `none` = no-op
    column, keeping the default path pure JVM)."""
    ensure_supported(cc)
    if cc == "none":
        return col
    udf = F.pandas_udf(
        _series_codec(functools.partial(compress_bytes, cc)), "binary")
    return udf(col)


def decompress_col(col: Column, cc: str) -> Column:
    """binary → binary: per-value decompress (consumer side)."""
    ensure_supported(cc)
    if cc == "none":
        return col
    udf = F.pandas_udf(
        _series_codec(functools.partial(decompress_bytes, cc)), "binary")
    return udf(col)
