"""Multimodal column plumbing (SURVEY §7 M6).

Images/audio/video ride through the engine as opaque ``binary`` payload
columns with a typed metadata struct, exactly like any other change-event
payload. The Spark-side plumbing — schema, partitioning, Arrow batch shape
through ``mapInPandas`` — is real and tested; the actual codec step is
STUBBED (decode libraries aren't in this environment): pass
``fake_decode=True`` for a deterministic fake, else the UDF raises
``NotImplementedError`` where a real ``PIL.Image.open`` / ``soundfile``
call would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: decode/feature-extraction output schema (one row per input payload)
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", LongType()),     # image decode stub
        StructField("height", LongType()),    # image decode stub
        StructField("n_frames", LongType()),  # video/audio sample stub
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model an opaque media payload: binary column + typed metadata.

    (Testdata has no real media, so the document text bytes stand in; with
    a real lake this is the scan of a ``binary`` parquet/avro column.)
    """
    return df.select(
        "doc_id",
        F.col(text_col).cast(BinaryType()).alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col).cast(BinaryType())).cast("bigint").alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_features(df: DataFrame, fake_decode: bool = True,
                    batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract payloads via Arrow-batched ``mapInPandas``.

    The partition shape is production-real: one Arrow batch of payloads in,
    one batch of feature rows out — at 100 TB this runs embarrassingly
    parallel per input split with no shuffle. Only the codec is stubbed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile/av — not in this env"
                )
            payloads = pdf["payload"]
            n = payloads.str.len().astype("int64")
            md5s = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            # deterministic fake decode: dimensions derived from content
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "modality": "text/plain",
                    "n_bytes": n,
                    "content_md5": md5s,
                    "width": (n % 640) + 1,
                    "height": (n % 480) + 1,
                    "n_frames": (n % 16) + 1,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("resized_md5", StringType()),
    ]
)


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224,
                  fake_decode: bool = True) -> DataFrame:
    """Image resize via Arrow-batched ``mapInPandas`` — 1 row in, 1 row out,
    zero shuffle (runs inside the scan stage at scale).

    The real body is ``PIL.Image.open(io.BytesIO(b)).resize((w, h))``;
    STUBBED here (no PIL in env) with a deterministic fake that tiles the
    payload's md5 digest into a pseudo-thumbnail so tests pin the batch
    shape + schema. The ``resized_md5`` digest hashes the thumbnail's
    HEX rendering (pure string arithmetic on both engines), which lets a
    DuckDB oracle reproduce it exactly — blob-typed md5 isn't portable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError("real resize requires PIL — not in this env")
            n_out = max(16, (target_w * target_h) // 64)
            hex_len = 2 * n_out
            copies = hex_len // 32 + 1
            out_payload = []
            md5s = []
            for b in pdf["payload"]:
                content_hex = hashlib.md5(bytes(b)).hexdigest()
                # fake thumbnail: digest tiled to w*h/64 bytes (deterministic)
                thumb_hex = (content_hex * copies)[:hex_len]
                out_payload.append(bytes.fromhex(thumb_hex))
                md5s.append(hashlib.md5(thumb_hex.encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out_payload,
                    "width": target_w,
                    "height": target_h,
                    "resized_md5": md5s,
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n: int = 2,
                  fake_decode: bool = True) -> DataFrame:
    """Video frame sampling via ``mapInPandas`` — the 1→N batch shape
    (one payload row explodes into ceil(n_frames / every_n) frame rows).

    Real body: ``av.open`` + keyframe iteration; STUBBED with the same
    deterministic fake frame count as :func:`decode_features`
    (``n_frames = n_bytes % 16 + 1``), frame digest =
    ``md5(content_md5 || ':' || frame_idx)`` so the oracle reproduces it.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError("real frame sampling requires av — not in this env")
            doc_ids, idxs, md5s = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(b)
                content_md5 = hashlib.md5(data).hexdigest()
                n_frames = (len(data) % 16) + 1
                for i in range(0, n_frames, every_n):
                    doc_ids.append(int(doc_id))
                    idxs.append(i)
                    md5s.append(
                        hashlib.md5(f"{content_md5}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": pd.Series(doc_ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int64"),
                 "frame_md5": pd.Series(md5s, dtype="object")}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)


BOX_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("payload", BinaryType()),
        StructField("resized_csv", StringType()),
    ]
)


def synth_raw_image(df: DataFrame, w: int = 8, h: int = 8) -> DataFrame:
    """Deterministic raw grayscale bitmap payload per doc —
    pixel(r, c) = (doc_id·31 + r·w + c) mod 256, rendered as real bytes
    JVM-side (hex transform → unhex). This is an uncompressed bitmap, so
    no codec library is needed to decode it; the multimodal binary
    plumbing stays exactly the same as for a JPEG payload."""
    px = (
        f"transform(sequence(0, {w * h - 1}), "
        "i -> lpad(hex((doc_id * 31 + i) % 256), 2, '0'))"
    )
    return df.select(
        "doc_id",
        F.expr(f"unhex(array_join({px}, ''))").alias("payload"),
    )


def resize_box(df: DataFrame, in_w: int = 8, in_h: int = 8,
               factor: int = 2) -> DataFrame:
    """REAL image resize kernel: 2×2 box-filter downsample (average
    pooling, truncating integer mean) over a raw grayscale bitmap payload,
    vectorized numpy inside Arrow ``mapInPandas`` — 1 row in, 1 row out,
    zero shuffle, runs inside the scan stage at any scale.

    Unlike :func:`resize_images` (whose JPEG decode step is env-stubbed),
    nothing here is faked: the payload bytes are decoded with
    ``np.frombuffer``, pooled with a real reshape/sum kernel, and
    re-encoded as bytes. Only entropy-coded codecs (JPEG/video) remain
    behind the documented ``NotImplementedError`` — the kernel math and
    the Arrow plumbing are the production path.
    """
    out_w, out_h = in_w // factor, in_h // factor

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads, csvs = [], []
            for b in pdf["payload"]:
                a = (
                    np.frombuffer(bytes(b), dtype=np.uint8)
                    .reshape(in_h, in_w)
                    .astype(np.int64)
                )
                pooled = (
                    a.reshape(out_h, factor, out_w, factor).sum(axis=(1, 3))
                    // (factor * factor)
                )
                flat = pooled.astype(np.uint8).ravel()
                payloads.append(flat.tobytes())
                csvs.append(",".join(str(int(v)) for v in flat))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "out_w": out_w,
                    "out_h": out_h,
                    "payload": payloads,
                    "resized_csv": csvs,
                }
            )

    return df.mapInPandas(run, BOX_RESIZE_SCHEMA)


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy_ms", LongType()),  # mean-square, exact integer
    ]
)


def synth_raw_pcm(df: DataFrame, n_samples: int = 64) -> DataFrame:
    """Deterministic raw 16-bit little-endian PCM payload per doc —
    sample(i) = ((doc_id·7 + i·13) mod 4096) − 2048, encoded JVM-side as
    real bytes. Uncompressed PCM needs no codec library, so the decode
    step is genuinely exercised (same binary plumbing as an MP3 payload
    would use)."""
    # int16 LE hex: low byte then high byte of the two's-complement value
    sample = f"((doc_id * 7 + i * 13) % 4096) - 2048"
    as_u16 = f"(({sample}) + 65536) % 65536"
    px = (
        f"transform(sequence(0, {n_samples - 1}), i -> "
        f"concat(lpad(hex(({as_u16}) % 256), 2, '0'), "
        f"lpad(hex(({as_u16}) div 256), 2, '0')))"
    )
    return df.select(
        "doc_id",
        F.expr(f"unhex(array_join({px}, ''))").alias("payload"),
    )


def audio_frame_energy(df: DataFrame, frame: int = 16) -> DataFrame:
    """REAL audio feature extraction: decode raw int16 PCM with
    ``np.frombuffer`` and compute per-frame signal energy (mean-square,
    truncating integer division — exact cross-engine) with a vectorized
    reshape/sum kernel. 1 payload row → n_samples/frame feature rows, the
    1→N Arrow batch shape; zero shuffle at any scale. Like
    :func:`resize_box`, nothing here is stubbed — only entropy-coded
    audio (MP3/AAC decode) stays behind the documented env constraint."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            doc_ids, idxs, ns, energies = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(bytes(b), dtype="<i2").astype(np.int64)
                n_frames = len(a) // frame
                fr = a[: n_frames * frame].reshape(n_frames, frame)
                ms = (fr * fr).sum(axis=1) // frame
                for i in range(n_frames):
                    doc_ids.append(int(doc_id))
                    idxs.append(i)
                    ns.append(frame)
                    energies.append(int(ms[i]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy_ms": pd.Series(energies, dtype="int64"),
                }
            )

    return df.mapInPandas(run, AUDIO_FRAME_SCHEMA)
