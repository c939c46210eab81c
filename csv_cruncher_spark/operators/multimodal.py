"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media are opaque ``binary`` columns plus a typed metadata struct; the
decode/resize/feature/frame-sample operators run as Arrow-batched
``mapInPandas`` stages (one Python process per partition, whole Arrow
record batches — never per-row Python). The image/audio codecs are NOT in
this container, so the codec call itself is stubbed two ways:

- real formats (PNG/JPEG/WAV magic bytes) → ``NotImplementedError`` with a
  clear message (the integration point for Pillow/librosa on a real
  cluster);
- the deterministic FAKE format (header ``CCSM`` + width + height +
  payload, produced by ``encode_fake_media``) → fully decoded, so the
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

FAKE_MAGIC = b"CCSM"  # csv-cruncher-spark media (fake deterministic format)
_REAL_MAGICS = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "wav/avi",
    b"GIF8": "gif",
}

META_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def encode_fake_media(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake media blob: CCSM | u32 width | u32 height | payload."""
    return FAKE_MAGIC + struct.pack("<II", width, height) + payload


def _decode_one(blob: bytes | None) -> tuple[str | None, int | None, int | None, int | None]:
    if blob is None:
        return (None, None, None, None)
    for magic, name in _REAL_MAGICS.items():
        if blob[: len(magic)] == magic:
            raise NotImplementedError(
                f"Real {name} decoding needs a codec library not present in "
                "this environment; wire Pillow/librosa here on a real cluster."
            )
    if blob[:4] == FAKE_MAGIC and len(blob) >= 12:
        w, h = struct.unpack("<II", blob[4:12])
        return ("ccsm", int(w), int(h), len(blob))
    return ("unknown", None, None, len(blob))


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
                {"format": f, "width": w, "height": h, "n_bytes": n}
                for (f, w, h, n) in decoded
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
    """Resize integration point: validates plumbing (schema in = schema
    out, binary preserved) but raises for real formats like the decoder.
    For the fake format it rewrites the header dims deterministically."""

    @F.pandas_udf(T.BinaryType())
    def resize(blobs: pd.Series) -> pd.Series:
        def one(b: bytes | None):
            if b is None:
                return None
            _decode_one(bytes(b))  # raises NotImplementedError on real formats
            if bytes(b[:4]) == FAKE_MAGIC:
                return FAKE_MAGIC + struct.pack("<II", width, height) + bytes(b[12:])
            return bytes(b)

        return blobs.map(one)

    return df.withColumn(bytes_col, resize(F.col(bytes_col)))
