"""Multimodal column plumbing (task brief): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` stages.

The container has no codec libraries, so the *decode* kernels are
stubbed exactly as the task specifies: header sniffing + deterministic
byte-level features are real; pixel/sample decoding raises
``NotImplementedError`` unless the deterministic fake is requested.
The Spark-side contract — schema, batch shape, partitioning, UDF
signature — is the real, tested part; a real decoder (PIL/ffmpeg)
drops into ``_decode_stub`` unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
        T.StructField("entropy_q", T.IntegerType(), True),  # quantized byte entropy
        T.StructField("partition_id", T.IntegerType(), True),
    ]
)

_MAGIC = (
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mpeg"),
    (b"\x1a\x45\xdf\xa3", "video/webm"),
    (b"%PDF-", "application/pdf"),
)


def sniff_media_type(data: bytes) -> str:
    for magic, mt in _MAGIC:
        if data[: len(magic)] == magic:
            return mt
    if data[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def _decode_stub(data: bytes, media_type: str, fake: bool) -> np.ndarray:
    """Pixel/sample decode. Real codecs are unavailable in this
    container; ``fake=True`` returns a deterministic pseudo-decode
    (byte stream folded into a fixed-shape array) so downstream
    plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            f"no codec for {media_type} in this environment; "
            "install PIL/ffmpeg and replace _decode_stub"
        )
    arr = np.frombuffer(data[:4096].ljust(4096, b"\0"), dtype=np.uint8)
    return arr.reshape(64, 64).astype(np.float32) / 255.0


def blob_metadata(
    df: DataFrame, id_col: str = "blob_id", blob_col: str = "blob"
) -> DataFrame:
    """Header sniff + size + sha256 + quantized byte entropy — one Arrow
    pass, numpy-vectorized per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for pdf in batches:
            rows = []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    rows.append((str(bid), None, 0, None, None, pid))
                    continue
                data = bytes(blob)
                counts = np.bincount(
                    np.frombuffer(data[:65536], dtype=np.uint8), minlength=256
                )
                p = counts[counts > 0] / max(len(data[:65536]), 1)
                entropy = float(-(p * np.log2(p)).sum())
                rows.append(
                    (
                        str(bid),
                        sniff_media_type(data),
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        int(entropy * 1000),
                        pid,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "blob_id", "media_type", "n_bytes", "sha256", "entropy_q",
                    "partition_id",
                ],
            )

    cols = df.select(F.col(id_col), F.col(blob_col))
    return cols.mapInPandas(run, BLOB_META_SCHEMA)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("blob_id", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_features(
    df: DataFrame,
    id_col: str = "blob_id",
    blob_col: str = "blob",
    fake_decode: bool = True,
) -> DataFrame:
    """decode (stub) → 16-dim pooled feature vector per blob. Shows the
    full image-pipeline shape: binary in, fixed-dim float array out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for bid, blob in zip(pdf[id_col], pdf[blob_col]):
                ids.append(str(bid))
                if blob is None:
                    feats.append(None)
                    continue
                data = bytes(blob)
                img = _decode_stub(data, sniff_media_type(data), fake_decode)
                # 4x4 average pooling → 16-dim feature
                pooled = img.reshape(4, 16, 4, 16).mean(axis=(1, 3)).flatten()
                feats.append([float(x) for x in pooled])
            yield pd.DataFrame({"blob_id": ids, "features": feats})

    return df.select(F.col(id_col), F.col(blob_col)).mapInPandas(run, FEATURE_SCHEMA)
