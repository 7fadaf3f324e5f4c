"""Multimodal binary-column plumbing (task brief: first-class, decode stubbed).

Images/audio/video are opaque ``binary`` columns + typed metadata. The
Spark-side plumbing — schema, Arrow batch shape, partition behavior — is real
and tested; the actual media decoding is stubbed deterministically because
the sandbox has no image/audio libraries (the TIFF path in operators/decode.py
is the one fully-real media decoder).

* ``attach_media_meta``  — parse magic bytes → (media_type, byte_len) columns.
* ``extract_features``   — mapInPandas producing a fixed-size feature vector
  per blob: REAL path = byte-histogram statistics (deterministic, vectorized);
  a hook marks where a true image decoder would slot in.
* ``frame_sample``       — deterministic byte-range sampler standing in for
  video frame extraction (same batch/row-count contract: one row per frame).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURES = 16


def attach_media_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Magic-byte sniffing with built-in functions (JVM-side)."""
    b = F.col(blob_col)
    head = F.hex(F.substring(b, 1, 4))
    return df.withColumns(
        {
            "media_type": F.when(head.startswith("FFD8"), "image/jpeg")
            .when(head.startswith("89504E47"), "image/png")
            .when(head.startswith("49492A00"), "image/tiff")
            .when(head.startswith("4D4D002A"), "image/tiff")
            .when(head.startswith("52494646"), "audio/wav")
            .otherwise("application/octet-stream"),
            "byte_len": F.length(b),
        }
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """Per-blob fixed-size feature vector via mapInPandas (Arrow batches).

    STUB NOTE: a real deployment would decode pixels here (PIL/ffmpeg absent
    in-sandbox). The deterministic stand-in is a 16-bin byte histogram +
    moments — byte-level but honest about the plumbing: batch iteration,
    schema, and partitioning are exactly what a pixel decoder would use.
    """
    sel = df.select(F.col(id_col).cast("string"), F.col(blob_col))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, types = [], []
            for blob in pdf[blob_col]:
                raw = np.frombuffer(bytes(blob or b""), dtype=np.uint8)
                if raw.size == 0:
                    feats.append([0.0] * N_FEATURES)
                    types.append("empty")
                    continue
                hist = np.histogram(raw, bins=N_FEATURES - 2, range=(0, 255))[0]
                hist = hist / raw.size
                feats.append([*hist.tolist(), float(raw.mean()), float(raw.std())])
                types.append("raw-bytes")
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "media_type": types,
                    "features": feats,
                }
            )

    return sel.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame, n_frames: int = 4, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """One row per sampled 'frame' (deterministic byte slices — stub for
    video frame extraction; row-explosion contract is the real thing)."""
    sel = df.select(F.col(id_col).cast("string"), F.col(blob_col))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob or b"")
                step = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame"].append(raw[i * step : (i + 1) * step])
            yield pd.DataFrame(out)

    return sel.mapInPandas(batches, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("error_msg", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Resize media blobs to (target_w, target_h) via mapInPandas.

    TIFF blobs are REALLY resized (in-repo decoder → nearest-neighbor
    pixel-center resample → in-repo writer; band count and dtype preserved).
    Formats whose codecs are absent in-sandbox (jpeg/png/...) produce an
    honest ``status='unsupported'`` row — the task-brief stub contract: the
    Spark plumbing (batching, schema, error channel) is real, the foreign
    decode is not faked.
    """
    sel = df.select(F.col(id_col).cast("string"), F.col(blob_col))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cog3pio_spark.tiff.reader import CogReader
        from cog3pio_spark.tiff.writer import write_tiff

        for pdf in it:
            out = {k.name: [] for k in RESIZE_SCHEMA}
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                raw = bytes(blob or b"")
                out["media_id"].append(mid)
                if raw[:2] not in (b"II", b"MM"):
                    out["status"].append("unsupported")
                    out["error_msg"].append(
                        "resize: only TIFF decodable in-sandbox (no PIL/ffmpeg)"
                    )
                    out["width"].append(None)
                    out["height"].append(None)
                    out["resized"].append(None)
                    continue
                try:
                    arr = CogReader(raw).to_numpy()  # (bands, h, w)
                    _, h, w = arr.shape
                    # nearest-neighbor at pixel centers (matches the affine
                    # pixel-center contract used everywhere else)
                    yi = ((np.arange(target_h) + 0.5) * h / target_h).astype(np.int64)
                    xi = ((np.arange(target_w) + 0.5) * w / target_w).astype(np.int64)
                    res = arr[:, yi.clip(0, h - 1)][:, :, xi.clip(0, w - 1)]
                    import io

                    buf = io.BytesIO()
                    write_tiff(buf, np.ascontiguousarray(res))
                    data = buf.getvalue()
                    out["status"].append("ok")
                    out["error_msg"].append(None)
                    out["width"].append(int(target_w))
                    out["height"].append(int(target_h))
                    out["resized"].append(data)
                except Exception as exc:
                    out["status"].append("error")
                    out["error_msg"].append(str(exc))
                    out["width"].append(None)
                    out["height"].append(None)
                    out["resized"].append(None)
            yield pd.DataFrame(out)

    return sel.mapInPandas(batches, RESIZE_SCHEMA)
