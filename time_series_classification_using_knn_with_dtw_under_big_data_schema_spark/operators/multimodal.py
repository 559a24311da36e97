"""Multimodal column plumbing (engine extension; BASELINE.json north-star).

Convention: media are opaque ``binary`` columns + a typed metadata struct
(media_type, width/height or sample_rate/duration, codec). The Spark-side
plumbing — schemas, Arrow batch shapes, mapInPandas signatures, partitioning
— is real and tested; the actual decoders are STUBBED (image/audio libs are
not in this container): ``fake=True`` produces deterministic content-derived
features, ``fake=False`` raises NotImplementedError at the decode site.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("media_type", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, mean_luma double, feature array<double>"
)


def _fake_decode(payload: bytes, n_features: int = 8) -> np.ndarray:
    """Deterministic stand-in for a pixel decode: content-derived features
    from a sha256 of the payload. Stable across runs/executors."""
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[: n_features * 4], dtype="<u4").astype(np.float64)
    return raw / np.float64(2**32)


def _try_pil():
    """PIL.Image if an imaging library is installed, else None. Checked at
    KERNEL BUILD time so fake=False fails fast on the driver with a clear
    message instead of per-task on executors."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_image_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    fake: bool = True,
    n_features: int = 8,
) -> DataFrame:
    """binary payload -> per-image feature vector via mapInPandas.

    Arrow-batched: each pandas batch decodes vectorized-per-row; at scale the
    input should be repartitioned so one partition's payloads fit in executor
    memory (payloads are the dominant bytes — keep maxPartitionBytes small
    for binary-heavy tables).

    ``fake=False`` decodes REAL images when an imaging library (PIL) is
    installed: grayscale decode, width/height from the actual image,
    mean_luma = mean gray level / 255, feature = row means of an
    (n_features x n_features) nearest-neighbor thumbnail / 255. Without
    PIL it raises NotImplementedError at kernel build. The sha256 stub
    stays the default so every oracle-checked query (q40/q41/q83) is
    byte-stable regardless of what the container has installed.
    """
    if not fake and _try_pil() is None:
        raise NotImplementedError(
            "real image decode requires an imaging library (PIL) not present "
            "in this environment; run with fake=True for the deterministic "
            "content-derived stand-in"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = None if fake else _try_pil()
        for pdf in batches:
            meta = pdf["meta"]
            if fake:
                feats = [
                    _fake_decode(bytes(p), n_features) if p is not None else np.zeros(n_features)
                    for p in pdf[payload_col]
                ]
                widths = [m["width"] if m is not None else None for m in meta]
                heights = [m["height"] if m is not None else None for m in meta]
                lumas = [float(f.mean()) for f in feats]
            else:
                feats, widths, heights, lumas = [], [], [], []
                for p in pdf[payload_col]:
                    if p is None:
                        feats.append(np.zeros(n_features))
                        widths.append(None)
                        heights.append(None)
                        lumas.append(0.0)
                        continue
                    img = Image.open(io.BytesIO(bytes(p))).convert("L")
                    widths.append(img.width)
                    heights.append(img.height)
                    lumas.append(float(np.asarray(img, dtype=np.float64).mean() / 255.0))
                    thumb = np.asarray(
                        img.resize((n_features, n_features), Image.NEAREST),
                        dtype=np.float64,
                    )
                    feats.append(thumb.mean(axis=1) / 255.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": widths,
                    "height": heights,
                    "mean_luma": lumas,
                    "feature": [list(f) for f in feats],
                }
            )

    return df.mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame,
    *,
    every_n: int = 10,
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame index.

    The frame index fan-out (explode over a sequence sized by metadata) is
    real Spark; extracting actual frame bytes is the stubbed decode step.
    Output: (media_id, frame_index, frame_payload=null placeholder).
    """
    n_frames = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    out = df.select(
        "media_id",
        F.explode(F.when(n_frames > 0, idx).otherwise(F.array().cast("array<int>"))).alias(
            "frame_index"
        ),
    )
    return out.withColumn("frame_payload", F.lit(None).cast("binary"))


def synthetic_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/demos (binary payloads)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        rows.append(
            (
                i,
                bytearray(payload),
                ("image" if i % 3 else "video", 64 + i % 5, 48, (i % 3 == 0) * (20 + i)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, out_w int, out_h int, pixels array<double>, "
    "px_checksum long, mean_px double"
)


def resize_image(
    df: DataFrame,
    *,
    out_w: int = 4,
    out_h: int = 4,
    payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """Nearest-neighbor image resize over the decode boundary.

    The RESIZE math is real (source pixel of output (oi, oj) is
    ((oi*h)//out_h, (oj*w)//out_w) — the standard nearest-neighbor index
    map); only the pixel SOURCE is the stubbed decode (pixel (i, j) =
    byte (i*w + j) mod 32 of the payload's sha256 — deterministic, so the
    whole operator is oracle-checkable). ``fake=False`` decodes REAL
    grayscale pixels when PIL is installed (same nearest-neighbor index
    map, applied by PIL's NEAREST resize) and raises NotImplementedError
    at kernel build otherwise. Output: the resized pixel array plus
    integer-exact checksum/mean.
    """
    if not fake and _try_pil() is None:
        raise NotImplementedError(
            "real image decode requires an imaging library (PIL) not present "
            "in this environment; run with fake=True"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = None if fake else _try_pil()
        for pdf in batches:
            out = {
                "media_id": [], "out_w": [], "out_h": [], "pixels": [],
                "px_checksum": [], "mean_px": [],
            }
            for mid, p, meta in zip(pdf["media_id"], pdf[payload_col], pdf["meta"]):
                if fake:
                    w = int(meta["width"])
                    h = int(meta["height"])
                    digest = hashlib.sha256(bytes(p) if p is not None else b"").digest()
                    px = [
                        float(digest[(((oi * h) // out_h) * w + ((oj * w) // out_w)) % 32])
                        for oi in range(out_h)
                        for oj in range(out_w)
                    ]
                else:
                    img = Image.open(io.BytesIO(bytes(p))).convert("L")
                    arr = np.asarray(
                        img.resize((out_w, out_h), Image.NEAREST), dtype=np.float64
                    )
                    px = [float(v) for v in arr.reshape(-1)]
                total = int(sum(px))
                out["media_id"].append(mid)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["pixels"].append(px)
                out["px_checksum"].append(total)
                out["mean_px"].append(total / (out_w * out_h))
            yield pd.DataFrame(out)

    return df.mapInPandas(op, schema=RESIZED_SCHEMA)
