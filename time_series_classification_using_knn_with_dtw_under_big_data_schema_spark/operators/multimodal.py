"""Multimodal column plumbing (engine extension; BASELINE.json north-star).

Convention: media are opaque ``binary`` columns + a typed metadata struct
(media_type, width/height or sample_rate/duration, codec). The Spark-side
plumbing — schemas, Arrow batch shapes, mapInPandas signatures,
partitioning — is real and tested. Decoder backends, selected per call:

- ``stub``: deterministic sha256 content-derived pixels/features (no
  decode; byte-stable everywhere — the oracle-gated q40/q41/q83 default).
- ``builtin``: REAL decode via the pure-stdlib codecs with payload
  sniffing — PNG (functions/png.py: every static-image IHDR combo,
  all five scanline filters, Adam7) and baseline JPEG
  (functions/jpeg.py: SOF0, 4:4:4/grayscale, restart markers) — real
  pixels with no imaging library installed. Deterministic integer
  output, so generated test images make even real decoding
  oracle-checkable (q94 PNG, q105 JPEG).
- ``pil``: PIL decode (any format PIL reads, PIL's NEAREST resample);
  raises NotImplementedError when PIL is absent.
- ``auto``: pil if installed, else builtin.

The legacy ``fake`` flag maps fake=True -> stub, fake=False -> auto.
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
    KERNEL BUILD time so decoder='pil' fails fast on the driver with a
    clear message instead of per-task on executors."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _resolve_decoder(decoder: str | None, fake: bool) -> str:
    """-> one of 'stub' | 'pil' | 'builtin' (auto resolved at build time)."""
    if decoder is None:
        decoder = "stub" if fake else "auto"
    if decoder == "auto":
        return "pil" if _try_pil() is not None else "builtin"
    if decoder == "pil" and _try_pil() is None:
        raise NotImplementedError(
            "decoder='pil' requires an imaging library (PIL) not present in "
            "this environment; use decoder='builtin' (pure-stdlib PNG codec) "
            "or the deterministic 'stub'"
        )
    if decoder not in ("stub", "pil", "builtin"):
        raise ValueError(f"unknown decoder {decoder!r}")
    return decoder


def _nn_sample(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Corner-convention nearest-neighbor sample: output (oi, oj) reads
    source ((oi*h)//out_h, (oj*w)//out_w) — the same index map the stub
    pixel model and the q83/q94 oracles use (integer-exact, so real
    decodes stay oracle-checkable). PIL's NEAREST uses the center
    convention instead; the 'pil' backend keeps PIL semantics."""
    h, w = arr.shape
    ri = (np.arange(out_h) * h) // out_h
    rj = (np.arange(out_w) * w) // out_w
    return arr[np.ix_(ri, rj)]


def decode_image_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    fake: bool = True,
    decoder: str | None = None,
    n_features: int = 8,
) -> DataFrame:
    """binary payload -> per-image feature vector via mapInPandas.

    Arrow-batched: each pandas batch decodes vectorized-per-row; at scale the
    input should be repartitioned so one partition's payloads fit in executor
    memory (payloads are the dominant bytes — keep maxPartitionBytes small
    for binary-heavy tables).

    Real backends ('builtin' pure-stdlib PNG codec / 'pil', module
    docstring): grayscale decode, width/height from the actual image,
    mean_luma = mean gray level / 255, feature = row means of an
    (n_features x n_features) nearest-neighbor thumbnail / 255. The sha256
    stub stays the default so every oracle-checked query (q40/q41/q83) is
    byte-stable regardless of what the container has installed; q94
    oracle-checks the REAL builtin decode on generated PNGs.
    """
    mode = _resolve_decoder(decoder, fake)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _try_pil() if mode == "pil" else None
        for pdf in batches:
            meta = pdf["meta"]
            if mode == "stub":
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
                    if mode == "pil":
                        img = Image.open(io.BytesIO(bytes(p))).convert("L")
                        arr = np.asarray(img, dtype=np.float64)
                        thumb = np.asarray(
                            img.resize((n_features, n_features), Image.NEAREST),
                            dtype=np.float64,
                        )
                    else:
                        a8 = decode_builtin_gray(bytes(p))
                        arr = a8.astype(np.float64)
                        thumb = _nn_sample(a8, n_features, n_features).astype(np.float64)
                    heights.append(int(arr.shape[0]))
                    widths.append(int(arr.shape[1]))
                    lumas.append(float(arr.mean() / 255.0))
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


def decode_builtin_gray(data: bytes) -> np.ndarray:
    """Pure-stdlib grayscale decode with payload sniffing: PNG magic ->
    functions/png.py, JPEG SOI -> functions/jpeg.py (baseline, 4:4:4 /
    grayscale). One entry point so the builtin operators accept mixed
    image corpora without a format column."""
    if data[:4] == b"\x89PNG":
        from ..functions.png import decode_png_gray

        return decode_png_gray(data)
    if data[:2] == b"\xff\xd8":
        from ..functions.jpeg import decode_jpeg_gray

        return decode_jpeg_gray(data)
    raise ValueError("unrecognized image payload (builtin: PNG or JPEG)")


def resize_image(
    df: DataFrame,
    *,
    out_w: int = 4,
    out_h: int = 4,
    payload_col: str = "payload",
    fake: bool = True,
    decoder: str | None = None,
) -> DataFrame:
    """Nearest-neighbor image resize over the decode boundary.

    The RESIZE math is real (source pixel of output (oi, oj) is
    ((oi*h)//out_h, (oj*w)//out_w) — the corner-convention nearest-neighbor
    index map). Pixel SOURCE per backend (module docstring): 'stub' =
    pixel (i, j) is byte (i*w + j) mod 32 of the payload's sha256
    (deterministic; q83's oracle), 'builtin' = REAL pixels from the
    pure-stdlib PNG codec with the SAME index map (deterministic — q94
    oracle-checks real decode + resize end-to-end), 'pil' = PIL decode +
    PIL's NEAREST resample (center convention — PIL semantics, pinned by
    the skipif-PIL test). Output: the resized pixel array plus
    integer-exact checksum/mean.
    """
    mode = _resolve_decoder(decoder, fake)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        Image = _try_pil() if mode == "pil" else None
        for pdf in batches:
            out = {
                "media_id": [], "out_w": [], "out_h": [], "pixels": [],
                "px_checksum": [], "mean_px": [],
            }
            for mid, p, meta in zip(pdf["media_id"], pdf[payload_col], pdf["meta"]):
                if mode == "stub":
                    w = int(meta["width"])
                    h = int(meta["height"])
                    digest = hashlib.sha256(bytes(p) if p is not None else b"").digest()
                    px = [
                        float(digest[(((oi * h) // out_h) * w + ((oj * w) // out_w)) % 32])
                        for oi in range(out_h)
                        for oj in range(out_w)
                    ]
                elif mode == "pil":
                    img = Image.open(io.BytesIO(bytes(p))).convert("L")
                    arr = np.asarray(
                        img.resize((out_w, out_h), Image.NEAREST), dtype=np.float64
                    )
                    px = [float(v) for v in arr.reshape(-1)]
                else:
                    a8 = decode_builtin_gray(bytes(p))
                    px = [float(v) for v in _nn_sample(a8, out_h, out_w).reshape(-1)]
                total = int(sum(px))
                out["media_id"].append(mid)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["pixels"].append(px)
                out["px_checksum"].append(total)
                out["mean_px"].append(total / (out_w * out_h))
            yield pd.DataFrame(out)

    return df.mapInPandas(op, schema=RESIZED_SCHEMA)


def synthetic_png_media(spark, n: int = 24) -> DataFrame:
    """Media table whose payloads are REAL PNGs (pure-stdlib encoder) of
    closed-form gradient images: pixel(i, j) = (i*7 + j*13 + 31*media_id)
    mod 256, size (8 + id%5) x (6 + id%4). Because the pixels come from a
    formula, a SQL oracle can verify the REAL decode+resize output without
    being able to parse PNG itself (q94)."""
    from ..functions.png import encode_png_gray

    rows = []
    for i in range(n):
        w, h = 8 + i % 5, 6 + i % 4
        grid = np.add.outer(np.arange(h) * 7, np.arange(w) * 13) + 31 * i
        payload = encode_png_gray((grid % 256).astype(np.uint8))
        rows.append((i, bytearray(payload), ("image", w, h, 0)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_jpeg_media(spark, n: int = 24) -> DataFrame:
    """Media table whose payloads are REAL baseline JPEGs (pure-stdlib
    encoder, functions/jpeg.py) built at the COEFFICIENT level: every 8x8
    block is DC-only with quant step 8, so block (by, bx) of image ``i``
    decodes to the exact flat value

        ((31*i + 13*bx + 7*by) % 200) - 100 + 128

    (IDCT of a DC-only block is uniform; with q=8 the value is integer —
    no float rounding ambiguity). Sizes: (2 + i%3) x (1 + i%2) blocks.
    The closed form makes the REAL Huffman+IDCT decode path SQL-oracle
    checkable (q105, the q94 technique at coefficient level)."""
    from ..functions.jpeg import encode_jpeg_coeffs

    rows = []
    qtab = np.full(64, 8, dtype=np.int64)
    for i in range(n):
        bw, bh = 2 + i % 3, 1 + i % 2
        coeffs = np.zeros((bh, bw, 64), dtype=np.int64)
        for by in range(bh):
            for bx in range(bw):
                coeffs[by, bx, 0] = ((31 * i + 13 * bx + 7 * by) % 200) - 100
        payload = encode_jpeg_coeffs(coeffs, qtab, bh * 8, bw * 8)
        rows.append((i, bytearray(payload), ("image", bw * 8, bh * 8, 0)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_progressive_jpeg_media(spark, n: int = 24) -> DataFrame:
    """Media table whose payloads are REAL PROGRESSIVE JPEGs (SOF2,
    functions/jpeg.py::encode_jpeg_coeffs_progressive — DC successive
    approximation at Al=1 + refinement, two AC spectral bands (1-5, 6-63)
    at Al=1 + refinements, EOB runs across blocks) built at the
    COEFFICIENT level so every pixel has a CLOSED FORM an SQL oracle can
    recompute (q112, the q105 technique extended to nonzero AC):

    every image is 16x16 (2x2 blocks), quant step 8 everywhere; block
    (by, bx) of image ``i`` has DC = ((31*i + 13*bx + 7*by) % 200) - 100
    and the AC pattern: block (0,0) carries zigzag 1/3/7 =
    ((5i+1)%7)-3 / ((3i+2)%5)-2 / (i%3)-1; blocks (0,1)/(1,0) carry
    zigzag 2 = ((i+2)%5)-2 / ((i+1)%5)-2; block (1,1) is DC-only (its AC
    scans are pure EOB-run members). Pixel (x, y) of block (by, bx):

        128 + dc + sum_k c_k * 8 * B(u_k, x) * B(v_k, y)

    with B(0, t) = sqrt(1/8), B(u, t) = cos((2t+1) u pi / 16) / 2 (the
    orthonormal DCT basis; zigzag 1 -> (u,v)=(0,1), 2 -> (1,0),
    3 -> (2,0), 7 -> (1,2)). Coefficient values are chosen so every true
    pixel is > 1e-3 away from a rounding boundary and inside (1, 254)
    (verified in tests), so numpy and any SQL engine round identically."""
    from ..functions.jpeg import encode_jpeg_coeffs_progressive

    rows = []
    qtab = np.full(64, 8, dtype=np.int64)
    for i in range(n):
        coeffs = np.zeros((2, 2, 64), dtype=np.int64)
        for by in range(2):
            for bx in range(2):
                coeffs[by, bx, 0] = ((31 * i + 13 * bx + 7 * by) % 200) - 100
        coeffs[0, 0, 1] = ((5 * i + 1) % 7) - 3
        coeffs[0, 0, 3] = ((3 * i + 2) % 5) - 2
        coeffs[0, 0, 7] = (i % 3) - 1
        coeffs[0, 1, 2] = ((i + 2) % 5) - 2
        coeffs[1, 0, 2] = ((i + 1) % 5) - 2
        payload = encode_jpeg_coeffs_progressive(coeffs, qtab, 16, 16)
        rows.append((i, bytearray(payload), ("image", 16, 16, 0)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_samples int, peak int, "
    "sum_sq long, zero_crossings int"
)


def decode_audio_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    decoder: str = "builtin",
) -> DataFrame:
    """binary WAV payload -> waveform statistics via mapInPandas.

    decoder='builtin' (default) parses REAL RIFF/PCM16 bytes with the
    pure-stdlib codec (functions/wav.py); 'stub' derives deterministic
    sha256 pseudo-samples (16 int16 values) without decoding — the
    byte-stable fallback for non-WAV payloads. All outputs are exact
    integer statistics (peak = max |s|, sum_sq = sum of squared samples,
    zero_crossings counts sign flips with sign(0) treated as +), so the
    REAL decode is oracle-checkable on generated payloads (q95, same
    closed-form-formula trick as q94's PNG decode).
    """
    if decoder not in ("builtin", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "builtin":
            from ..functions.wav import decode_wav_pcm16
        for pdf in batches:
            out = {
                "media_id": [], "sample_rate": [], "n_samples": [],
                "peak": [], "sum_sq": [], "zero_crossings": [],
            }
            for mid, p in zip(pdf["media_id"], pdf[payload_col]):
                if p is None:
                    s = np.zeros(0, dtype=np.int64)
                    rate = 0
                elif decoder == "builtin":
                    s16, rate = decode_wav_pcm16(bytes(p))
                    s = s16.astype(np.int64)
                else:
                    digest = hashlib.sha256(bytes(p)).digest()
                    s = np.frombuffer(digest, dtype="<i2").astype(np.int64)
                    rate = 8000
                n = len(s)
                pos = s >= 0
                out["media_id"].append(mid)
                out["sample_rate"].append(int(rate))
                out["n_samples"].append(n)
                out["peak"].append(int(np.abs(s).max()) if n else 0)
                out["sum_sq"].append(int((s * s).sum()) if n else 0)
                out["zero_crossings"].append(int((pos[1:] != pos[:-1]).sum()) if n else 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(op, schema=AUDIO_FEATURES_SCHEMA)


def synthetic_wav_media(spark, n: int = 16, n_samples: int = 256) -> DataFrame:
    """Media table whose payloads are REAL mono PCM16 WAVs of closed-form
    integer waveforms: s[t] = ((t*t*7 + t*13 + 31*media_id) mod 4096) -
    2048 — so a SQL oracle can verify the REAL decode without parsing RIFF
    itself (q95)."""
    from ..functions.wav import encode_wav_pcm16

    rows = []
    for i in range(n):
        t = np.arange(n_samples, dtype=np.int64)
        s = ((t * t * 7 + t * 13 + 31 * i) % 4096) - 2048
        payload = encode_wav_pcm16(s.astype(np.int16), sample_rate=8000 + 100 * i)
        rows.append((i, bytearray(payload), ("audio", 0, 0, 0)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


VIDEO_FRAMES_SCHEMA = (
    "media_id long, frame_index int, width int, height int,"
    " px_checksum bigint, mean_px double"
)


def decode_video_frames(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    decoder: str = "builtin",
    every: int = 1,
) -> DataFrame:
    """binary video payload -> one row per sampled frame via mapInPandas.

    The REAL-decode completion of q41's metadata-only frame sampling:
    decoder='builtin' parses genuine animated-GIF bytes with the
    pure-stdlib codec (functions/gif.py — full LZW, no video libs) and
    emits exact integer statistics per kept frame (frame stride ``every``,
    matching sample_frames' range(0, n, every) semantics); 'stub' derives
    deterministic sha256 pseudo-frames without decoding (the byte-stable
    fallback for container formats outside the builtin floor). Stats are
    integer-exact (px_checksum = sum of luma; mean divides by the pixel
    count once), so REAL decodes are oracle-checkable on generated
    payloads (q99 — the q94/q95 closed-form-formula trick).
    """
    if decoder not in ("builtin", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == "builtin":
            from ..functions.gif import decode_gif_gray
        for pdf in batches:
            out = {
                "media_id": [], "frame_index": [], "width": [],
                "height": [], "px_checksum": [], "mean_px": [],
            }
            for mid, p in zip(pdf["media_id"], pdf[payload_col]):
                if p is None:
                    continue
                if decoder == "builtin":
                    frames = decode_gif_gray(bytes(p))
                else:
                    digest = hashlib.sha256(bytes(p)).digest()
                    frames = [
                        np.frombuffer(digest[8 * f : 8 * f + 8], dtype=np.uint8)
                        .reshape(2, 4)
                        for f in range(4)
                    ]
                for fi in range(0, len(frames), every):
                    fr = frames[fi].astype(np.int64)
                    h, w = fr.shape
                    cks = int(fr.sum())
                    out["media_id"].append(mid)
                    out["frame_index"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["px_checksum"].append(cks)
                    out["mean_px"].append(round(cks / (w * h), 6))
            yield pd.DataFrame(out)

    return df.mapInPandas(op, schema=VIDEO_FRAMES_SCHEMA)


def synthetic_gif_media(
    spark, n: int = 12, w: int = 8, h: int = 6, n_frames: int = 5
) -> DataFrame:
    """Media table whose payloads are REAL animated GIFs of closed-form
    frames: px(f, x, y, id) = (x*7 + y*13 + f*29 + id*31) mod 256 over an
    identity grayscale palette — so a SQL oracle can verify the REAL
    multi-frame decode without parsing GIF/LZW itself (q99)."""
    from ..functions.gif import encode_gif_gray

    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    rows = []
    for i in range(n):
        frames = [
            ((x * 7 + y * 13 + f * 29 + i * 31) % 256).astype(np.uint8)
            for f in range(n_frames)
        ]
        payload = encode_gif_gray(frames)
        rows.append((i, bytearray(payload), ("video", w, h, n_frames)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
