"""Minimal pure-stdlib PNG codec (zlib + struct only — no imaging libs).

Exists so the multimodal operators can decode REAL image bytes in
containers without PIL/cv2: the engine's decode boundary stops being a
stub the moment the payload is a PNG. Scope (deliberate):

- decode: 8-bit depth, color types 0 (grayscale), 2 (RGB, converted to
  luma with integer ITU-R 601 weights: L = (R*299 + G*587 + B*114) //
  1000 — deterministic floor arithmetic; near PIL's ``convert("L")`` but
  not bit-pinned to it), 4 (gray+alpha, alpha dropped) and 6 (RGBA,
  alpha dropped); all five scanline filter types (None/Sub/Up/Average/
  Paeth); no interlace (Adam7 rejected with a clear error).
- encode: 8-bit grayscale, filter 0, one IDAT — enough to generate real
  test payloads deterministically.

Spec: the public PNG specification (RFC 2083 / W3C PNG). Everything is
deterministic integer arithmetic, so decoded pixels are oracle-checkable
when the source image is generated from a closed-form formula.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png_gray", "decode_png_gray"]

_MAGIC = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(arr: np.ndarray) -> bytes:
    """(h, w) uint8 array -> grayscale PNG bytes (filter 0, one IDAT)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_png_gray expects a 2-D (h, w) array")
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + a[i].tobytes() for i in range(h))
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering -> (h, w*bpp) uint8 matrix."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for i in range(h):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        prev = out[i - 1] if i > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for j in range(bpp, stride):
                line[j] = (line[j] + line[j - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for j in range(stride):
                line[j] = (line[j] + prev[j]) & 0xFF
        elif ftype == 3:  # Average
            for j in range(stride):
                left = line[j - bpp] if j >= bpp else 0
                line[j] = (line[j] + ((left + int(prev[j])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for j in range(stride):
                left = line[j - bpp] if j >= bpp else 0
                ul = int(prev[j - bpp]) if j >= bpp else 0
                line[j] = (line[j] + _paeth(left, int(prev[j]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[i] = np.frombuffer(bytes(line), dtype=np.uint8)
    return out


def decode_png_gray(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) uint8 grayscale array (RGB via ITU-R 601 luma)."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = bit_depth = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth} (only 8)")
            if interlace:
                raise ValueError("interlaced (Adam7) PNG not supported")
            if color_type not in (0, 2, 4, 6):
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    mat = _unfilter(zlib.decompress(idat), h, w, bpp)
    if color_type == 0:
        return mat
    if color_type == 4:  # gray + alpha: drop alpha
        return mat[:, 0::2].copy()
    px = mat.reshape(h, w, bpp).astype(np.int64)
    # RGB(A) -> integer ITU-R 601 luma (floor); alpha dropped
    luma = (px[:, :, 0] * 299 + px[:, :, 1] * 587 + px[:, :, 2] * 114) // 1000
    return luma.astype(np.uint8)
