"""Minimal pure-stdlib PNG codec (zlib + struct only — no imaging libs).

Exists so the multimodal operators can decode REAL image bytes in
containers without PIL/cv2: the engine's decode boundary stops being a
stub the moment the payload is a PNG. Scope (deliberate):

- decode: every legal IHDR combination of the PNG spec's static-image
  core — color types 0 (grayscale, depths 1/2/4/8/16), 2 (RGB, 8/16),
  3 (palette via PLTE, depths 1/2/4/8), 4 (gray+alpha, 8/16) and
  6 (RGBA, 8/16); all five scanline filter types (None/Sub/Up/Average/
  Paeth); Adam7 interlace for all of the above. Color converts to luma
  with integer ITU-R 601 weights: L = (R*299 + G*587 + B*114) // 1000 —
  deterministic floor arithmetic; near PIL's ``convert("L")`` but not
  bit-pinned to it. Sub-8-bit gray scales exactly to 8-bit
  (val * (255 // (2^d - 1)) — 255 is divisible by 1, 3 and 15); 16-bit
  samples keep the high byte (the spec's own 16->8 approximation).
  Alpha is dropped (no compositing — features want luminance).
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

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass — the
# spec's starting_col/row and col/row_increment tables
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_LEGAL_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


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


def _unfilter(raw: bytes, pos: int, h: int, stride: int, bpp: int):
    """Undo per-scanline filtering for one (sub-)image starting at byte
    ``pos`` -> ((h, stride) uint8 matrix, next pos). ``bpp`` is the
    filter-unit byte distance (>=1 even for sub-byte pixels, per spec)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for i in range(h):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        if len(line) < stride:
            raise ValueError("truncated PNG pixel data")
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
    return out, pos


def _rows_to_samples(mat: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(h, stride) filtered-byte matrix -> (h, w, channels) int32 samples
    (16-bit reduced to the high byte; sub-byte bits unpacked MSB-first)."""
    h = mat.shape[0]
    if depth == 8:
        return mat[:, : w * channels].reshape(h, w, channels).astype(np.int32)
    if depth == 16:
        # big-endian sample pairs; keep the high byte (spec-sanctioned)
        return mat[:, : 2 * w * channels : 2].reshape(h, w, channels).astype(np.int32)
    # depths 1/2/4 are single-channel only (gray or palette index)
    bits = np.unpackbits(mat, axis=1)  # MSB-first, matching the spec
    per = depth
    vals = np.zeros((h, w), dtype=np.int32)
    for b in range(per):
        vals = (vals << 1) | bits[:, b::per][:, :w]
    return vals.reshape(h, w, 1)


def decode_png_gray(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w) uint8 grayscale array (color via ITU-R 601 luma).

    Handles all legal static-image IHDR combinations including palette
    (PLTE) and Adam7 interlace — see module docstring for the exact
    sample-conversion arithmetic.
    """
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    idat = b""
    plte = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if bit_depth not in _LEGAL_DEPTHS[color_type]:
                raise ValueError(
                    f"illegal bit depth {bit_depth} for color type {color_type}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    if color_type == 3 and plte is None:
        raise ValueError("palette image without PLTE chunk")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(idat)

    samples = np.zeros((h, w, channels), dtype=np.int32)
    bpp = max(1, channels * bit_depth // 8)
    at = 0
    if interlace == 0:
        stride = (w * channels * bit_depth + 7) // 8
        mat, at = _unfilter(raw, 0, h, stride, bpp)
        samples = _rows_to_samples(mat, w, channels, bit_depth)
    else:  # Adam7: seven independently-filtered sub-images, scattered back
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass consumes no bytes
            stride = (pw * channels * bit_depth + 7) // 8
            mat, at = _unfilter(raw, at, ph, stride, bpp)
            sub = _rows_to_samples(mat, pw, channels, bit_depth)
            samples[y0::dy, x0::dx, :] = sub

    if color_type == 3:
        rgb = plte[samples[:, :, 0]]
        luma = (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
        return luma.astype(np.uint8)
    if color_type == 0:
        g = samples[:, :, 0]
        if bit_depth < 8:
            g = g * (255 // ((1 << bit_depth) - 1))
        return g.astype(np.uint8)
    if color_type == 4:  # gray + alpha: drop alpha
        return samples[:, :, 0].astype(np.uint8)
    # RGB(A) -> integer ITU-R 601 luma (floor); alpha dropped
    luma = (
        samples[:, :, 0] * 299 + samples[:, :, 1] * 587 + samples[:, :, 2] * 114
    ) // 1000
    return luma.astype(np.uint8)
