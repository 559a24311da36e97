"""Minimal pure-stdlib GIF codec (struct only — no imaging/video libs).

Completes the engine's REAL-decode modality triad (functions/png.py =
image, functions/wav.py = audio, this = video frames): animated GIF is the
simplest real multi-frame container, so the multimodal frame-extraction
operators can decode REAL video-like bytes in a container with zero
third-party dependencies. Scope (deliberate — the no-dependency floor):

- decode: GIF87a/GIF89a, global or per-frame local color tables, full
  variable-width LZW (code growth to 12 bits, CLEAR/END handling),
  multiple image frames; extensions (graphic control, comment, app) are
  skipped structurally. No interlace (rejected with a clear error), no
  transparency compositing (each frame decodes standalone), no frame
  disposal logic.
- encode: grayscale frames over a 256-entry identity palette, literal-code
  LZW with a CLEAR every 200 pixels (keeps the code width at 9 bits while
  remaining a fully conformant stream any decoder accepts) — enough to
  generate real multi-frame test payloads deterministically.

Palette entries map to luma with the same integer ITU-R 601 weights as
png.py (L = (R*299 + G*587 + B*114) // 1000), so decoded frames are
oracle-checkable when the source frames follow a closed-form formula.

Spec: GIF89a specification (CompuServe, 1990; W3C mirror).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif_gray", "decode_gif_gray"]


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode_literals(min_code_size: int, indices: np.ndarray) -> bytes:
    """Conformant LZW stream emitting every pixel as a literal code, with a
    CLEAR every 200 pixels so the code width stays at min_code_size+1. The
    encoder tracks the decoder's dictionary growth exactly (first code
    after CLEAR adds no entry; every later code adds one)."""
    clear = 1 << min_code_size
    end = clear + 1
    w = _BitWriter()
    width = min_code_size + 1
    w.write(clear, width)
    next_code = end + 1
    count = 0
    for px in indices:
        if count == 200:
            w.write(clear, width)
            width = min_code_size + 1
            next_code = end + 1
            count = 0
        w.write(int(px), width)
        if count > 0:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        count += 1
    w.write(end, width)
    return w.flush()


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: dict[int, list[int]] = {}
    next_code = end + 1
    prev: int | None = None
    out: list[int] = []

    def entry(c: int) -> list[int]:
        if c < clear:
            return [c]
        return table[c]

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out  # stream ended without END code — tolerate
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            table = {}
            next_code = end + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            out.extend(entry(code))
        else:
            if code < next_code and (code < clear or code in table):
                seq = entry(code)
            elif code == next_code:
                seq = entry(prev) + [entry(prev)[0]]
            else:
                raise ValueError(f"corrupt LZW stream: code {code} > {next_code}")
            out.extend(seq)
            table[next_code] = entry(prev) + [seq[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code


def _sub_blocks(payload: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def encode_gif_gray(frames: "list[np.ndarray]") -> bytes:
    """Animated GIF from uint8 grayscale (h, w) frames (identity palette)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    for fr in frames:
        if fr.shape != (h, w):
            raise ValueError("all frames must share the logical screen size")
        out.append(0x2C)  # image descriptor
        out += struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(8)  # LZW minimum code size
        out += _sub_blocks(
            _lzw_encode_literals(8, np.asarray(fr, dtype=np.uint8).ravel())
        )
    out.append(0x3B)
    return bytes(out)


def decode_gif_gray(data: bytes) -> "list[np.ndarray]":
    """All frames of a GIF as uint8 luma arrays (h, w) — see module scope."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    frames: list[np.ndarray] = []
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while data[pos] != 0:
                pos += data[pos] + 1
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block 0x{block:02x} at {pos - 1}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported (builtin floor)")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = data[pos : pos + 3 * n]
            pos += 3 * n
        if pal is None:
            raise ValueError("frame has no color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = _lzw_decode(min_code_size, bytes(lzw))
        if len(idx) < w * h:
            raise ValueError(f"frame underflow: {len(idx)} < {w * h}")
        arr = np.asarray(idx[: w * h], dtype=np.int64).reshape(h, w)
        p = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        luma = (p[:, 0] * 299 + p[:, 1] * 587 + p[:, 2] * 114) // 1000
        frames.append(luma[arr].astype(np.uint8))
    return frames
