"""Minimal pure-stdlib baseline JPEG codec (struct + numpy only — no
imaging libs). Completes the no-dependency decode floor alongside the PNG
(functions/png.py), GIF (functions/gif.py) and WAV (functions/wav.py)
codecs: the multimodal operators decode REAL JPEG bytes in containers
without PIL/cv2.

Scope (deliberate):

- decode: baseline sequential DCT (SOF0), 8-bit precision, 1 or 3
  components with NO chroma subsampling (all sampling factors 1x1 — the
  4:4:4 / grayscale core; subsampled files raise with a clear message,
  the PIL backend covers them), arbitrary DQT/DHT tables read from the
  stream, restart markers (DRI), FF00 byte-stuffing. 3-component scans
  return the Y (luma) plane — the feature extractors want luminance, and
  baseline JPEG's Y IS the ITU-601 luma. Output: uint8 (H, W).
- encode: 8-bit grayscale fixtures. Two entry points:
  ``encode_jpeg_gray`` runs the full forward path (float DCT + quantize);
  ``encode_jpeg_coeffs`` writes CHOSEN quantized coefficient blocks
  directly — coefficient-exact fixtures whose decode is closed-form
  predictable (a DC-only block with quant step 8 decodes to the flat
  value DC + 128 exactly), which is what lets a SQL oracle hash-check the
  real entropy-decode + IDCT path (q105, the q94-PNG technique).
  The encoder emits its own canonical Huffman tables in DHT (all DC
  categories at 4 bits, all 162 AC run/size symbols at 8 bits — legal,
  just not size-optimal), so no spec-annex table data is embedded; the
  decoder reads whatever tables the stream declares.

Spec: the public JPEG standard (ITU-T T.81 / ISO 10918-1) baseline
process. Everything after entropy decode is deterministic arithmetic; the
only float stage is the IDCT, and DC-only blocks round to exact integers
(error ~2^-50, never near a rounding boundary).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_jpeg_gray",
    "encode_jpeg_gray",
    "encode_jpeg_coeffs",
]

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

# orthonormal 8-point DCT-II matrix: T[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _T.T @ block @ _T


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _T @ block @ _T.T


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the spec's canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first reader over entropy-coded data with FF00 de-stuffing;
    stops at any non-stuffing marker (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.cur = 0

    def _next_byte(self) -> int:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
                return 0xFF
            raise EOFError("marker in entropy data")
        self.pos += 1
        return b

    def read_bit(self) -> int:
        if self.bit == 0:
            self.cur = self._next_byte()
            self.bit = 8
        self.bit -= 1
        return (self.cur >> self.bit) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.bit = 0

    def at_marker(self) -> int | None:
        """When byte-aligned and positioned at FFxx (xx != 0), the marker."""
        d = self.data
        if self.bit == 0 and d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
            return d[self.pos + 1]
        return None


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 (H, W) luma plane. See module docstring."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (H, W, comps: [(cid, tq)])
    restart = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tab = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tab = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                qtabs[tq] = tab
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                codes = _canonical_codes(bits, vals)
                htabs[(tc, th)] = {(ln, c): s for s, (c, ln) in codes.items()}
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                if hv != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling not supported by the builtin "
                        "codec (4:4:4 / grayscale only); use decoder='pil'"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline sequential DCT (SOF0)")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cs] = (tt >> 4, tt & 15)
            h, w, comps = frame
            bh, bw = (h + 7) // 8, (w + 7) // 8
            planes = {cid: np.zeros((bh * 8, bw * 8)) for cid, _ in comps}
            r = _BitReader(data, pos + seglen)
            pred = {cid: 0 for cid, _ in comps}
            mcu = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart and mcu and mcu % restart == 0:
                        r.align()
                        m = r.at_marker()
                        if m is not None and 0xD0 <= m <= 0xD7:
                            r.pos += 2
                            pred = {cid: 0 for cid, _ in comps}
                    for cid, tq in comps:
                        tdc, tac = scan[cid]
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(r, htabs[(0, tdc)])
                        diff = _extend(r.receive(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, htabs[(1, tac)])
                            rr, ss = rs >> 4, rs & 15
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rr
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(r.receive(ss), ss)
                            k += 1
                        block = np.zeros((8, 8))
                        q = qtabs[tq]
                        for i, (row, col) in enumerate(_ZZ):
                            block[row, col] = zz[i] * q[i]
                        px = _idct2(block) + 128.0
                        planes[cid][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
                    mcu += 1
            y = planes[comps[0][0]][:h, :w]
            return np.clip(np.round(y), 0, 255).astype(np.uint8)
        pos += seglen
    raise ValueError("no scan data found")


# ---------------------------------------------------------------------------
# encoder (grayscale fixtures)
# ---------------------------------------------------------------------------

# our canonical fixture tables: DC categories 0..11 all 4-bit codes
# (12/16 <= 1), AC symbols all 8-bit codes (162/256 <= 1)
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg_coeffs(
    coeffs: np.ndarray,
    qtab: np.ndarray,
    h: int,
    w: int,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JPEG from CHOSEN quantized coefficients.

    coeffs: int array (bh, bw, 64) for grayscale or (bh, bw, 3, 64) for a
    4:4:4 3-component scan (component ids 1/2/3, shared tables), ZIGZAG
    order (index 0 = DC); qtab: int array (64,) in zigzag order. The
    decode of these bytes is exactly coeffs * qtab -> de-zigzag -> IDCT
    -> +128 -> round/clamp (component 1 = the returned Y plane).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path).
    """
    if coeffs.ndim == 3:
        coeffs = coeffs[:, :, None, :]
    bh, bw, nc = coeffs.shape[0], coeffs.shape[1], coeffs.shape[2]
    if (bh * 8 < h) or (bw * 8 < w):
        raise ValueError("coefficient grid smaller than image")
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    wtr = _BitWriter()
    chunks: list[bytes] = []
    pred = [0] * nc
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                chunks.append(wtr.flush())
                chunks.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                wtr = _BitWriter()
                pred = [0] * nc
            for ci in range(nc):
                zz = coeffs[by, bx, ci]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                t = _category(diff)
                code, ln = dc_codes[t]
                wtr.write(code, ln)
                if t:
                    wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        wtr.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes[(run << 4) | s]
                    wtr.write(code, ln)
                    wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if run:
                    code, ln = ac_codes[0x00]
                    wtr.write(code, ln)
            mcu += 1
    chunks.append(wtr.flush())
    entropy = b"".join(chunks)

    comp_ids = list(range(1, nc + 1))
    dqt = _seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qtab))
    sof = _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, nc)
        + b"".join(bytes([cid, 0x11, 0]) for cid in comp_ids),
    )
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    dri = _seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = _seg(
        0xDA,
        bytes([nc])
        + b"".join(bytes([cid, 0x00]) for cid in comp_ids)
        + bytes([0, 63, 0]),
    )
    return b"\xff\xd8" + dqt + sof + dht + dri + sos + entropy + b"\xff\xd9"


def encode_jpeg_gray(img: np.ndarray, qtab: np.ndarray | None = None) -> bytes:
    """Full forward path: 8-bit grayscale image -> baseline JPEG (float
    DCT, quantize by ``qtab`` — default all-8 steps). Lossy like any JPEG;
    use encode_jpeg_coeffs for bit-predictable fixtures."""
    if qtab is None:
        qtab = np.full(64, 8, dtype=np.int32)
    h, w = img.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:h, :w] = img
    padded[h:, :w] = img[h - 1 : h, :]  # edge-replicate padding
    padded[:, w:] = padded[:, w - 1 : w]
    coeffs = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            block = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            s = _fdct2(block)
            for i, (row, col) in enumerate(_ZZ):
                coeffs[by, bx, i] = int(np.round(s[row, col] / qtab[i]))
    return encode_jpeg_coeffs(coeffs, np.asarray(qtab, dtype=np.int64), h, w)
