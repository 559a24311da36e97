"""Minimal pure-stdlib baseline JPEG codec (struct + numpy only — no
imaging libs). Completes the no-dependency decode floor alongside the PNG
(functions/png.py), GIF (functions/gif.py) and WAV (functions/wav.py)
codecs: the multimodal operators decode REAL JPEG bytes in containers
without PIL/cv2.

Scope (deliberate):

- decode: baseline sequential DCT (SOF0) AND progressive DCT (SOF2 —
  T.81 Annex G: spectral selection + successive approximation, DC
  first/refinement scans, per-component AC band scans with EOB runs and
  correction bits; real crawled corpora are heavily progressive), 8-bit
  precision, 1 or 3 components with ARBITRARY sampling factors as long
  as luma is the full-resolution component (grayscale, 4:4:4, 4:2:2,
  4:2:0 — the real-web layouts; the general interleaved-MCU walk of
  T.81 A.2.3), arbitrary DQT/DHT tables read from the stream, restart
  markers (DRI), FF00 byte-stuffing. Multi-component scans return the Y
  (luma) plane — the feature extractors want luminance, baseline JPEG's
  Y IS the ITU-601 luma, and dropping chroma means NO upsampling stage
  is needed even for subsampled files. Output: uint8 (H, W).
- encode: 8-bit grayscale fixtures. Three entry points:
  ``encode_jpeg_gray`` runs the full forward path (float DCT + quantize);
  ``encode_jpeg_coeffs`` writes CHOSEN quantized coefficient blocks
  directly — coefficient-exact fixtures whose decode is closed-form
  predictable (a DC-only block with quant step 8 decodes to the flat
  value DC + 128 exactly), which is what lets a SQL oracle hash-check the
  real entropy-decode + IDCT path (q105, the q94-PNG technique);
  ``encode_jpeg_coeffs_progressive`` emits the same coefficient contract
  as an SOF2 scan script (DC successive approximation + refinement, AC
  spectral bands with EOB runs + correction-bit refinement) — the q112
  fixtures and the progressive leg of the fuzz sweep.
  The encoder emits its own canonical Huffman tables in DHT (all DC
  categories at 4 bits, all 162 AC run/size symbols at 8 bits — legal,
  just not size-optimal), so no spec-annex table data is embedded; the
  decoder reads whatever tables the stream declares.

Spec: the public JPEG standard (ITU-T T.81 / ISO 10918-1) baseline
process. Everything after entropy decode is deterministic arithmetic; the
only float stage is the IDCT. DC-only blocks with quant step 8 round to
exact integers (error ~2^-50, never near a boundary) — that is what the
q105 oracle fixtures use. General coefficients whose TRUE pixel value is
an exact half-integer (e.g. dequantized DC 492 -> 61.5) may round either
way depending on IDCT float noise; T.81's accuracy annex tolerates this
and the fuzz sweep (tools/fuzz_sweep.py jpeg) only accepts +-1 at such
verified boundaries.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_jpeg_gray",
    "encode_jpeg_gray",
    "encode_jpeg_coeffs",
    "encode_jpeg_coeffs_420",
    "encode_jpeg_coeffs_progressive",
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
        if self.pos + 1 >= len(d):
            raise ValueError("truncated JPEG: entropy data ends mid-scan")
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
        if self.pos + 1 >= len(d):
            raise ValueError("truncated JPEG: entropy data ends mid-scan")
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
    """Baseline or progressive JPEG -> uint8 (H, W) luma plane. See module
    docstring."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (H, W, comps: [(cid, tq)])
    restart = 0
    progressive = False
    coefs: dict[int, np.ndarray] = {}  # progressive: cid -> (bh, bw, 64) zigzag
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG: marker segment header cut off")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        if pos + seglen > len(data):
            raise ValueError("truncated JPEG: marker segment body cut off")
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 (sequential) / SOF2 (prog)
            prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], struct.unpack(">H", seg[3:5])[0], seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i], seg[7 + 3 * i], seg[8 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            if (comps[0][1], comps[0][2]) != (hmax, vmax):
                raise NotImplementedError(
                    "luma must be the full-resolution component "
                    "(subsampled-luma files: use decoder='pil')"
                )
            if hmax > 4 or vmax > 4:
                raise ValueError("sampling factors out of spec range")
            if nc == 1:
                # sampling factors are only meaningful RELATIVE to other
                # components; a single-component frame is always walked as
                # its own full-plane block raster (T.81 A.2.2)
                comps = [(comps[0][0], 1, 1, comps[0][3])]
                hmax = vmax = 1
            frame = (h, w, comps, hmax, vmax)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1) and progressive (SOF2) DCT"
            )
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
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = _progressive_scan(
                    data, pos + seglen, frame, htabs, restart, coefs,
                    [cs for i in range(ns) for cs in (seg[1 + 2 * i],)],
                    scan, ss, se, ahal >> 4, ahal & 15,
                )
                continue
            h, w, comps, hmax, vmax = frame
            if ns < len(comps):
                # T.81 A.2.2 non-interleaved multi-scan files need plane
                # state across scans — out of scope with a clear message
                raise NotImplementedError(
                    "non-interleaved (multi-scan) baseline not supported; "
                    "use decoder='pil'"
                )
            if len(comps) == 1:
                # a single-component scan is NON-interleaved by definition
                # (T.81 A.2.2): one block per MCU over the full-plane
                # raster — declared sampling factors only matter relative
                # to other components, so a grayscale SOF declaring 2x2
                # must NOT be walked as a 2x2-interleaved grid
                cid0, _, _, tq0 = comps[0]
                comps = [(cid0, 1, 1, tq0)]
                hmax = vmax = 1
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            planes = {
                cid: np.zeros((mcuy * vi * 8, mcux * hi * 8))
                for cid, hi, vi, _ in comps
            }
            r = _BitReader(data, pos + seglen)
            pred = {cid: 0 for cid, _, _, _ in comps}
            mcu = 0

            def read_block(tdc: int, tac: int, cid: int) -> np.ndarray:
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
                return zz

            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and mcu and mcu % restart == 0:
                        r.align()
                        m = r.at_marker()
                        if m is not None and 0xD0 <= m <= 0xD7:
                            r.pos += 2
                            pred = {cid: 0 for cid, _, _, _ in comps}
                    # interleaved MCU: each component contributes its
                    # hi x vi block grid, row-major (T.81 A.2.3)
                    for cid, hi, vi, tq in comps:
                        tdc, tac = scan[cid]
                        q = qtabs[tq]
                        for v in range(vi):
                            for hh in range(hi):
                                zz = read_block(tdc, tac, cid)
                                block = np.zeros((8, 8))
                                for i, (row, col) in enumerate(_ZZ):
                                    block[row, col] = zz[i] * q[i]
                                px = _idct2(block) + 128.0
                                py0 = (my * vi + v) * 8
                                px0 = (mx * hi + hh) * 8
                                planes[cid][py0 : py0 + 8, px0 : px0 + 8] = px
                    mcu += 1
            y = planes[comps[0][0]][:h, :w]
            return np.clip(np.round(y), 0, 255).astype(np.uint8)
        pos += seglen
    if progressive and frame is not None and coefs:
        return _reconstruct_progressive(frame, qtabs, coefs)
    raise ValueError("no scan data found")


def _comp_grids(frame):
    """Per-component block-grid geometry: interleaved (MCU-padded) array
    dims and the non-interleaved (true plane) dims T.81 A.2.2 scans walk."""
    h, w, comps, hmax, vmax = frame
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    out = {}
    for cid, hi, vi, tq in comps:
        cw = (-(-w * hi // hmax) + 7) // 8  # ceil(ceil(w*hi/hmax)/8)
        ch = (-(-h * vi // vmax) + 7) // 8
        out[cid] = (mcuy * vi, mcux * hi, ch, cw)
    return mcux, mcuy, out


def _progressive_scan(
    data: bytes,
    pos: int,
    frame,
    htabs,
    restart: int,
    coefs: dict[int, np.ndarray],
    scan_cids: list[int],
    scan_tabs: dict[int, tuple[int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """One progressive scan (T.81 Annex G.2): updates ``coefs`` in place,
    returns the stream position of the next marker. DC scans (ss == 0) may
    interleave several components; AC scans carry exactly one. First scans
    (ah == 0) entropy-decode new coefficient bits at magnitude 2^al;
    refinement scans (ah > 0) append one correction bit per coefficient."""
    h, w, comps, hmax, vmax = frame
    mcux, mcuy, grids = _comp_grids(frame)
    by_cid = {cid: (hi, vi) for cid, hi, vi, _ in comps}
    for cid in scan_cids:
        if cid not in by_cid:
            raise ValueError(f"scan references unknown component {cid}")
        if cid not in coefs:
            bh, bw, _, _ = grids[cid]
            coefs[cid] = np.zeros((bh, bw, 64), dtype=np.int32)
    r = _BitReader(data, pos)
    p1, m1 = 1 << al, -1 << al

    def expect_rst(pred, state):
        r.align()
        m = r.at_marker()
        if m is not None and 0xD0 <= m <= 0xD7:
            r.pos += 2
            for k in pred:
                pred[k] = 0
            state["eobrun"] = 0

    state = {"eobrun": 0}
    pred = {cid: 0 for cid in scan_cids}
    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC scan must have Se == 0")

        def dc_block(cid: int, by: int, bx: int) -> None:
            c = coefs[cid]
            if ah == 0:
                t = _huff_decode(r, htabs[(0, scan_tabs[cid][0])])
                diff = _extend(r.receive(t), t)
                pred[cid] += diff
                c[by, bx, 0] = pred[cid] << al
            else:
                if r.read_bit():
                    c[by, bx, 0] |= p1

        mcu = 0
        if len(scan_cids) > 1:  # interleaved MCU walk over the scan comps
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and mcu and mcu % restart == 0:
                        expect_rst(pred, state)
                    for cid in scan_cids:
                        hi, vi = by_cid[cid]
                        for v in range(vi):
                            for hh in range(hi):
                                dc_block(cid, my * vi + v, mx * hi + hh)
                    mcu += 1
        else:  # single-component: non-interleaved full-plane raster
            cid = scan_cids[0]
            _, _, ch, cw = grids[cid]
            for by in range(ch):
                for bx in range(cw):
                    if restart and mcu and mcu % restart == 0:
                        expect_rst(pred, state)
                    dc_block(cid, by, bx)
                    mcu += 1
    else:  # AC scan: exactly one component (T.81 G.1.1.1)
        if len(scan_cids) != 1:
            raise ValueError("progressive AC scan must carry one component")
        cid = scan_cids[0]
        c = coefs[cid]
        actab = htabs[(1, scan_tabs[cid][1])]
        _, _, ch, cw = grids[cid]

        def ac_first(zz: np.ndarray) -> None:
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            k = ss
            while k <= se:
                rs = _huff_decode(r, actab)
                rr, s = rs >> 4, rs & 15
                if s == 0:
                    if rr != 15:  # EOBn: run of 2^rr + extra empty blocks
                        state["eobrun"] = (1 << rr) - 1
                        if rr:
                            state["eobrun"] += r.receive(rr)
                        break
                    k += 16  # ZRL
                    continue
                k += rr
                if k > se:
                    raise ValueError("AC index overflow")
                zz[k] = _extend(r.receive(s), s) << al
                k += 1

        def ac_refine(zz: np.ndarray) -> None:
            k = ss
            if state["eobrun"] == 0:
                while k <= se:
                    rs = _huff_decode(r, actab)
                    rr, s = rs >> 4, rs & 15
                    val = 0
                    if s == 0:
                        if rr != 15:
                            state["eobrun"] = (1 << rr)
                            if rr:
                                state["eobrun"] += r.receive(rr)
                            break
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError("refinement scan size must be 1")
                        val = p1 if r.read_bit() else m1
                    while k <= se:
                        if zz[k] != 0:
                            if r.read_bit() and (zz[k] & p1) == 0:
                                zz[k] += p1 if zz[k] > 0 else m1
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if state["eobrun"] > 0:
                while k <= se:
                    if zz[k] != 0:
                        if r.read_bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] > 0 else m1
                    k += 1
                state["eobrun"] -= 1

        mcu = 0
        for by in range(ch):
            for bx in range(cw):
                if restart and mcu and mcu % restart == 0:
                    expect_rst(pred, state)
                if ah == 0:
                    ac_first(c[by, bx])
                else:
                    ac_refine(c[by, bx])
                mcu += 1
    # advance to the next marker (consume any pad bits / trailing stuffing)
    p = r.pos
    while p + 1 < len(data):
        if data[p] == 0xFF and data[p + 1] != 0x00:
            return p
        p += 1
    raise ValueError("truncated JPEG: no marker after scan")


def _reconstruct_progressive(frame, qtabs, coefs) -> np.ndarray:
    """Dequantize + IDCT the accumulated progressive coefficients; return
    the luma plane (same output contract as the baseline path)."""
    h, w, comps, hmax, vmax = frame
    cid0, hi0, vi0, tq0 = comps[0]
    if cid0 not in coefs:
        raise ValueError("progressive stream had no scan for the luma plane")
    q = qtabs[tq0]
    c = coefs[cid0]
    bh, bw = c.shape[0], c.shape[1]
    plane = np.zeros((bh * 8, bw * 8))
    for by in range(bh):
        for bx in range(bw):
            block = np.zeros((8, 8))
            zz = c[by, bx]
            for i, (row, col) in enumerate(_ZZ):
                block[row, col] = int(zz[i]) * int(q[i])
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct2(block) + 128.0
    # luma is full-resolution (enforced at SOF), so its plane is 1:1
    y = plane[:h, :w]
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


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
# progressive scans additionally need the EOBn run-length symbols
# (r << 4 | 0 for r = 1..14, T.81 G.1.2.2) — 176 symbols still fit one
# 8-bit-codes-only canonical table (176/256 <= 1)
_AC_VALS_PROG = [0x00, 0xF0] + [r << 4 for r in range(1, 15)] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS_PROG = [0] * 7 + [len(_AC_VALS_PROG)] + [0] * 8


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


def encode_jpeg_coeffs_progressive(
    coeffs: np.ndarray,
    qtab: np.ndarray,
    h: int,
    w: int,
    *,
    al_dc: int = 1,
    ac_bands: tuple[tuple[int, int], ...] = ((1, 5), (6, 63)),
    al_ac: int = 1,
) -> bytes:
    """Progressive JPEG (SOF2) from CHOSEN quantized coefficients — the
    fixture twin of ``encode_jpeg_coeffs`` for the progressive decode path
    (T.81 Annex G). Same coefficient contract: coeffs is (bh, bw, 64) for
    grayscale or (bh, bw, nc, 64) for a 4:4:4 multi-component frame,
    ZIGZAG order; decode of the emitted bytes is exactly coeffs * qtab ->
    de-zigzag -> IDCT -> +128 -> round/clamp of component 1.

    Scan script (covers every Annex-G decode branch):
    - DC first scan at Al=``al_dc`` (interleaved when nc > 1), then one DC
      refinement scan per bit down to 0;
    - per component, one AC first scan per ``ac_bands`` spectral band at
      Al=``al_ac`` (EOB runs span empty blocks), then refinement scans per
      bit down to 0 (correction bits, newly-significant coefficients, ZRL
      in refinement, EOB-run folded correction bits).
    """
    if coeffs.ndim == 3:
        coeffs = coeffs[:, :, None, :]
    bh, bw, nc = coeffs.shape[0], coeffs.shape[1], coeffs.shape[2]
    if (bh * 8 < h) or (bw * 8 < w):
        raise ValueError("coefficient grid smaller than image")
    for ss, se in ac_bands:
        if not (1 <= ss <= se <= 63):
            raise ValueError(f"bad spectral band ({ss}, {se})")
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS_PROG, _AC_VALS_PROG)
    comp_ids = list(range(1, nc + 1))

    def sos(cids: list[int], ss: int, se: int, ah: int, al: int, entropy: bytes) -> bytes:
        return (
            _seg(
                0xDA,
                bytes([len(cids)])
                + b"".join(bytes([cid, 0x00]) for cid in cids)
                + bytes([ss, se, (ah << 4) | al]),
            )
            + entropy
        )

    scans: list[bytes] = []

    # --- DC first scan (interleaved over all components when nc > 1) ------
    wtr = _BitWriter()
    pred = [0] * nc
    for by in range(bh):
        for bx in range(bw):
            for ci in range(nc):
                v = int(coeffs[by, bx, ci, 0]) >> al_dc  # arithmetic shift
                diff = v - pred[ci]
                pred[ci] = v
                t = _category(diff)
                code, ln = dc_codes[t]
                wtr.write(code, ln)
                if t:
                    wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    scans.append(sos(comp_ids, 0, 0, 0, al_dc, wtr.flush()))

    # --- DC refinement scans ----------------------------------------------
    for al in range(al_dc - 1, -1, -1):
        wtr = _BitWriter()
        for by in range(bh):
            for bx in range(bw):
                for ci in range(nc):
                    wtr.write((int(coeffs[by, bx, ci, 0]) >> al) & 1, 1)
        scans.append(sos(comp_ids, 0, 0, al + 1, al, wtr.flush()))

    # --- AC scans: per component, per band ---------------------------------
    def pt(v: int, al: int) -> int:
        """AC point transform: magnitude shift toward zero (T.81 G.1.2.2)."""
        return -((-v) >> al) if v < 0 else v >> al

    for ci in range(nc):
        cid = comp_ids[ci]
        for ss, se in ac_bands:
            # first scan at al_ac
            wtr = _BitWriter()
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun > 0:
                    nbits = eobrun.bit_length() - 1
                    code, ln = ac_codes[nbits << 4]
                    wtr.write(code, ln)
                    if nbits:
                        wtr.write(eobrun - (1 << nbits), nbits)
                    eobrun = 0

            for by in range(bh):
                for bx in range(bw):
                    zz = coeffs[by, bx, ci]
                    run = 0
                    wrote = False
                    for k in range(ss, se + 1):
                        v = pt(int(zz[k]), al_ac)
                        if v == 0:
                            run += 1
                            continue
                        flush_eob()
                        while run > 15:
                            code, ln = ac_codes[0xF0]
                            wtr.write(code, ln)
                            run -= 16
                        s = _category(v)
                        code, ln = ac_codes[(run << 4) | s]
                        wtr.write(code, ln)
                        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                        wrote = True
                    if run > 0 or not wrote:
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob()
            flush_eob()
            scans.append(sos([cid], ss, se, 0, al_ac, wtr.flush()))

        for al in range(al_ac - 1, -1, -1):
            for ss, se in ac_bands:
                # refinement scan at al (libjpeg jcphuff encode_mcu_AC_refine
                # structure: correction bits buffer across EOB-run blocks)
                wtr = _BitWriter()
                eobrun = 0
                pending: list[int] = []  # correction bits folded in eobrun

                def flush_eob_r():
                    nonlocal eobrun
                    if eobrun > 0:
                        nbits = eobrun.bit_length() - 1
                        code, ln = ac_codes[nbits << 4]
                        wtr.write(code, ln)
                        if nbits:
                            wtr.write(eobrun - (1 << nbits), nbits)
                        eobrun = 0
                    for b in pending:
                        wtr.write(b, 1)
                    pending.clear()

                for by in range(bh):
                    for bx in range(bw):
                        zz = coeffs[by, bx, ci]
                        absv = [abs(int(zz[k])) >> al for k in range(64)]
                        eob = 0  # index after the last newly-significant coef
                        for k in range(ss, se + 1):
                            if absv[k] == 1:
                                eob = k
                        run = 0
                        cur: list[int] = []  # this block's buffered bits
                        for k in range(ss, se + 1):
                            t = absv[k]
                            if t == 0:
                                run += 1
                                continue
                            # ZRLs that can't fold into an EOB run must go
                            # out BEFORE this coefficient's bits — checked at
                            # EVERY nonzero (correction bits buffered so far
                            # are consumed by the decoder's ZRL advance)
                            while run > 15 and k <= eob:
                                flush_eob_r()
                                code, ln = ac_codes[0xF0]
                                wtr.write(code, ln)
                                run -= 16
                                for b in cur:
                                    wtr.write(b, 1)
                                cur = []
                            if t > 1:
                                cur.append(t & 1)
                                continue
                            # newly significant at this bit level
                            flush_eob_r()
                            code, ln = ac_codes[(run << 4) | 1]
                            wtr.write(code, ln)
                            wtr.write(1 if int(zz[k]) > 0 else 0, 1)
                            for b in cur:
                                wtr.write(b, 1)
                            cur = []
                            run = 0
                        if run > 0 or cur:
                            eobrun += 1
                            pending.extend(cur)
                            if eobrun == 0x7FFF:
                                flush_eob_r()
                flush_eob_r()
                scans.append(sos([cid], ss, se, al + 1, al, wtr.flush()))

    dqt = _seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qtab))
    sof = _seg(
        0xC2,
        struct.pack(">BHHB", 8, h, w, nc)
        + b"".join(bytes([cid, 0x11, 0]) for cid in comp_ids),
    )
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS_PROG) + bytes(_AC_VALS_PROG),
    )
    return b"\xff\xd8" + dqt + sof + dht + b"".join(scans) + b"\xff\xd9"


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


def encode_jpeg_coeffs_420(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    qtab: np.ndarray,
    h: int,
    w: int,
) -> bytes:
    """4:2:0 baseline JPEG from chosen quantized coefficients (the
    real-web sampling layout): Y at 2x2 sampling — shape (by, bx, 64)
    with by, bx even — chroma at (by//2, bx//2, 64); interleaved MCUs of
    4 Y + 1 Cb + 1 Cr blocks (T.81 A.2.3). Shares tables with the 4:4:4
    encoder; exists to prove the decoder's general-sampling MCU walk."""
    by, bx = y.shape[0], y.shape[1]
    if by % 2 or bx % 2:
        raise ValueError("Y block grid must be even-sized for 4:2:0")
    if cb.shape[:2] != (by // 2, bx // 2) or cr.shape[:2] != (by // 2, bx // 2):
        raise ValueError("chroma grids must be half the Y grid")
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    wtr = _BitWriter()
    pred = [0, 0, 0]

    def put_block(zz: np.ndarray, ci: int) -> None:
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

    for my in range(by // 2):
        for mx in range(bx // 2):
            for v in range(2):
                for hh in range(2):
                    put_block(y[2 * my + v, 2 * mx + hh], 0)
            put_block(cb[my, mx], 1)
            put_block(cr[my, mx], 2)
    entropy = wtr.flush()

    dqt = _seg(0xDB, bytes([0x00]) + bytes(int(q) for q in qtab))
    sof = _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x22, 0])
        + bytes([2, 0x11, 0])
        + bytes([3, 0x11, 0]),
    )
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = _seg(
        0xDA,
        bytes([3]) + bytes([1, 0x00]) + bytes([2, 0x00]) + bytes([3, 0x00])
        + bytes([0, 63, 0]),
    )
    return b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"
