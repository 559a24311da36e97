"""Optional compiled-C DTW hot loops (ctypes, compiled on first use).

The numpy kernels in ``dtw_kernel.py`` vectorize the DP recurrence with a
prefix-scan identity because pure Python is ~1000x too slow — but the scan
costs ~10 numpy passes per DP row and is memory-bandwidth-bound under
32-way executor contention (NOTES.md r3 item 14). When a C compiler is
present (``cc``/``gcc``), this module compiles the NATURAL recurrence
    acc[i][j] = |a_i - b_j| + min(acc[i-1][j], acc[i][j-1], acc[i-1][j-1])
into a tiny shared object and drives it through ctypes: one pass per DP
cell, no reassociation, exactly the op order of the per-pair reference
implementations (``dtw_pair`` / ``_dtw_with_path``) — so distances are
bit-identical to them, strictly *more* faithful than the scan (whose
reassociated floats may pick the other branch of an fp near-tie).

Fallback contract: ANY failure here (no compiler, sandboxed /tmp, load
error) leaves ``available() == False`` and the numpy kernels run unchanged.
Set ``TSKNN_DTW_NO_CC=1`` to force the numpy path (used by tests to pin
numpy/C equivalence). The compiled object is cached in the system temp dir
keyed by a hash of the C source, so Spark's 32 local python workers compile
once and share the artifact (atomic ``os.replace`` publish — concurrent
compiles race benignly).

Semantics provenance: the reference computes per-pair fastdtw/DTW in Python
(Team11-Project.py:339-341, 531-533); this is the same one-irreducible-
kernel boundary (SURVEY.md §2.10 U2), just compiled.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import sys
import tempfile

import numpy as np

__all__ = ["available", "dtw_band_batch", "fastdtw_level"]

_C_SRC = r"""
#include <stdint.h>
#include <stdlib.h>
#include <math.h>

#define LARGE 1e18

/* Multichannel per-timestep cost: dependent DTW's summed |a_c - b_c|,
   accumulated LEFT-TO-RIGHT over channels — for ch < 8 this is the exact
   IEEE op order of np.sum's small-n sequential base case, so the compiled
   path stays bit-identical to the numpy kernels (and to dtw_pair's
   float(np.sum(np.abs(a[i] - b[j])))). Callers route ch >= 8 to numpy
   (np.sum switches to 8-way pairwise accumulation there). */
static inline double cost_mv(const double* ap, const double* bp, int64_t ch) {
    double s = fabs(ap[0] - bp[0]);
    for (int64_t c = 1; c < ch; c++) s += fabs(ap[c] - bp[c]);
    return s;
}

/* Exact (optionally Sakoe-Chiba banded) DTW over a batch of pairs.
   band < 0 means unconstrained. ch = channels per timestep (1 = scalar
   series; rows are (n, ch) C-contiguous). Band geometry matches
   dtw_pair(): center = round((i-1)*(m-1)/max(n-1,1)) + 1 with
   round-half-to-even (Python round -> C rint under the default rounding
   mode). */
void dtw_band_batch(const double* A, const double* B,
                    int64_t bs, int64_t n, int64_t m, int64_t ch,
                    int64_t band, double* out) {
    double* prev = (double*)malloc((size_t)(m + 1) * sizeof(double));
    double* cur = (double*)malloc((size_t)(m + 1) * sizeof(double));
    if (!prev || !cur) { free(prev); free(cur); return; }
    for (int64_t p = 0; p < bs; p++) {
        const double* a = A + p * n * ch;
        const double* b = B + p * m * ch;
        for (int64_t j = 0; j <= m; j++) prev[j] = LARGE;
        prev[0] = 0.0;
        int64_t plo = 0, phi = m;           /* previous row's written range */
        for (int64_t i = 1; i <= n; i++) {
            int64_t lo = 1, hi = m;
            if (band >= 0) {
                double c = (double)(i - 1) * (double)(m - 1)
                           / (double)(n > 1 ? n - 1 : 1);
                int64_t center = (int64_t)rint(c) + 1;
                lo = center - band; if (lo < 1) lo = 1;
                hi = center + band; if (hi > m) hi = m;
            }
            /* stale double-buffer margins: this row reads prev[lo-1..hi];
               sentinel any of those outside the previous row's range */
            for (int64_t j = lo - 1; j < plo; j++) if (j >= 0) prev[j] = LARGE;
            for (int64_t j = phi + 1; j <= hi; j++) prev[j] = LARGE;
            cur[lo - 1] = LARGE;
            if (ch == 1) {
                double ai = a[i - 1];
                for (int64_t j = lo; j <= hi; j++) {
                    double v = prev[j];
                    double h = cur[j - 1];
                    double d = prev[j - 1];
                    double best = v;
                    if (h < best) best = h;
                    if (d < best) best = d;
                    cur[j] = fabs(ai - b[j - 1]) + best;
                }
            } else {
                const double* ap = a + (i - 1) * ch;
                for (int64_t j = lo; j <= hi; j++) {
                    double v = prev[j];
                    double h = cur[j - 1];
                    double d = prev[j - 1];
                    double best = v;
                    if (h < best) best = h;
                    if (d < best) best = d;
                    cur[j] = cost_mv(ap, b + (j - 1) * ch, ch) + best;
                }
            }
            double* t = prev; prev = cur; cur = t;
            plo = lo; phi = hi;
        }
        /* final corner: rows may not have reached column m when the band is
           infeasibly narrow; dtw_pair's geometry always includes it */
        out[p] = prev[m];
    }
    free(prev); free(cur);
}

/* One FastDTW refinement level: variable-window DP + warp-path backtrack
   for a batch of pairs. lo/hi: (bs, n) inclusive 0-based column windows
   (contiguous per row, lows/highs monotone non-decreasing — the FastDTW
   window invariant). Outputs: dist (bs); if need_path, per-row path column
   spans pmin/pmax (bs, n). Predecessor tie order matches _dtw_with_path:
   vertical (i-1,j), then horizontal (i,j-1), then diagonal (i-1,j-1),
   strict < to switch. */
void fastdtw_level(const double* A, const double* B,
                   const int64_t* lo, const int64_t* hi,
                   int64_t bs, int64_t n, int64_t m, int64_t ch,
                   int need_path,
                   double* dist, int64_t* pmin, int64_t* pmax) {
    double* prev = (double*)malloc((size_t)(m + 1) * sizeof(double));
    double* cur = (double*)malloc((size_t)(m + 1) * sizeof(double));
    signed char* path_ch = need_path
        ? (signed char*)malloc((size_t)n * (size_t)m) : NULL;
    if (!prev || !cur || (need_path && !path_ch)) {
        free(prev); free(cur); free(path_ch); return;
    }
    for (int64_t p = 0; p < bs; p++) {
        const double* a = A + p * n * ch;
        const double* b = B + p * m * ch;
        const int64_t* lop = lo + p * n;
        const int64_t* hip = hi + p * n;
        int64_t W = 1;
        for (int64_t i = 0; i < n; i++) {
            int64_t w = hip[i] - lop[i] + 1;
            if (w > W) W = w;
        }
        for (int64_t j = 0; j <= m; j++) prev[j] = LARGE;
        prev[0] = 0.0;
        int64_t plo = 0, phi = m;
        for (int64_t i = 1; i <= n; i++) {
            int64_t l = lop[i - 1] + 1;      /* 1-based columns */
            int64_t h = hip[i - 1] + 1;
            for (int64_t j = l - 1; j < plo; j++) if (j >= 0) prev[j] = LARGE;
            for (int64_t j = phi + 1; j <= h; j++) prev[j] = LARGE;
            cur[l - 1] = LARGE;
            const double* ap = a + (i - 1) * ch;
            double ai = ap[0];
            if (need_path) {
                signed char* chr_ = path_ch + (i - 1) * W - l;
                for (int64_t j = l; j <= h; j++) {
                    double v = prev[j];
                    double hh = cur[j - 1];
                    double d = prev[j - 1];
                    double best = v;
                    signed char sel = 0;
                    if (hh < best) { best = hh; sel = 1; }
                    if (d < best) { best = d; sel = 2; }
                    cur[j] = (ch == 1 ? fabs(ai - b[j - 1])
                                      : cost_mv(ap, b + (j - 1) * ch, ch))
                             + best;
                    chr_[j] = sel;
                }
            } else {
                for (int64_t j = l; j <= h; j++) {
                    double v = prev[j];
                    double hh = cur[j - 1];
                    double d = prev[j - 1];
                    double best = v;
                    if (hh < best) best = hh;
                    if (d < best) best = d;
                    cur[j] = (ch == 1 ? fabs(ai - b[j - 1])
                                      : cost_mv(ap, b + (j - 1) * ch, ch))
                             + best;
                }
            }
            double* t = prev; prev = cur; cur = t;
            plo = l; phi = h;
        }
        dist[p] = prev[m];
        if (need_path) {
            int64_t* pmn = pmin + p * n;
            int64_t* pmx = pmax + p * n;
            for (int64_t q = 0; q < n; q++) { pmn[q] = m - 1; pmx[q] = 0; }
            pmx[n - 1] = m - 1;
            int64_t i = n - 1, j = m - 1;    /* 0-based cells */
            while (i > 0 || j > 0) {
                signed char s = path_ch[i * W + (j - lop[i])];
                if (s == 1) { j--; }
                else if (s == 0) { pmn[i] = j; pmx[i - 1] = j; i--; }
                else { pmn[i] = j; pmx[i - 1] = j - 1; i--; j--; }
            }
            pmn[0] = 0;
        }
    }
    free(prev); free(cur); free(path_ch);
}
"""

_lib = None
_tried = False


def _compile() -> "ctypes.CDLL | None":
    # per-user 0700 cache dir with ownership check — never a predictable
    # name directly in the world-writable temp dir (see edit_c docstring)
    from .edit_c import _private_cache_dir

    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    tag = hashlib.sha256((_C_SRC + sys.version).encode()).hexdigest()[:16]
    so_path = os.path.join(_private_cache_dir(), f"tsknn_dtw_{tag}.so")
    if not os.path.exists(so_path):
        tmpdir = tempfile.mkdtemp(prefix="tsknn_dtw_build_")
        try:
            src = os.path.join(tmpdir, "dtw.c")
            with open(src, "w") as f:
                f.write(_C_SRC)
            out = os.path.join(tmpdir, "dtw.so")
            subprocess.run(
                [cc, "-O3", "-march=native", "-fPIC", "-shared", src, "-o", out, "-lm"],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(out, so_path)  # atomic publish; concurrent racers agree
        finally:
            shutil.rmtree(tmpdir, ignore_errors=True)
    lib = ctypes.CDLL(so_path)
    i64 = ctypes.c_int64
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int64)
    lib.dtw_band_batch.argtypes = [dp, dp, i64, i64, i64, i64, i64, dp]
    lib.dtw_band_batch.restype = None
    lib.fastdtw_level.argtypes = [dp, dp, ip, ip, i64, i64, i64, i64, ctypes.c_int, dp, ip, ip]
    lib.fastdtw_level.restype = None
    return lib


def available() -> bool:
    """True when the compiled path is usable (compiler found, build+load OK,
    not disabled via TSKNN_DTW_NO_CC)."""
    global _lib, _tried
    if os.environ.get("TSKNN_DTW_NO_CC"):
        return False
    if not _tried:
        _tried = True
        try:
            _lib = _compile()
        except Exception:
            _lib = None
    return _lib is not None


def _dptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def dtw_band_batch(A: np.ndarray, B: np.ndarray, band: "int | None") -> np.ndarray:
    """Compiled exact (banded) DTW: (bs, n[, ch]) x (bs, m[, ch]) -> (bs,).
    3D inputs are multichannel (dependent DTW, summed per-channel |a-b|;
    keep ch < 8 for bit-identity with the numpy kernels — see cost_mv).
    Caller guarantees ``available()``; A/B must be C-contiguous float64."""
    bs, n = A.shape[0], A.shape[1]
    m = B.shape[1]
    ch = A.shape[2] if A.ndim == 3 else 1
    out = np.empty(bs, dtype=np.float64)
    _lib.dtw_band_batch(_dptr(A), _dptr(B), bs, n, m, ch, -1 if band is None else band, _dptr(out))
    # infeasible band (narrower than the diagonal slope on unequal
    # lengths): the corner stays at the LARGE sentinel — surface it as inf,
    # matching dtw_pair. Any real distance is astronomically below 1e17.
    out[out >= 1e17] = np.inf
    return out


def fastdtw_level(
    A: np.ndarray,
    B: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    need_path: bool,
):
    """Compiled one-level windowed DP (+ backtrack when need_path):
    returns (dist, pmin, pmax) — pmin/pmax are None when not need_path.
    3D A/B = multichannel (see dtw_band_batch)."""
    bs, n = A.shape[0], A.shape[1]
    m = B.shape[1]
    ch = A.shape[2] if A.ndim == 3 else 1
    dist = np.empty(bs, dtype=np.float64)
    lo = np.ascontiguousarray(lo, dtype=np.int64)
    hi = np.ascontiguousarray(hi, dtype=np.int64)
    if need_path:
        pmin = np.empty((bs, n), dtype=np.int64)
        pmax = np.empty((bs, n), dtype=np.int64)
        pmin_p, pmax_p = _iptr(pmin), _iptr(pmax)
    else:
        pmin = pmax = None
        null = ctypes.POINTER(ctypes.c_int64)()
        pmin_p = pmax_p = null
    _lib.fastdtw_level(
        _dptr(A), _dptr(B), _iptr(lo), _iptr(hi), bs, n, m, ch,
        1 if need_path else 0, _dptr(dist), pmin_p, pmax_p,
    )
    return dist, pmin, pmax
