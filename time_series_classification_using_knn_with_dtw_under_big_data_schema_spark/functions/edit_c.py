"""Optional compiled-C edit-distance hot loops (r7; ctypes, compiled on
first use — the ``dtw_c`` pattern applied to LCSS/EDR/ERP/TWED/MSM).

The numpy kernels in ``edit_distance.py`` vectorize the full-table DPs
anti-diagonally, but measure only ~8-30 Mcells/s under batch dispatch
overhead (n+m numpy passes per batch, each over a strided diagonal
slice). The natural row-by-row C recurrence runs the SAME per-cell
arithmetic — one add tree + an exact min per cell, the op DAG the
expression twins and DuckDB oracles replay — at memory speed, with O(m)
rolling rows instead of the (P, n+1, m+1) cube (so no
``_DP_BYTES_BUDGET`` splitting either).

r8 (VERDICT r7 #3): each metric's DP is a STRIDED static core
(``X_one(a, b, n, m, stride_a, stride_b, ...)``), and two entry points
share it — the flat ``X_batch_c`` (stride 1, one series per row) and the
multichannel ``X_mc_batch_c`` over (P, L, C) batches (channel c of pair p
starts at ``A + p*L*C + c`` with stride C). The mc entry folds channels
in ascending order from 0.0 INSIDE the C call — one crossing per pair
batch instead of a Python loop re-slicing (P, L) copies per channel —
and the fold order is exactly ``_channel_sum``'s, so flat-sum == mc
bitwise (test-pinned; q188/q189 hashes unchanged).

Bit-identity argument (the same one the anti-diagonal form relies on):
every cell value is a function of its three predecessors through exact
IEEE ops (fabs/add/min on doubles, or pure integers for LCSS/EDR), so
evaluation ORDER cannot change any cell. No cost is ever -0.0 (fabs and
sums of non-negatives), so min's operand-order freedom cannot leak a
sign bit, and the channel fold's 0.0 + d0 == d0 exactly. Compiled with
``-ffp-contract=off`` so the compiler cannot fuse the TWED ``x + nu2*z``
shapes into FMAs the numpy side doesn't use.

Fallback contract: ANY failure (no compiler, sandboxed /tmp, load error)
leaves ``available() == False`` and the numpy kernels run unchanged. Set
``TSKNN_EDIT_NO_CC=1`` to force the numpy path (tests pin numpy/C
equality through it). The shared object is cached under a per-user 0700
directory keyed by a hash of the C source (atomic ``os.replace`` publish
— Spark's 32 local python workers compile once; the private dir closes
the pre-planted-.so hazard of a predictable world-writable temp path).
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

__all__ = [
    "available",
    "lcss_batch_c",
    "edr_batch_c",
    "erp_batch_c",
    "twed_batch_c",
    "msm_batch_c",
    "lcss_mc_batch_c",
    "edr_mc_batch_c",
    "erp_mc_batch_c",
    "twed_mc_batch_c",
    "msm_mc_batch_c",
]

_C_SRC = r"""
#include <stdint.h>
#include <stdlib.h>
#include <math.h>

static inline double min3(double a, double b, double c) {
    double best = a;
    if (b < best) best = b;
    if (c < best) best = c;
    return best;
}

/* Strided DP cores: series a/b are read at a[(i-1)*sa] / b[(j-1)*sb], so
   one body serves both the flat batch (stride 1) and a channel slice of a
   (P, L, C) multichannel batch (stride C). prev/cur are caller-allocated
   (m+1) scratch rows — allocation stays out of the per-pair loop. */

/* LCSS distance: integer match-count DP, result = 1 - lcs/min(n,m).
   delta < 0 means no temporal window. */
static double lcss_one(const double* a, const double* b,
                       int64_t n, int64_t m, int64_t sa, int64_t sb,
                       double eps, int64_t delta,
                       int32_t* prev, int32_t* cur) {
    for (int64_t j = 0; j <= m; j++) prev[j] = 0;
    for (int64_t i = 1; i <= n; i++) {
        cur[0] = 0;
        double ai = a[(i - 1) * sa];
        for (int64_t j = 1; j <= m; j++) {
            int match = fabs(ai - b[(j - 1) * sb]) <= eps;
            if (delta >= 0 && llabs(i - j) > delta) match = 0;
            if (match) cur[j] = prev[j - 1] + 1;
            else {
                int32_t up = prev[j], left = cur[j - 1];
                cur[j] = up > left ? up : left;
            }
        }
        int32_t* t = prev; prev = cur; cur = t;
    }
    int64_t mn = n < m ? n : m;
    return 1.0 - (double)prev[m] / (double)mn;
}

int lcss_batch_c(const double* A, const double* B,
                 int64_t bs, int64_t n, int64_t m,
                 double eps, int64_t delta, double* out) {
    int32_t* prev = (int32_t*)calloc((size_t)(m + 1), sizeof(int32_t));
    int32_t* cur = (int32_t*)calloc((size_t)(m + 1), sizeof(int32_t));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    for (int64_t p = 0; p < bs; p++)
        out[p] = lcss_one(A + p * n, B + p * m, n, m, 1, 1, eps, delta, prev, cur);
    free(prev); free(cur);
    return 0;
}

int lcss_mc_batch_c(const double* A, const double* B,
                    int64_t bs, int64_t n, int64_t m, int64_t nch,
                    double eps, int64_t delta, double* out) {
    int32_t* prev = (int32_t*)calloc((size_t)(m + 1), sizeof(int32_t));
    int32_t* cur = (int32_t*)calloc((size_t)(m + 1), sizeof(int32_t));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    for (int64_t p = 0; p < bs; p++) {
        const double* ap = A + p * n * nch;
        const double* bp = B + p * m * nch;
        double acc = 0.0;
        for (int64_t c = 0; c < nch; c++)
            acc += lcss_one(ap + c, bp + c, n, m, nch, nch, eps, delta, prev, cur);
        out[p] = acc;
    }
    free(prev); free(cur);
    return 0;
}

/* EDR distance: integer edit-count DP, result = edits/max(n,m). */
static double edr_one(const double* a, const double* b,
                      int64_t n, int64_t m, int64_t sa, int64_t sb,
                      double eps, int32_t* prev, int32_t* cur) {
    for (int64_t j = 0; j <= m; j++) prev[j] = (int32_t)j;
    for (int64_t i = 1; i <= n; i++) {
        cur[0] = (int32_t)i;
        double ai = a[(i - 1) * sa];
        for (int64_t j = 1; j <= m; j++) {
            int32_t sub = fabs(ai - b[(j - 1) * sb]) <= eps ? 0 : 1;
            int32_t best = prev[j - 1] + sub;
            int32_t v = prev[j] + 1;
            int32_t h = cur[j - 1] + 1;
            if (v < best) best = v;
            if (h < best) best = h;
            cur[j] = best;
        }
        int32_t* t = prev; prev = cur; cur = t;
    }
    int64_t mx = n > m ? n : m;
    return (double)prev[m] / (double)mx;
}

int edr_batch_c(const double* A, const double* B,
                int64_t bs, int64_t n, int64_t m,
                double eps, double* out) {
    int32_t* prev = (int32_t*)calloc((size_t)(m + 1), sizeof(int32_t));
    int32_t* cur = (int32_t*)calloc((size_t)(m + 1), sizeof(int32_t));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    for (int64_t p = 0; p < bs; p++)
        out[p] = edr_one(A + p * n, B + p * m, n, m, 1, 1, eps, prev, cur);
    free(prev); free(cur);
    return 0;
}

int edr_mc_batch_c(const double* A, const double* B,
                   int64_t bs, int64_t n, int64_t m, int64_t nch,
                   double eps, double* out) {
    int32_t* prev = (int32_t*)calloc((size_t)(m + 1), sizeof(int32_t));
    int32_t* cur = (int32_t*)calloc((size_t)(m + 1), sizeof(int32_t));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    for (int64_t p = 0; p < bs; p++) {
        const double* ap = A + p * n * nch;
        const double* bp = B + p * m * nch;
        double acc = 0.0;
        for (int64_t c = 0; c < nch; c++)
            acc += edr_one(ap + c, bp + c, n, m, nch, nch, eps, prev, cur);
        out[p] = acc;
    }
    free(prev); free(cur);
    return 0;
}

/* ERP distance: float DP with |x - g| gap charges and cumsum borders.
   The border column accumulates as a running scalar — the same addition
   sequence as the numpy core's cumsum. */
static double erp_one(const double* a, const double* b,
                      int64_t n, int64_t m, int64_t sa, int64_t sb,
                      double g, double* prev, double* cur) {
    prev[0] = 0.0;
    for (int64_t j = 1; j <= m; j++) prev[j] = prev[j - 1] + fabs(g - b[(j - 1) * sb]);
    double cola = 0.0;
    for (int64_t i = 1; i <= n; i++) {
        double ai = a[(i - 1) * sa];
        double da = fabs(ai - g);
        cola = cola + da;
        cur[0] = cola;
        for (int64_t j = 1; j <= m; j++) {
            cur[j] = min3(prev[j - 1] + fabs(ai - b[(j - 1) * sb]),
                          prev[j] + da,
                          cur[j - 1] + fabs(g - b[(j - 1) * sb]));
        }
        double* t = prev; prev = cur; cur = t;
    }
    return prev[m];
}

int erp_batch_c(const double* A, const double* B,
                int64_t bs, int64_t n, int64_t m,
                double g, double* out) {
    double* prev = (double*)malloc((size_t)(m + 1) * sizeof(double));
    double* cur = (double*)malloc((size_t)(m + 1) * sizeof(double));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    for (int64_t p = 0; p < bs; p++)
        out[p] = erp_one(A + p * n, B + p * m, n, m, 1, 1, g, prev, cur);
    free(prev); free(cur);
    return 0;
}

int erp_mc_batch_c(const double* A, const double* B,
                   int64_t bs, int64_t n, int64_t m, int64_t nch,
                   double g, double* out) {
    double* prev = (double*)malloc((size_t)(m + 1) * sizeof(double));
    double* cur = (double*)malloc((size_t)(m + 1) * sizeof(double));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    for (int64_t p = 0; p < bs; p++) {
        const double* ap = A + p * n * nch;
        const double* bp = B + p * m * nch;
        double acc = 0.0;
        for (int64_t c = 0; c < nch; c++)
            acc += erp_one(ap + c, bp + c, n, m, nch, nch, g, prev, cur);
        out[p] = acc;
    }
    free(prev); free(cur);
    return 0;
}

/* TWED: index timestamps, a_0 = b_0 = 0 padding, +inf borders.
   Per-cell add trees mirror edit_distance._twed_batch_core exactly. */
static double twed_one(const double* a, const double* b,
                       int64_t n, int64_t m, int64_t sa, int64_t sb,
                       double nu2, double gap, double* prev, double* cur) {
    for (int64_t j = 0; j <= m; j++) prev[j] = INFINITY;
    prev[0] = 0.0;
    for (int64_t i = 1; i <= n; i++) {
        cur[0] = INFINITY;
        double ai = a[(i - 1) * sa];
        double ap = i == 1 ? 0.0 : a[(i - 2) * sa];
        double del_a = fabs(ai - ap) + gap;
        for (int64_t j = 1; j <= m; j++) {
            double bj = b[(j - 1) * sb];
            double bp = j == 1 ? 0.0 : b[(j - 2) * sb];
            double pen = nu2 * fabs((double)(i - j));
            double d_match = (fabs(ai - bj) + fabs(ap - bp)) + pen;
            double del_b = fabs(bj - bp) + gap;
            cur[j] = min3(prev[j - 1] + d_match,
                          prev[j] + del_a,
                          cur[j - 1] + del_b);
        }
        double* t = prev; prev = cur; cur = t;
    }
    return prev[m];
}

int twed_batch_c(const double* A, const double* B,
                 int64_t bs, int64_t n, int64_t m,
                 double nu, double lam, double* out) {
    double* prev = (double*)malloc((size_t)(m + 1) * sizeof(double));
    double* cur = (double*)malloc((size_t)(m + 1) * sizeof(double));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    double nu2 = 2.0 * nu;
    double gap = nu + lam;
    for (int64_t p = 0; p < bs; p++)
        out[p] = twed_one(A + p * n, B + p * m, n, m, 1, 1, nu2, gap, prev, cur);
    free(prev); free(cur);
    return 0;
}

int twed_mc_batch_c(const double* A, const double* B,
                    int64_t bs, int64_t n, int64_t m, int64_t nch,
                    double nu, double lam, double* out) {
    double* prev = (double*)malloc((size_t)(m + 1) * sizeof(double));
    double* cur = (double*)malloc((size_t)(m + 1) * sizeof(double));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    double nu2 = 2.0 * nu;
    double gap = nu + lam;
    for (int64_t p = 0; p < bs; p++) {
        const double* ap = A + p * n * nch;
        const double* bp = B + p * m * nch;
        double acc = 0.0;
        for (int64_t c = 0; c < nch; c++)
            acc += twed_one(ap + c, bp + c, n, m, nch, nch, nu2, gap, prev, cur);
        out[p] = acc;
    }
    free(prev); free(cur);
    return 0;
}

/* MSM: sequential first row/column, split-merge cost interior. */
static inline double msm_cost(double x, double y, double z, double c) {
    if ((y <= x && x <= z) || (y >= x && x >= z)) return c;
    double d1 = fabs(x - y), d2 = fabs(x - z);
    return c + (d1 < d2 ? d1 : d2);
}

static double msm_one(const double* a, const double* b,
                      int64_t n, int64_t m, int64_t sa, int64_t sb,
                      double c, double* prev, double* cur) {
    /* row i=1: dp[1][1] = |a0-b0|; dp[1][j] = dp[1][j-1] + cost(b_j, b_{j-1}, a0) */
    prev[1] = fabs(a[0] - b[0]);
    for (int64_t j = 2; j <= m; j++)
        prev[j] = prev[j - 1] + msm_cost(b[(j - 1) * sb], b[(j - 2) * sb], a[0], c);
    for (int64_t i = 2; i <= n; i++) {
        cur[1] = prev[1] + msm_cost(a[(i - 1) * sa], a[(i - 2) * sa], b[0], c);
        double ai = a[(i - 1) * sa], aim = a[(i - 2) * sa];
        for (int64_t j = 2; j <= m; j++) {
            double bj = b[(j - 1) * sb], bjm = b[(j - 2) * sb];
            cur[j] = min3(prev[j - 1] + fabs(ai - bj),
                          prev[j] + msm_cost(ai, aim, bj, c),
                          cur[j - 1] + msm_cost(bj, bjm, ai, c));
        }
        double* t = prev; prev = cur; cur = t;
    }
    return prev[m];
}

int msm_batch_c(const double* A, const double* B,
                int64_t bs, int64_t n, int64_t m,
                double c, double* out) {
    double* prev = (double*)malloc((size_t)(m + 1) * sizeof(double));
    double* cur = (double*)malloc((size_t)(m + 1) * sizeof(double));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    for (int64_t p = 0; p < bs; p++)
        out[p] = msm_one(A + p * n, B + p * m, n, m, 1, 1, c, prev, cur);
    free(prev); free(cur);
    return 0;
}

int msm_mc_batch_c(const double* A, const double* B,
                   int64_t bs, int64_t n, int64_t m, int64_t nch,
                   double c, double* out) {
    double* prev = (double*)malloc((size_t)(m + 1) * sizeof(double));
    double* cur = (double*)malloc((size_t)(m + 1) * sizeof(double));
    if (!prev || !cur) { free(prev); free(cur); return 1; }
    for (int64_t p = 0; p < bs; p++) {
        const double* ap = A + p * n * nch;
        const double* bp = B + p * m * nch;
        double acc = 0.0;
        for (int64_t ch = 0; ch < nch; ch++)
            acc += msm_one(ap + ch, bp + ch, n, m, nch, nch, c, prev, cur);
        out[p] = acc;
    }
    free(prev); free(cur);
    return 0;
}
"""

_lib = None
_tried = False


def _private_cache_dir() -> str:
    """Per-user 0700 cache dir for the published .so (security: a
    predictable name directly in the world-writable system temp dir lets
    another local user pre-plant a malicious library that every Spark
    python worker would dlopen — ADVICE r7). Ownership and mode are
    verified after creation so a pre-existing attacker-owned directory at
    the same path is rejected rather than used. The check uses lstat and
    rejects symlinks outright (ADVICE r8): os.stat FOLLOWS links, so a
    pre-planted symlink to any victim-owned 0700 directory (~/.ssh) would
    pass an os.stat check and redirect the .so write there."""
    import stat as _stat

    d = os.path.join(tempfile.gettempdir(), f"tsknn-{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.lstat(d)
    if (
        os.path.islink(d)
        or not _stat.S_ISDIR(st.st_mode)
        or st.st_uid != os.getuid()
        or (st.st_mode & 0o077)
    ):
        raise RuntimeError(
            f"unsafe cache dir {d}: symlink, non-directory, wrong owner, "
            "or group/world access"
        )
    return d


def _compile() -> "ctypes.CDLL | None":
    cc = shutil.which("cc") or shutil.which("gcc")
    if cc is None:
        return None
    tag = hashlib.sha256((_C_SRC + sys.version).encode()).hexdigest()[:16]
    so_path = os.path.join(_private_cache_dir(), f"tsknn_edit_{tag}.so")
    if not os.path.exists(so_path):
        tmpdir = tempfile.mkdtemp(prefix="tsknn_edit_build_")
        try:
            src = os.path.join(tmpdir, "edit.c")
            with open(src, "w") as f:
                f.write(_C_SRC)
            out = os.path.join(tmpdir, "edit.so")
            subprocess.run(
                [
                    cc, "-O3", "-march=native", "-ffp-contract=off",
                    "-fPIC", "-shared", src, "-o", out, "-lm",
                ],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(out, so_path)  # atomic publish; concurrent racers agree
        finally:
            shutil.rmtree(tmpdir, ignore_errors=True)
    lib = ctypes.CDLL(so_path)
    i64 = ctypes.c_int64
    dbl = ctypes.c_double
    dp = ctypes.POINTER(ctypes.c_double)
    sigs = {
        "lcss_batch_c": [dp, dp, i64, i64, i64, dbl, i64, dp],
        "lcss_mc_batch_c": [dp, dp, i64, i64, i64, i64, dbl, i64, dp],
        "edr_batch_c": [dp, dp, i64, i64, i64, dbl, dp],
        "edr_mc_batch_c": [dp, dp, i64, i64, i64, i64, dbl, dp],
        "erp_batch_c": [dp, dp, i64, i64, i64, dbl, dp],
        "erp_mc_batch_c": [dp, dp, i64, i64, i64, i64, dbl, dp],
        "twed_batch_c": [dp, dp, i64, i64, i64, dbl, dbl, dp],
        "twed_mc_batch_c": [dp, dp, i64, i64, i64, i64, dbl, dbl, dp],
        "msm_batch_c": [dp, dp, i64, i64, i64, dbl, dp],
        "msm_mc_batch_c": [dp, dp, i64, i64, i64, i64, dbl, dp],
    }
    for name, argtypes in sigs.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = ctypes.c_int
    return lib


def available() -> bool:
    """True when the compiled path is usable (compiler found, build+load
    OK, not disabled via TSKNN_EDIT_NO_CC)."""
    global _lib, _tried
    if os.environ.get("TSKNN_EDIT_NO_CC"):
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


def _prep(A: np.ndarray, B: np.ndarray):
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    bs, n = A.shape
    m = B.shape[1]
    if n < 1 or m < 1:
        # the C recurrences write prev[1] / read a[0], b[0] unconditionally
        # — an empty side is a heap overflow there, so it must never reach
        # the kernels (callers route empty series to the numpy cores)
        raise ValueError(f"edit C kernels require n >= 1 and m >= 1, got ({n}, {m})")
    return A, B, bs, n, m, np.empty(bs, dtype=np.float64)


def _prep_mc(A: np.ndarray, B: np.ndarray):
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    bs, n, nch = A.shape
    m, nch_b = B.shape[1], B.shape[2]
    if n < 1 or m < 1 or nch < 1:
        raise ValueError(
            f"edit mc C kernels require n, m, channels >= 1, got ({n}, {m}, {nch})"
        )
    if nch != nch_b:
        raise ValueError(f"channel mismatch: {nch} vs {nch_b} channels")
    return A, B, bs, n, m, nch, np.empty(bs, dtype=np.float64)


def _check(status: int) -> None:
    if status != 0:
        raise MemoryError("edit C kernel: DP row allocation failed")


def lcss_batch_c(A, B, eps, delta=None) -> np.ndarray:
    A, B, bs, n, m, out = _prep(A, B)
    _check(_lib.lcss_batch_c(
        _dptr(A), _dptr(B), bs, n, m, float(eps),
        -1 if delta is None else int(delta), _dptr(out),
    ))
    return out


def edr_batch_c(A, B, eps) -> np.ndarray:
    A, B, bs, n, m, out = _prep(A, B)
    _check(_lib.edr_batch_c(_dptr(A), _dptr(B), bs, n, m, float(eps), _dptr(out)))
    return out


def erp_batch_c(A, B, g) -> np.ndarray:
    A, B, bs, n, m, out = _prep(A, B)
    _check(_lib.erp_batch_c(_dptr(A), _dptr(B), bs, n, m, float(g), _dptr(out)))
    return out


def twed_batch_c(A, B, nu, lam) -> np.ndarray:
    A, B, bs, n, m, out = _prep(A, B)
    _check(_lib.twed_batch_c(
        _dptr(A), _dptr(B), bs, n, m, float(nu), float(lam), _dptr(out)
    ))
    return out


def msm_batch_c(A, B, c) -> np.ndarray:
    A, B, bs, n, m, out = _prep(A, B)
    _check(_lib.msm_batch_c(_dptr(A), _dptr(B), bs, n, m, float(c), _dptr(out)))
    return out


def lcss_mc_batch_c(A, B, eps, delta=None) -> np.ndarray:
    A, B, bs, n, m, nch, out = _prep_mc(A, B)
    _check(_lib.lcss_mc_batch_c(
        _dptr(A), _dptr(B), bs, n, m, nch, float(eps),
        -1 if delta is None else int(delta), _dptr(out),
    ))
    return out


def edr_mc_batch_c(A, B, eps) -> np.ndarray:
    A, B, bs, n, m, nch, out = _prep_mc(A, B)
    _check(_lib.edr_mc_batch_c(_dptr(A), _dptr(B), bs, n, m, nch, float(eps), _dptr(out)))
    return out


def erp_mc_batch_c(A, B, g) -> np.ndarray:
    A, B, bs, n, m, nch, out = _prep_mc(A, B)
    _check(_lib.erp_mc_batch_c(_dptr(A), _dptr(B), bs, n, m, nch, float(g), _dptr(out)))
    return out


def twed_mc_batch_c(A, B, nu, lam) -> np.ndarray:
    A, B, bs, n, m, nch, out = _prep_mc(A, B)
    _check(_lib.twed_mc_batch_c(
        _dptr(A), _dptr(B), bs, n, m, nch, float(nu), float(lam), _dptr(out)
    ))
    return out


def msm_mc_batch_c(A, B, c) -> np.ndarray:
    A, B, bs, n, m, nch, out = _prep_mc(A, B)
    _check(_lib.msm_mc_batch_c(_dptr(A), _dptr(B), bs, n, m, nch, float(c), _dptr(out)))
    return out
