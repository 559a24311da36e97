"""DTW kernels (numpy, driver/executor-side Python — the engine's one
irreducible non-SQL compute path, SURVEY.md §2.10 U2).

The reference calls ``fastdtw.fastdtw(series1, series2)`` with default
radius=1 and default per-point distance = |a-b| (Team11-Project.py:339-341,
531-533). Semantics implemented here:

- ``dtw_pair``: exact O(n*m) DP, optional Sakoe-Chiba band. Reference
  implementation for tests and the per-pair fallback.
- ``fastdtw_pair``: faithful FastDTW (Salvador & Chan, "FastDTW: Toward
  Accurate Dynamic Time Warping in Linear Time", 2007): recursive
  half-resolution coarsening, project the low-res warp path, refine within
  ``radius``. Matches the `fastdtw` PyPI package's algorithm (which the
  reference uses) without depending on it.
- ``dtw_batch``: the production kernel — exact banded DTW vectorized BOTH
  along the DP row and ACROSS a batch of pairs. The classic DP recurrence
  cur[j] = c[j] + min(prev[j], prev[j-1], cur[j-1]) carries a sequential
  dependency on cur[j-1]; we break it with the prefix-scan identity
      cur[j] = C[j] + min_{i<=j} (m[i] - C[i-1]),
  where m[j] = min(prev[j], prev[j-1]) and C = cumsum(cost row), computed
  with ``np.minimum.accumulate`` — every DP row becomes O(1) numpy calls over
  a (batch, m) matrix. ~3 orders of magnitude over per-cell Python, which is
  how a Python DTW keeps up with (and beats) the reference's cluster
  throughput on one box (BASELINE.md).
"""

from __future__ import annotations

import numpy as np

__all__ = ["dtw_pair", "fastdtw_pair", "dtw_batch"]

_INF = np.inf


def _point_cost(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # fastdtw's default for 1-D points: absolute difference
    return np.abs(a[:, None] - b[None, :])


def dtw_pair(a, b, band: int | None = None) -> float:
    """Exact DTW distance (sum of |a_i-b_j| along the optimal warp path).

    ``band``: Sakoe-Chiba band half-width (None = unconstrained).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        raise ValueError("empty series")
    cost = _point_cost(a, b)
    acc = np.full((n + 1, m + 1), _INF)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        lo, hi = 1, m
        if band is not None:
            # keep the band feasible for unequal lengths: scale the diagonal
            center = int(round((i - 1) * (m - 1) / max(n - 1, 1))) + 1
            lo = max(1, center - band)
            hi = min(m, center + band)
        for j in range(lo, hi + 1):
            acc[i, j] = cost[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i - 1, j - 1], acc[i, j - 1]
            )
    return float(acc[n, m])


# ---------------------------------------------------------------------------
# Faithful FastDTW (Salvador & Chan 2007), for parity with the reference's
# `fastdtw` dependency. Used in tests and available as metric="fastdtw".
# ---------------------------------------------------------------------------


def _dtw_with_path(a, b, window=None):
    n, m = len(a), len(b)
    if window is None:
        window = [(i, j) for i in range(n) for j in range(m)]
    D = {(-1, -1): (0.0, None)}
    for i, j in window:
        c = abs(a[i] - b[j])
        best = None
        for pi, pj in ((i - 1, j), (i, j - 1), (i - 1, j - 1)):
            prev = D.get((pi, pj))
            if prev is not None and (best is None or prev[0] < best[0]):
                best = (prev[0], (pi, pj))
        if best is None:
            continue
        D[(i, j)] = (best[0] + c, best[1])
    dist = D[(n - 1, m - 1)][0]
    path = []
    node = (n - 1, m - 1)
    while node != (-1, -1):
        path.append(node)
        node = D[node][1]
        if node is None:
            break
    path.reverse()
    if path and path[0] == (-1, -1):
        path = path[1:]
    return dist, path


def _reduce_by_half(x):
    x = np.asarray(x, dtype=np.float64)
    n = len(x) - (len(x) % 2)
    return ((x[0:n:2] + x[1:n:2]) / 2.0) if n else x


def _expand_window(path, len_a, len_b, radius):
    path_set = set(path)
    for i, j in path:
        for di in range(-radius, radius + 1):
            for dj in range(-radius, radius + 1):
                path_set.add((i + di, j + dj))
    window_set = set()
    for i, j in path_set:
        for a, b in ((i * 2, j * 2), (i * 2, j * 2 + 1), (i * 2 + 1, j * 2), (i * 2 + 1, j * 2 + 1)):
            window_set.add((a, b))
    window = []
    start_j = 0
    for i in range(len_a):
        new_start_j = None
        for j in range(start_j, len_b):
            if (i, j) in window_set:
                window.append((i, j))
                if new_start_j is None:
                    new_start_j = j
            elif new_start_j is not None:
                break
        if new_start_j is not None:
            start_j = new_start_j
    return window


def _fastdtw_rec(a, b, radius):
    min_size = radius + 2
    if len(a) < min_size or len(b) < min_size:
        return _dtw_with_path(a, b)
    shrunk_a = _reduce_by_half(a)
    shrunk_b = _reduce_by_half(b)
    _, path = _fastdtw_rec(shrunk_a, shrunk_b, radius)
    window = _expand_window(path, len(a), len(b), radius)
    return _dtw_with_path(a, b, window)


def fastdtw_pair(a, b, radius: int = 1) -> float:
    """FastDTW approximation — reference parity (`fastdtw` package defaults)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    dist, _ = _fastdtw_rec(a, b, radius)
    return float(dist)


# ---------------------------------------------------------------------------
# Production batched kernel
# ---------------------------------------------------------------------------


def dtw_batch(A: np.ndarray, B: np.ndarray, band: int | None = None) -> np.ndarray:
    """Exact (optionally banded) DTW over a batch of equal-length pairs.

    A: (batch, n) float64, B: (batch, m) float64 -> (batch,) distances.
    Vectorized across the batch and along each DP row via the prefix-scan
    identity (module docstring).
    """
    A = np.ascontiguousarray(A, dtype=np.float64)
    B = np.ascontiguousarray(B, dtype=np.float64)
    bs, n = A.shape
    _, m = B.shape
    if bs == 0:
        return np.empty(0, dtype=np.float64)

    use_band = band is not None and band < max(n, m)
    # Finite "unreachable" sentinel: inf would turn the cumsum scan into
    # inf-inf = nan (and minimum.accumulate propagates nan). The sentinel
    # never enters a cumsum (the scan runs over the band slice only), so no
    # precision loss; any real DTW cost is astronomically below it.
    LARGE = 1e18
    prev = np.full((bs, m + 1), LARGE)
    prev[:, 0] = 0.0  # acc[0, 0] = 0; acc[0, j>0] = unreachable
    cur = np.full((bs, m + 1), LARGE)
    minimum = np.minimum
    # Banded rows only rewrite the band slice, so cells from two rows ago go
    # stale in the double buffer. The next row reads at most `delta` cells
    # past the previous row's band (the diagonal center shifts by <=
    # ceil(slope)+1 per row, monotonically) — sentinel-filling that margin
    # is O(band) per row instead of the O(m) full-row memset, which
    # dominated the kernel (555 of 562 columns were sentinel writes).
    delta = int(np.ceil((m - 1) / max(n - 1, 1))) + 2

    for i in range(1, n + 1):
        if use_band:
            center = int(round((i - 1) * (m - 1) / max(n - 1, 1)))
            lo = max(0, center - band)  # 0-based col range [lo, hi]
            hi = min(m - 1, center + band)
        else:
            lo, hi = 0, m - 1
        # cost slice: |a_i - b_j| for j in [lo, hi], all pairs at once
        c = np.abs(A[:, i - 1 : i] - B[:, lo : hi + 1])
        # m[j] = min(acc[i-1, j], acc[i-1, j-1]) over the band slice
        mrow = minimum(prev[:, lo + 1 : hi + 2], prev[:, lo : hi + 1])
        # cur[j] = C[j] + min_{i<=j}(m[i] - C[i-1]);  C = cumsum of cost slice
        C = np.cumsum(c, axis=1)
        shifted = np.concatenate([np.zeros((bs, 1)), C[:, :-1]], axis=1)
        run = np.minimum.accumulate(mrow - shifted, axis=1)
        if use_band:
            cur[:, max(1, lo + 1 - delta) : lo + 1] = LARGE
            cur[:, hi + 2 : min(m + 1, hi + 2 + delta)] = LARGE
        cur[:, lo + 1 : hi + 2] = C + run
        cur[:, 0] = LARGE
        prev, cur = cur, prev
    out = prev[:, m].copy()
    return out
