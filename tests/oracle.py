"""NumPy oracle: independent re-statement of the reference semantics.

Small, slow, obviously-correct implementations used to validate the jitted
TPU programs.  Follows the math of the CPU twin
(/root/reference/cpu_version/quantizer/treequantizer.hpp, helper.hpp) — not
the code.
"""

from __future__ import annotations

import numpy as np


def sqdist(x, c):
    """(n, d), (k, d) -> (n, k) squared L2."""
    return ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)


def part_tables(x, codebook):
    """(n, d), (p, k, vl) -> (n, p, k)."""
    n = x.shape[0]
    p, k, vl = codebook.shape
    xp = x.reshape(n, p, vl)
    out = np.empty((n, p, k), np.float64)
    for pi in range(p):
        out[:, pi, :] = sqdist(xp[:, pi, :], codebook[pi])
    return out


def lambda_to_u16(lam):
    f = (lam + 4.0) * (65536.0 / 8.0)
    out = np.where(lam >= 4.0, 65535.0, np.where(lam < -4.0, 0.0, f))
    return out.astype(np.uint16)


def u16_to_lambda(u):
    return u.astype(np.float64) * (8.0 / 65536.0) - 4.0


def project(a2, b2, c2):
    return -0.5 * (a2 - b2 - c2) / np.maximum(c2, 1e-20)


def line_dist(a2, b2, c2, lam):
    return b2 + lam * lam * c2 + lam * (a2 - b2 - c2)


def best_line_code(vec_seg_dists, pair_dists):
    """For one vector's one line-part: (c1,) dists, (c1, c1) pair dists ->
    (A, B, lambda) minimizing projection residual over A < B."""
    c1 = vec_seg_dists.shape[0]
    best = (None, None, None, np.inf)
    for A in range(c1):
        b2 = vec_seg_dists[A]
        for B in range(A + 1, c1):
            a2 = vec_seg_dists[B]
            c2 = pair_dists[A, B]
            lam = project(a2, b2, c2)
            resid = b2 - lam * lam * max(c2, 1e-20)
            if resid < best[3]:
                best = (A, B, lam, resid)
    return best[:3]


def exact_knn(queries, db, k):
    d = sqdist(queries, db)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def kmeans_lloyd(data, k, iters=50, seed=0):
    """Plain Lloyd from k random points; only used for sanity comparisons of
    quantization error, not exact-match tests."""
    rng = np.random.default_rng(seed)
    centroids = data[rng.choice(data.shape[0], k, replace=False)].copy()
    for _ in range(iters):
        a = np.argmin(sqdist(data, centroids), axis=1)
        for c in range(k):
            m = a == c
            if m.any():
                centroids[c] = data[m].mean(0)
    return centroids


def quantization_error(data, centroids):
    return float(np.min(sqdist(data, centroids), axis=1).mean())
