"""Multi-probe traversal sequences ("poor-man's Dijkstra").

Host-side NumPy precomputation of the order in which candidate bins are
enumerated at query time.  The sequences are static tensors consumed by
vectorized gathers inside the jitted query pipeline — the TPU replacement for
the reference's data-dependent enumeration loops.

Two families, both re-derived from the reference:
  * static p-dim sequence over rank-tuples {0..base-1}^p sorted by a
    concave per-coordinate key (ProTree.cu:128-207 uses sum(sqrt(rank));
    cpu_version/treequantizer.hpp:75-127 uses sum(rank^2));
  * anisotropic 2D family for the two-stage "BIG" query path: 10 slopes
    s = (0.9*1.2)^(slope-5), key = x^0.8 + s*y^0.8 (ProTree.cu:50-126,
    constants ProTree.hh:9-13).
"""

from __future__ import annotations

import functools

import numpy as np

NUM_DISTSEQ = 65536       # ProTree.hh:9
NUM_ANISO_DIR = 10        # ProTree.hh:12
ANISO_BASE = 1.2          # ProTree.hh:13


@functools.lru_cache(maxsize=32)
def static_sequence(base: int, parts: int, length: int = NUM_DISTSEQ,
                    key: str = "sqrt") -> np.ndarray:
    """Rank-tuples of {0..base-1}^parts in approximately-increasing distance order.

    Args:
      base: number of per-part candidates (k1*c2 at query time).  The
        reference clamps this to 16 (ProTree.cu:135) to keep base^p
        enumerable; we do the same.
      parts: p.
      key: "sqrt"  -> sum(sqrt(rank))  (GPU reference)
           "sqnorm"-> sum(rank^2)      (CPU reference)
           "linear"-> sum(rank)
    Returns:
      (length, parts) int32 array; row i is the i-th tuple of per-part ranks.
      If base**parts < length, the tail is zero-padded (reference does the
      same, ProTree.cu:185-195).
    """
    base = min(base, 16)
    n = base ** parts
    idx = np.arange(n, dtype=np.int64)
    digits = np.empty((n, parts), dtype=np.int64)
    denom = 1
    for p_i in range(parts):
        digits[:, p_i] = (idx // denom) % base
        denom *= base
    if key == "sqrt":
        score = np.sqrt(digits.astype(np.float64)).sum(axis=1)
    elif key == "sqnorm":
        score = (digits.astype(np.float64) ** 2).sum(axis=1)
    elif key == "linear":
        score = digits.astype(np.float64).sum(axis=1)
    else:
        raise ValueError(f"unknown key {key!r}")
    # Stable sort matches std::sort on (score, index) pairs closely enough;
    # ties between equal scores are resolved by original enumeration order.
    order = np.argsort(score, kind="stable")
    seq = digits[order].astype(np.int32)
    out = np.zeros((length, parts), dtype=np.int32)
    take = min(n, length)
    out[:take] = seq[:take]
    return out


@functools.lru_cache(maxsize=16)
def pair_sequence(m: int, length: int, key: str = "sqrt") -> np.ndarray:
    """Traversal over rank pairs {0..m-1}^2 in approximately-increasing order.

    The 2-axis analog of static_sequence WITHOUT the base-16 clamp: the pair
    pipeline enumerates over two per-part-PAIR rank axes (each rank indexes an
    exactly-sorted pair list), so m up to ~256 is both useful and enumerable
    (m^2 tuples).  Mirrors the role of the reference's 2D bin selection
    (PerturbationProTree.cu:2839-3188) with the isotropic key.

    Returns (length, 2) int32, zero-padded past m*m.
    """
    n = m * m
    i = np.arange(n, dtype=np.int64)
    x = i // m
    y = i % m
    if key == "sqrt":
        score = np.sqrt(x.astype(np.float64)) + np.sqrt(y.astype(np.float64))
    elif key == "linear":
        score = (x + y).astype(np.float64)
    else:
        raise ValueError(f"unknown key {key!r}")
    order = np.argsort(score, kind="stable")
    out = np.zeros((length, 2), dtype=np.int32)
    take = min(n, length)
    out[:take, 0] = x[order[:take]].astype(np.int32)
    out[:take, 1] = y[order[:take]].astype(np.int32)
    return out


@functools.lru_cache(maxsize=8)
def aniso_2d_sequences(base: int, length: int = NUM_DISTSEQ,
                       n_dir: int = NUM_ANISO_DIR,
                       aniso_base: float = ANISO_BASE) -> np.ndarray:
    """Family of 2D traversal sequences for anisotropic distance profiles.

    For each of n_dir slopes s = (0.9*aniso_base)^(d - n_dir//2) the pairs
    (x, y) in {0..base-1}^2 are sorted by x^0.8 + s*y^0.8
    (ProTree.cu:68-92).  Used by the two-stage 2D bin selection where parts
    are merged pairwise (PerturbationProTree.cu:2839-3188).

    STATUS — measured alternative, not wired into a pipeline: on the bench
    fixture (benchmarks/aniso_vs_exact.py, n=100k, M=256) the heuristic
    reaches the true-NN bin within the first E enumerated bins at rates
    0.977 / 0.984 / 0.992 for E = 128 / 512 / 2048, while EXACT pair-sum
    ordering (what query.py's pair stage computes with one top_k on the
    MXU) sits at its 0.992 ceiling already at E = 128.  The heuristic only
    exists in the reference because exact per-query sorting was expensive
    inside a CUDA block; on TPU the exact ordering is cheaper than
    dispatching per-query sequence selection, so the production pipelines
    use exact ordering and this family remains as the reference-parity
    implementation (validated in tests/test_ops.py).

    Returns:
      (n_dir, length, 2) int32; [..., 0] = x (first part's rank),
      [..., 1] = y (second part's rank).  Zero-padded past base^2.
    """
    n = base * base
    i = np.arange(n, dtype=np.int64)
    x = (i % base).astype(np.float64)
    y = (i // base).astype(np.float64)
    out = np.zeros((n_dir, length, 2), dtype=np.int32)
    take = min(n, length)
    for d in range(n_dir):
        s = (0.9 * aniso_base) ** (d - n_dir // 2)
        score = x ** 0.8 + s * y ** 0.8
        order = np.argsort(score, kind="stable")
        out[d, :take, 0] = x[order[:take]].astype(np.int32)
        out[d, :take, 1] = y[order[:take]].astype(np.int32)
    return out


def slope_index(dx: np.ndarray, dy: np.ndarray,
                n_dir: int = NUM_ANISO_DIR,
                aniso_base: float = ANISO_BASE):
    """Pick the anisotropic sequence whose slope best matches dy/dx.

    The reference estimates the per-part-pair distance growth rate and indexes
    the sequence family with round(log_base(dy/dx)) (computeSlopeIdx,
    PerturbationProTree.cu:2839-2870).  Works on numpy or jax arrays.
    """
    import jax.numpy as jnp
    ratio = dy / jnp.maximum(dx, 1e-12)
    idx = jnp.round(jnp.log(ratio) / np.log(aniso_base)) + n_dir // 2
    return jnp.clip(idx, 0, n_dir - 1).astype(jnp.int32)
