"""Pallas device primitives: row bitonic sort/top-k, block scan, segmented
reduction.

TPU re-design of the reference's L0 device layer (pqt/bitonicSort.cuh:17-211
in-block bitonic sorts + Hillis-Steele scans, pqt/ProQuantization.cu:101-137
segmented tree reduction).  On TPU these run over 8x128 VMEM tiles inside a
single kernel; rows are independent, so each grid step sorts/scans a block
of rows entirely in VMEM.

XLA's own lax.sort/cumsum are strong; the standalone value of these kernels
is (a) parity with the reference's primitive layer, (b) fusion building
blocks — the bitonic network here is the same code used by the fused
rerank+top-k kernel, where avoiding an HBM round trip does matter.

All kernels require power-of-two row lengths (the reference pads to the next
power of two via its `log2` helper, pqt/helper.hh:27-37; callers here pad
with +inf / 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bitonic_stages(n: int):
    """(size, stride) pairs of a full ascending bitonic sort network."""
    stages = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            stages.append((k, j))
            j //= 2
        k *= 2
    return stages


def _bitonic_pass(vals, idxs, k, j):
    """One compare-exchange stage over the last axis (length n, power of 2).

    Equivalent of one (size, stride) step of bitonic3 (bitonicSort.cuh:17-44)
    vectorized over rows: partner pairing via reshape, direction from bit k
    of the element index.
    """
    r, n = vals.shape
    v = vals.reshape(r, n // (2 * j), 2, j)
    i = idxs.reshape(r, n // (2 * j), 2, j)
    a_v, b_v = v[:, :, 0, :], v[:, :, 1, :]
    a_i, b_i = i[:, :, 0, :], i[:, :, 1, :]
    # ascending iff bit log2(k) of the element's position is 0
    pos = jax.lax.broadcasted_iota(jnp.int32, (r, n // (2 * j), j), 1)
    pos = pos * (2 * j) + jax.lax.broadcasted_iota(
        jnp.int32, (r, n // (2 * j), j), 2)
    asc = (pos & k) == 0
    swap = jnp.where(asc, a_v > b_v, a_v < b_v)
    new_a_v = jnp.where(swap, b_v, a_v)
    new_b_v = jnp.where(swap, a_v, b_v)
    new_a_i = jnp.where(swap, b_i, a_i)
    new_b_i = jnp.where(swap, a_i, b_i)
    v = jnp.stack([new_a_v, new_b_v], axis=2)
    i = jnp.stack([new_a_i, new_b_i], axis=2)
    return v.reshape(r, n), i.reshape(r, n)


def _sort_rows_in_kernel(vals, idxs):
    """Full ascending bitonic sort of (r, n) rows; returns (vals, idxs)."""
    n = vals.shape[-1]
    for k, j in _bitonic_stages(n):
        vals, idxs = _bitonic_pass(vals, idxs, k, j)
    return vals, idxs


def bitonic_topk(x: jax.Array, k: int, rows_per_step: int = 8,
                 interpret: bool = False):
    """Per-row smallest-k (values, indices) via an in-VMEM bitonic network.

    x: (B, N) float32 with N a power of two.  Returns ((B, k) values
    ascending, (B, k) int32 source indices).  The Pallas analog of
    `bitonic3` + take-first-k (bitonicSort.cuh:17-44, used for all k-best
    selections in the reference).
    """
    B, N = x.shape
    assert N & (N - 1) == 0, "row length must be a power of two"
    R = min(rows_per_step, B)
    assert B % R == 0

    def kernel(x_ref, val_ref, idx_ref):
        vals = x_ref[:]
        idxs = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
        vals, idxs = _sort_rows_in_kernel(vals, idxs)
        val_ref[:] = vals[:, :k]
        idx_ref[:] = idxs[:, :k]

    return pl.pallas_call(
        kernel,
        grid=(B // R,),
        in_specs=[pl.BlockSpec((R, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((R, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((R, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, k), x.dtype),
                   jax.ShapeDtypeStruct((B, k), jnp.int32)),
        interpret=interpret,
    )(x)


def block_scan(x: jax.Array, exclusive: bool = False,
               rows_per_step: int = 8, interpret: bool = False):
    """Per-row prefix sum in VMEM (scan_block2/scan_blockLarge analog,
    bitonicSort.cuh:112-211; the reference builds its CSR prefix with a
    3-level version of this, ProTree.cu:1060-1299).

    x: (B, N) numeric.  Returns (B, N) inclusive (or exclusive) prefix sums.
    """
    B, N = x.shape
    R = min(rows_per_step, B)
    assert B % R == 0

    def kernel(x_ref, out_ref):
        s = jnp.cumsum(x_ref[:], axis=-1)
        if exclusive:
            s = s - x_ref[:]
        out_ref[:] = s

    return pl.pallas_call(
        kernel,
        grid=(B // R,),
        in_specs=[pl.BlockSpec((R, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N), x.dtype),
        interpret=interpret,
    )(x)


def segmented_reduce(x: jax.Array, parts: int, rows_per_step: int = 8,
                     interpret: bool = False):
    """Per-row segment sums: (B, D) -> (B, parts), D % parts == 0.

    The reference's one-block-per-vector segmented tree reduction producing
    all p part-distances at once (ProQuantization.cu:101-137), as a VMEM
    reshape+sum.
    """
    B, D = x.shape
    assert D % parts == 0
    R = min(rows_per_step, B)
    assert B % R == 0
    seg = D // parts

    def kernel(x_ref, out_ref):
        out_ref[:] = jnp.sum(x_ref[:].reshape(R, parts, seg), axis=-1)

    return pl.pallas_call(
        kernel,
        grid=(B // R,),
        in_specs=[pl.BlockSpec((R, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, parts), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, parts), x.dtype),
        interpret=interpret,
    )(x)
