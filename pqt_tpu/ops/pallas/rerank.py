"""Pallas fused line re-rank: payload unpack + triangle reconstruction.

The XLA path (ops/linecodes.reconstruct_dists_idx) evaluates the
reconstruction

    d[k] = t3[k] + sum_j (1-lam[k,j]) * q[j, A[k,j]] + lam[k,j] * q[j, B[k,j]]

with a c1-unrolled compare-select: 2*c1 masked FMAs over the full
(B, K, lp) lattice (c1=16 -> 32 passes over 16M elements at the serving
point).  Mosaic cannot vector-gather from VMEM in general, but it CAN
gather along the 128-lane dimension (take_along_axis, axis=-1) — and the
per-(query, line-part) table is only c1 <= 16 values, which fits in one
lane tile.  So the kernel:

  * receives the gathered payload PRE-TRANSPOSED to (B, W, K) so each
    packed word is a (8, 128)-tileable slice along candidates;
  * unpacks A/B/lambda with VPU bit ops;
  * resolves q[j, A] / q[j, B] with ONE lane-gather each per line part
    from the query's lane-padded table row — 2*lp gathers per (query,
    candidate-block) instead of 2*c1 full-lattice passes, an ~8x VPU-work
    reduction at c1=16;
  * accumulates the distance and adds the bitcast t3 term.

Top-k stays in XLA (lax.top_k on (B, K) is already a vectorized bitonic
sort).  Reference analog: rerankKernelFast
(/root/reference/pqt/PerturbationProTree.cu:5189-5351), which likewise
walks candidates per thread with the per-query table in shared memory.

Payload layout contract (models/db.py compact format, c1 <= 16):
  word 0: original id (int32)            — passed through untouched
  word 1: t3 (f32 bitcast to int32)
  word 2 + j//2, half j%2 (16 bits):  A | B << 4 | lam_u8 << 8
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK = LANES * SUBLANES          # candidates per kernel block


def supports(cfg) -> bool:
    """Kernel preconditions: compact payload + 4-bit (p1,p2) codes.

    The 4-bit A/B decode in `_kernel` requires c1 <= 16; today
    `payload_is_compact` already implies that, but check it explicitly so
    the guard matches the real kernel requirement rather than relying on
    the implication.  The candidate-count divisibility (K % BLOCK) is
    checked by the caller against the REALIZED row count (slab mode can
    round it up).
    """
    return cfg.payload_is_compact and cfg.c1 <= 16


def _kernel(rows_ref, q_ref, out_ref, *, lp: int):
    """One (query, candidate-block) step.

    rows_ref: (1, W, SUBLANES, LANES) int32 — candidate words, transposed;
    q_ref:    (1, lp, LANES) f32 — the query's line tables, lane-padded;
    out_ref:  (1, SUBLANES, LANES) f32 — reconstructed distances.
    """
    acc = pltpu.bitcast(rows_ref[0, 1], jnp.float32)        # t3, (8, 128)
    for j in range(lp):
        word = rows_ref[0, 2 + j // 2]                       # (8, 128) int32
        half = (word >> (16 * (j % 2))) & 0xFFFF
        a_idx = half & 0xF
        b_idx = (half >> 4) & 0xF
        lam = ((half >> 8) & 0xFF).astype(jnp.float32) * (8.0 / 256.0) - 4.0
        qrow = jnp.broadcast_to(q_ref[0, j][None, :], (SUBLANES, LANES))
        qa = jnp.take_along_axis(qrow, a_idx, axis=1)
        qb = jnp.take_along_axis(qrow, b_idx, axis=1)
        acc = acc + (1.0 - lam) * qa + lam * qb
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def rerank_fused(rows_t: jax.Array, q_pad: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Fused line re-rank over pre-transposed payload rows.

    rows_t: (B, W, K) int32 — gathered candidate words, candidate-minor;
    q_pad:  (B, lp, 128) f32 — line tables lane-padded beyond c1 (padding
            is never indexed; it only squares the tile).
    Returns (B, K) f32 reconstructed squared distances.
    """
    B, W, K = rows_t.shape
    lp = (W - 2) * 2
    assert K % BLOCK == 0, "pad max_candidates to a multiple of 1024"
    nblk = K // BLOCK
    lanes = q_pad.shape[-1]
    assert lanes == LANES and q_pad.shape[1] == lp
    # Flatten (query, block) into one grid axis so every block is rank-4
    # with leading 1 (Pallas ref shape == block shape).
    rows_blk = (rows_t.reshape(B, W, nblk, SUBLANES, LANES)
                .transpose(0, 2, 1, 3, 4)
                .reshape(B * nblk, W, SUBLANES, LANES))

    out = pl.pallas_call(
        functools.partial(_kernel, lp=lp),
        grid=(B * nblk,),
        in_specs=[
            pl.BlockSpec((1, W, SUBLANES, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lp, LANES), lambda i: (i // nblk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, SUBLANES, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nblk, SUBLANES, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(rows_blk, q_pad)
    return (out.reshape(B, nblk, SUBLANES, LANES)
            .reshape(B, K))
