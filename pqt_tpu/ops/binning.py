"""Bin ids, inverted-file (CSR) construction, and candidate gathering.

TPU re-design of the reference's hashed inverted file:

  * bin id: per-part codes combined mixed-radix, part 0 most significant,
    then reduced into the hash table (reference calcIdx,
    PerturbationProTree.cu:545-568).  When the unhashed id space fits the
    table we use the exact mixed-radix id; otherwise we use a multiplicative
    mixing hash — same role as the reference's `% HASH_SIZE`, but with good
    spread for power-of-two table sizes (TPU integer arithmetic is 32-bit,
    so a power-of-two table + mixing replaces the reference's 4e8 modulus).

  * CSR build: the reference uses atomicInc histogram + 3-level scan +
    atomic scatter (PerturbationProTree.cu:625-661,715-750, ProTree.cu:1060-1299)
    which is nondeterministic in id order.  Here: one stable sort by bin id
    + scatter-add histogram + cumsum — deterministic, and the sort also
    gives the permutation that lays codes/vectors out in CSR order so query
    gathers hit contiguous memory.

  * candidate gather: fixed-budget, capped per bin
    (getKVectorIDsKernelFast, PerturbationProTree.cu:4307-4419) expressed as
    a vectorized searchsorted over per-bin offset prefix sums.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Knuth multiplicative-hash constants (odd, derived from the golden ratio).
_MIX_MULTIPLIERS = np.array(
    [2654435761, 2246822519, 3266489917, 668265263,
     374761393, 3812015801, 2034678193, 1669595009],
    dtype=np.uint32)


def exact_bin_ids(codes: jax.Array, part_radix: int) -> jax.Array:
    """Mixed-radix bin id, part 0 most significant (calcIdx semantics).

    Only valid when part_radix ** p fits int32; caller must guarantee it.
    codes: (..., p) int32 in [0, part_radix).
    """
    p = codes.shape[-1]
    out = codes[..., 0].astype(jnp.int32)
    for j in range(1, p):
        out = out * jnp.int32(part_radix) + codes[..., j].astype(jnp.int32)
    return out


def hashed_bin_ids(codes: jax.Array, part_radix: int,
                   hash_size: int) -> jax.Array:
    """Bin id reduced into a power-of-two hash table of `hash_size` slots.

    If the unhashed space fits, the id is exact (no collisions).  Otherwise
    each part's code is mixed with an odd multiplier and the sum is
    Fibonacci-hashed down to log2(hash_size) bits.
    """
    assert hash_size & (hash_size - 1) == 0, "hash_size must be a power of two"
    p = codes.shape[-1]
    if part_radix ** p <= hash_size and part_radix ** p <= 2**31:
        return exact_bin_ids(codes, part_radix)
    u = codes.astype(jnp.uint32)
    acc = jnp.zeros(codes.shape[:-1], jnp.uint32)
    for j in range(p):
        acc = acc + u[..., j] * _MIX_MULTIPLIERS[j % len(_MIX_MULTIPLIERS)]
    acc = acc * jnp.uint32(2654435761)
    shift = 32 - int(np.log2(hash_size))
    return (acc >> jnp.uint32(shift)).astype(jnp.int32)


class InvertedFile(NamedTuple):
    """CSR inverted file over `hash_size` bins.

    Equivalent artifact set to the reference's .prefix/.count/.dbIdx
    (tool_createdb.cpp:116-138), with payloads re-laid-out in CSR order.
    """
    prefix: jax.Array      # (hash_size,) int32, exclusive prefix of counts
    counts: jax.Array      # (hash_size,) int32
    ids: jax.Array         # (n,) int32: original vector id at CSR position
    order: jax.Array       # (n,) int32 alias of ids (CSR permutation)

    @property
    def n_vectors(self) -> int:
        return self.ids.shape[0]


def build_csr(bin_ids: jax.Array, hash_size: int) -> InvertedFile:
    """Build the inverted file from per-vector bin assignments.

    bin_ids: (n,) int32 in [0, hash_size).
    Deterministic: vectors within a bin keep ascending original id, matching
    insert order semantics of the CPU reference (treequantizer.hpp:212-217)
    without the GPU reference's atomic nondeterminism.
    """
    n = bin_ids.shape[0]
    counts = jnp.zeros((hash_size,), jnp.int32).at[bin_ids].add(
        1, mode="drop")
    prefix = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    # Stable sort by bin id -> CSR order.
    order = jnp.argsort(bin_ids, stable=True).astype(jnp.int32)
    return InvertedFile(prefix=prefix, counts=counts, ids=order, order=order)


def compact_nonempty_bins(bin_ids: jax.Array, counts: jax.Array,
                          max_bins: int):
    """Keep the first `max_bins` non-empty bins per row, preserving order.

    The traversal-sequence enumeration proposes bins in approximately
    increasing distance order; most are empty.  The reference filters by
    occupancy and compacts with a block scan (selectBinKernelFast2,
    PerturbationProTree.cu:3374-3549).  Here: argsort on (empty, position).

    bin_ids, counts: (B, E) with E >= max_bins.
    Returns (bins (B, max_bins), counts (B, max_bins)); slots past the last
    non-empty bin have count 0.

    Implementation: order-preserving stream compaction via cumsum + scatter
    (no sort) — each non-empty entry knows its output slot from the running
    count of non-empty entries before it.
    """
    B, E = bin_ids.shape
    nonempty = counts > 0
    target = jnp.cumsum(nonempty.astype(jnp.int32), axis=-1) - 1   # (B, E)
    valid = nonempty & (target < max_bins)
    row = jnp.arange(B, dtype=jnp.int32)[:, None]
    dump = B * max_bins                       # overflow slot, sliced off below
    flat_t = jnp.where(valid, row * max_bins + target, dump).ravel()
    out_bins = (jnp.zeros((B * max_bins + 1,), bin_ids.dtype)
                .at[flat_t].set(bin_ids.ravel(), mode="drop")
                [:B * max_bins].reshape(B, max_bins))
    out_counts = (jnp.zeros((B * max_bins + 1,), counts.dtype)
                  .at[flat_t].set(counts.ravel(), mode="drop")
                  [:B * max_bins].reshape(B, max_bins))
    return out_bins, out_counts


def gather_candidates(prefix_of_bins: jax.Array, counts_of_bins: jax.Array,
                      max_candidates: int, max_vec_per_bin: int):
    """Flatten per-query probed bins into a fixed-size candidate list.

    Args:
      prefix_of_bins: (B, nb) int32 CSR start offset of each probed bin.
      counts_of_bins: (B, nb) int32 occupancy of each probed bin.
    Returns:
      positions: (B, max_candidates) int32 CSR positions (clamped garbage
        where invalid);
      valid: (B, max_candidates) bool.

    Candidate j of query b belongs to the bin whose cumulative (capped)
    count interval contains j; its CSR position is the bin's prefix plus the
    within-bin offset.  This is the static-shape equivalent of the
    reference's capped copy loop (getKVectorIDsKernelFast,
    PerturbationProTree.cu:4307-4419).
    """
    B, nb = counts_of_bins.shape
    K = max_candidates
    capped = jnp.minimum(counts_of_bins, max_vec_per_bin)
    ends = jnp.cumsum(capped, axis=-1)                       # (B, nb)
    starts = ends - capped
    total = ends[:, -1]

    # positions[slot] = slot + (prefix_i - starts_i) for the bin i owning the
    # slot.  Scatter that per-bin offset at each occupied bin's start slot,
    # then fill it forward along the slot axis with a "latest valid wins"
    # associative scan — no searchsorted, no batched gathers.
    delta = prefix_of_bins - starts                          # (B, nb)
    row = jnp.arange(B, dtype=jnp.int32)[:, None]
    occupied = capped > 0
    in_budget = occupied & (starts < K)
    dump = B * K
    flat_t = jnp.where(in_budget, row * K + starts, dump).ravel()
    seed_v = (jnp.zeros((B * K + 1,), jnp.int32)
              .at[flat_t].set(delta.ravel(), mode="drop")
              [:B * K].reshape(B, K))
    seed_f = (jnp.zeros((B * K + 1,), jnp.bool_)
              .at[flat_t].set(in_budget.ravel(), mode="drop")
              [:B * K].reshape(B, K))

    def fill_forward(l, r):
        lv, lf = l
        rv, rf = r
        return jnp.where(rf, rv, lv), lf | rf

    filled, _ = jax.lax.associative_scan(fill_forward, (seed_v, seed_f),
                                         axis=-1)
    slots = jnp.arange(K, dtype=jnp.int32)[None, :]
    positions = slots + filled
    valid = slots < total[:, None]
    return positions, valid
