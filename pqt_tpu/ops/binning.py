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
    PerturbationProTree.cu:3374-3549).

    bin_ids, counts: (B, E) with E >= max_bins.
    Returns (bins (B, max_bins), counts (B, max_bins)); slots past the last
    non-empty bin have count 0.

    Implementation: one multi-operand `lax.sort` keyed by
    (position-if-nonempty else +inf).  XLA lowers row sorts to a vectorized
    bitonic network on TPU, ~8x faster than the scatter-based stream
    compaction it replaces (scatters lower to scalar loops).
    """
    B, E = bin_ids.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, E), 1)
    key = jnp.where(counts > 0, pos, jnp.int32(E))     # empties to the tail
    _, bins_s, counts_s = jax.lax.sort(
        (key, bin_ids, counts), dimension=-1, num_keys=1)
    # Tail entries carry their original counts, which are 0 by definition of
    # "empty", so no masking is needed.
    return bins_s[:, :max_bins], counts_s[:, :max_bins]


def gather_slabs(prefix_of_bins: jax.Array, counts_of_bins: jax.Array,
                 n_slabs: int, slab_size: int, max_vec_per_bin: int):
    """Assign fixed-size SLAB windows over the probed bins' CSR rows.

    TPU-first alternative to per-row candidate positions: each probed bin
    contributes ceil(min(cnt, cap)/S) slabs of S consecutive CSR rows, and
    slabs fill in bin (enumeration) order until the `n_slabs` budget.  The
    payload fetch then gathers n_slabs CONTIGUOUS (S, W) slices instead of
    n_slabs*S scattered rows — row gathers on TPU pay a fixed per-index
    cost, so this divides the dominant gather overhead by S while moving
    the same bytes (bins average far more than one row; see the occupancy
    histograms).  The reference's analog is the per-bin copy loop of
    getKVectorIDsKernelFast (PerturbationProTree.cu:4307-4419), which also
    walks bins, not rows.

    Returns (slab_starts (B, n_slabs) int32 CSR positions,
             slab_valid (B, n_slabs) int32 in [0, S]: valid rows per slab).
    Invalid slabs have slab_valid == 0 (starts clamped to 0).
    """
    B, nb = counts_of_bins.shape
    S = slab_size
    capped = jnp.minimum(counts_of_bins, max_vec_per_bin)
    spb = (capped + (S - 1)) // S                       # slabs per bin
    ends = jnp.cumsum(spb, axis=-1)
    starts = ends - spb
    total = ends[:, -1]

    # Same sort-merge slot assignment as gather_candidates, at slab
    # granularity, forwarding three per-bin values to the slots they own.
    big = jnp.int32(2**30)
    occupied = spb > 0
    seed_key = jnp.where(occupied, starts, big)
    grid = jax.lax.broadcasted_iota(jnp.int32, (B, n_slabs), 1)
    keys = jnp.concatenate([seed_key, grid], axis=-1)
    flags = jnp.concatenate(
        [jnp.zeros((B, nb), jnp.int32), jnp.ones((B, n_slabs), jnp.int32)],
        axis=-1)
    zeros_t = jnp.zeros((B, n_slabs), jnp.int32)
    v_prefix = jnp.concatenate([prefix_of_bins, zeros_t], axis=-1)
    v_sstart = jnp.concatenate([starts, zeros_t], axis=-1)
    v_capped = jnp.concatenate([capped, zeros_t], axis=-1)
    k_s, f_s, p_s, s_s, c_s = jax.lax.sort(
        (keys, flags, v_prefix, v_sstart, v_capped), dimension=-1,
        num_keys=2)
    is_seed = f_s == 0

    def fill_forward(l, r):
        (lp, ls, lc, lf) = l
        (rp, rs, rc, rf) = r
        keep = rf
        return (jnp.where(keep, rp, lp), jnp.where(keep, rs, ls),
                jnp.where(keep, rc, lc), lf | rf)

    p_f, s_f, c_f, _ = jax.lax.associative_scan(
        fill_forward, (p_s, s_s, c_s, is_seed), axis=-1)
    # compact the slot records back out (slot keys 0..n_slabs-1 sort first)
    _, p_o, s_o, c_o = jax.lax.sort(
        (jnp.where(is_seed, big, k_s), p_f, s_f, c_f), dimension=-1,
        num_keys=1)
    p_o, s_o, c_o = p_o[:, :n_slabs], s_o[:, :n_slabs], c_o[:, :n_slabs]
    t_rel = grid - s_o                                   # slab idx within bin
    slab_starts = p_o + t_rel * S
    slab_valid = jnp.clip(c_o - t_rel * S, 0, S)
    in_budget = grid < total[:, None]
    slab_valid = jnp.where(in_budget, slab_valid, 0)
    slab_starts = jnp.where(in_budget, slab_starts, 0)
    return slab_starts, slab_valid


def fetch_slab_rows(payload: jax.Array, slab_starts: jax.Array,
                    slab_valid: jax.Array, slab_size: int):
    """Gather (S, W) payload slices per slab -> per-row view + validity.

    payload: (N, W); slab_starts/slab_valid: (B, T).  Returns
    (rows (B, T*S, W), valid (B, T*S) bool).  Slabs near the end of the
    payload are shifted left so the slice stays in bounds; the validity
    window shifts with them (content is what matters downstream, not CSR
    position).
    """
    B, T = slab_starts.shape
    N, W = payload.shape
    S = slab_size
    eff = jnp.minimum(slab_starts, max(N - S, 0))
    shift = slab_starts - eff                            # >= 0, rarely != 0
    g = jax.lax.gather(
        payload, eff.reshape(B * T, 1),
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,)),
        slice_sizes=(min(S, N), W), mode="clip")
    rows = g.reshape(B, T, min(S, N), W)
    if S > N:    # degenerate tiny payload: pad to S
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, S - N), (0, 0)))
    i = jax.lax.broadcasted_iota(jnp.int32, (B, T, S), 2)
    valid = (i >= shift[..., None]) & (
        i < (shift + slab_valid)[..., None])
    return rows.reshape(B, T * S, W), valid.reshape(B, T * S)


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
    # slot.  Sort-merge formulation (scatters lower to scalar loops on TPU;
    # row sorts are vectorized bitonic networks):
    #   1. merge per-bin "seed" records (key = the bin's first slot, value =
    #      its prefix-start delta) with the slot grid (key = slot id), seeds
    #      winning ties so a slot that starts a bin sees that bin's delta;
    #   2. forward-fill deltas from seeds to the slots that follow them;
    #   3. compact the slot records back out (second sort) — they are already
    #      in slot order by key.
    delta = prefix_of_bins - starts                          # (B, nb)
    occupied = capped > 0
    big = jnp.int32(2**30)
    seed_key = jnp.where(occupied, starts, big)
    grid = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    keys = jnp.concatenate([seed_key, grid], axis=-1)        # (B, nb + K)
    flags = jnp.concatenate(          # 0 = seed (ties sort first), 1 = slot
        [jnp.zeros((B, nb), jnp.int32), jnp.ones((B, K), jnp.int32)],
        axis=-1)
    vals = jnp.concatenate([delta, jnp.zeros((B, K), jnp.int32)], axis=-1)
    k_s, f_s, v_s = jax.lax.sort((keys, flags, vals), dimension=-1,
                                 num_keys=2)
    is_seed = f_s == 0

    def fill_forward(l, r):
        lv, lf = l
        rv, rf = r
        return jnp.where(rf, rv, lv), lf | rf

    filled, _ = jax.lax.associative_scan(fill_forward, (v_s, is_seed),
                                         axis=-1)
    # Slot records have unique keys 0..K-1 < every seed's tail key, so after
    # re-sorting with seeds pushed to the back the first K entries are the
    # slots, in order.
    _, v_out = jax.lax.sort((jnp.where(is_seed, big, k_s), filled),
                            dimension=-1, num_keys=1)
    positions = grid + v_out[:, :K]
    valid = grid < total[:, None]
    return positions, valid
