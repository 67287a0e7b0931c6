"""Multi-probe query pipeline, fully jitted with static shapes.

Stages (reference queryKNN, PerturbationProTree.cu:8179-8323):

  1. L1 tables + per-part k1 best cells (getKBestAssignment);
  2. line tables: query-segment distances to all c1 virtual centroids
     (getLineAssignment);
  3. per-part sorted (k1*c2) refinement lists (getKBestAssignment2);
  4. candidate-bin enumeration via the precomputed traversal sequence with
     occupancy filtering and compaction (selectBinKernelFast2);
  5. fixed-budget candidate gather from the CSR inverted file
     (getKVectorIDsKernelFast);
  6. line re-rank: approximate distances from packed codes via triangle
     reconstruction (rerankKernelFast) and final top-k;
  7. optional exact re-rank over the top candidates when the database keeps
     raw vectors (queryBIGKNNRerankPerfect analog).

Everything is static-shape: the data-dependent while-loops of the reference
become fixed enumeration budgets + masks, which is both TPU-compilable and
deterministic.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import PQTDatabase
from pqt_tpu.models.tree import (PQTree, level1_tables, level2_tables,
                                 line_tables)
from pqt_tpu.ops import binning, distseq
from pqt_tpu.ops.linecodes import reconstruct_dists, reconstruct_dists_idx


def _duplicate_stats(cand_ids, valid):
    """(dup_mask, occurrences) over each row's candidate ids.

    dup_mask is True on every repeat AFTER the first occurrence of an id;
    occurrences is the total count of that id in the row (on every slot).
    Invalid slots get unique sentinels so they never alias a real candidate.
    Sort-based (row sorts are vectorized bitonic networks on TPU; scatters
    lower to scalar loops, so the per-row scatter is a single int write).
    """
    B, K = cand_ids.shape
    sentinels = -(jnp.arange(K, dtype=jnp.int32) + 1)[None, :]
    uid = jnp.where(valid, cand_ids, sentinels)
    order = jnp.argsort(uid, axis=-1)
    sorted_uid = jnp.take_along_axis(uid, order, axis=-1)
    new_run = jnp.concatenate(
        [jnp.ones((B, 1), jnp.bool_),
         sorted_uid[:, 1:] != sorted_uid[:, :-1]], axis=-1)
    # run id per slot, then run lengths, broadcast back to every member.
    run_id = jnp.cumsum(new_run.astype(jnp.int32), axis=-1) - 1   # (B, K)
    run_len = jnp.zeros((B, K), jnp.int32).at[
        jnp.arange(B, dtype=jnp.int32)[:, None], run_id].add(1)
    occ_sorted = jnp.take_along_axis(run_len, run_id, axis=-1)
    row = jnp.arange(B, dtype=jnp.int32)[:, None]
    flat = (row * K + order).ravel()
    dup = (jnp.zeros((B * K,), jnp.bool_)
           .at[flat].set((~new_run).ravel()).reshape(B, K))
    occ = (jnp.zeros((B * K,), jnp.int32)
           .at[flat].set(occ_sorted.ravel()).reshape(B, K))
    return dup, occ


def _mask_duplicate_candidates(cand_ids, valid, dists):
    """Set the distance of repeated candidate ids to +inf.

    Duplicate ids refer to the same vector (identical distance), so any one
    survivor is equivalent.
    """
    dup, _ = _duplicate_stats(cand_ids, valid)
    return jnp.where(dup, jnp.inf, dists)


class QueryResult(NamedTuple):
    indices: jax.Array      # (B, k) int32 database vector ids
    dists: jax.Array        # (B, k) float32 (approx or exact, by pipeline)
    n_candidates: jax.Array  # (B,) int32 candidates actually re-ranked


def _sorted_part_lists(cfg: PQTConfig, tree: PQTree, queries: jax.Array):
    """Per-part candidate (l1, l2) lists sorted by refinement distance.

    Returns (sorted_d2 (B, p, L), sorted_codes (B, p, L)) with L = k1*c2,
    plus the line tables (B, lp, c1).  Mirrors getKBestAssignment2 +
    the per-part bitonic sort (PerturbationProTree.cu:1534-1693).
    """
    W = cfg.k1_query
    d1 = level1_tables(cfg, tree, queries)               # (B, p, c1)
    d2 = level2_tables(cfg, tree, queries)               # (B, p, c1, c2)
    _, l1_idx = jax.lax.top_k(-d1, W)                    # (B, p, W)
    cand_d2 = jnp.take_along_axis(d2, l1_idx[..., None], axis=2)
    B, p = cand_d2.shape[:2]
    L = W * cfg.c2
    flat_d2 = cand_d2.reshape(B, p, L)
    codes = (l1_idx[..., None] * cfg.c2 +
             jnp.arange(cfg.c2, dtype=jnp.int32)).reshape(B, p, L)
    order = jnp.argsort(flat_d2, axis=-1)
    sorted_d2 = jnp.take_along_axis(flat_d2, order, axis=-1)
    sorted_codes = jnp.take_along_axis(codes, order, axis=-1)
    return sorted_d2, sorted_codes


def _enumerate_bins(cfg: PQTConfig, sorted_d2, sorted_codes, counts,
                    bin_offset=None, pair_occ=None):
    """Traversal-sequence bin enumeration + occupancy compaction.

    `counts` may be a shard of the global occupancy table; `bin_offset`
    (traced scalar) is the global slot id of its first element — bins that
    fall outside the shard are treated as empty, which is exactly how a
    hash-range-sharded database partitions the probe work.

    When `pair_occ` is given ((p//2, radix^2) uint8 presence of each
    (part 2j, part 2j+1) code pair in the database), enumerated bins whose
    pair codes are absent are pruned BEFORE the per-bin occupancy lookup.
    Per-slot occupancy lookups are the pipeline's dominant cost on TPU
    (row gathers pay per index), and the pair filter needs only
    2 * base^2 tiny gathers per query + static one-hot matmuls, so pruning
    first cuts the expensive gather from E to ~slack*max_bins indices.
    A bin that passes both pair filters can still be empty (the parts may
    never co-occur), so true occupancy is still checked for survivors.
    A truly occupied bin always passes the filter itself, but the stage-1
    budget (`pair_filter_slack * max_bins` slots) can truncate late-ranked
    survivors — the same kind of fixed-budget cut the unfiltered path
    applies at max_bins.  With exact (unhashed) bin ids every nonempty bin
    passes, so the filtered probe set is a PREFIX SUBSET of the unfiltered
    one, identical when the slack budget covers the full enumeration.
    With hashing, collision-only bins are additionally skipped — a
    precision win over the reference's slot-count test
    (PerturbationProTree.cu:3374-3549).

    Returns (bins (B, max_bins) LOCAL slot ids, bin_counts (B, max_bins)).
    """
    B, p, L = sorted_codes.shape
    base = min(L, 16)                  # reference clamps to 16 (ProTree.cu:135)
    n_enum = min(cfg.bin_enum_factor * cfg.max_bins, base ** p)
    seq = distseq.static_sequence(base, p)[:n_enum]               # (E, p)

    # codes_of_bin[b, e] = sorted_codes[b, p, seq[e, p]].  The traversal
    # ranks are SHARED across the batch, so the lookup is a matmul with a
    # static one-hot matrix (codes fit exactly in f32) — MXU-fast, instead
    # of a 16M-element batched gather which XLA lowers poorly on TPU.
    onehot = np.zeros((p, n_enum, base), np.float32)
    onehot[np.arange(p)[:, None], np.arange(n_enum)[None, :], seq.T] = 1.0
    codes16 = sorted_codes[:, :, :base].astype(jnp.float32)
    part_codes = jnp.einsum(
        "bpr,per->bpe", codes16, jnp.asarray(onehot),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    bin_ids = binning.hashed_bin_ids(
        jnp.transpose(part_codes, (0, 2, 1)), cfg.part_radix, cfg.hash_size)
    local_size = counts.shape[0]
    if bin_offset is not None:
        bin_ids = bin_ids - bin_offset
    in_range = (bin_ids >= 0) & (bin_ids < local_size)
    safe_ids = jnp.where(in_range, bin_ids, 0)

    if pair_occ is not None and cfg.pair_filter_enabled:
        r = cfg.part_radix
        c16 = sorted_codes[:, :, :base]                      # (B, p, base)
        passes = in_range
        for j in range(p // 2):
            # occupancy of every candidate (rank_a, rank_b) pair cell
            pc = (c16[:, 2 * j, :, None] * r +
                  c16[:, 2 * j + 1, None, :]).reshape(B, base * base)
            occ_small = pair_occ[j][pc].astype(jnp.float32)  # (B, base^2)
            # broadcast cell occupancy to enumeration slots: slot e reads
            # cell (seq[e, 2j], seq[e, 2j+1]) — a STATIC map, so an MXU
            # matmul with a constant one-hot instead of a (B, E) gather.
            oh = np.zeros((base * base, n_enum), np.float32)
            oh[seq[:, 2 * j] * base + seq[:, 2 * j + 1],
               np.arange(n_enum)] = 1.0
            mask_e = jnp.einsum(
                "bc,ce->be", occ_small, jnp.asarray(oh),
                preferred_element_type=jnp.float32) > 0.5
            passes = passes & mask_e
        # Stage 1: compact by the (cheap, conservative) pair filter.
        m1 = min(n_enum, int(cfg.pair_filter_slack * cfg.max_bins))
        pos = jax.lax.broadcasted_iota(jnp.int32, (B, n_enum), 1)
        key = jnp.where(passes, pos, jnp.int32(n_enum))
        key_s, bins_s = jax.lax.sort((key, safe_ids), dimension=-1,
                                     num_keys=1)
        bins1 = bins_s[:, :m1]
        valid1 = key_s[:, :m1] < n_enum
        # Stage 2: true occupancy for survivors only, then final compaction.
        cnt1 = jnp.where(valid1, counts[jnp.where(valid1, bins1, 0)], 0)
        return binning.compact_nonempty_bins(bins1, cnt1, cfg.max_bins)

    bin_counts = jnp.where(in_range, counts[safe_ids], 0)    # gather (B, E)
    return binning.compact_nonempty_bins(safe_ids, bin_counts, cfg.max_bins)


# ---------------------------------------------------------------------------
# Pair pipeline ("pair"): the TPU-tuned enumeration.
#
# Gathers on TPU cost ~10ns per index + ~0.3ns per byte and dominate the
# query; the reference-shaped path spends three of them per enumerated bin
# (count, prefix, payload).  This pipeline restructures the probe so that
#   * bin ordering is computed with matmuls/top-k only (exact within each
#     part-PAIR, a 2D traversal across the two pairs — the same shape as the
#     reference's 2D BIG path, PerturbationProTree.cu:2839-3188, but with
#     exact pair ordering instead of the anisotropic heuristic);
#   * bin ids come from COMPOSING per-pair partial hash terms (the mixing
#     hash is a sum over parts, so pair partials add) — no per-bin gather;
#   * occupancy + CSR offset is ONE row gather from the (hash, 2) extent
#     table (prefix2);
#   * candidates are ONE row gather from the compact payload.
# ---------------------------------------------------------------------------


def _part_hash_weights(cfg: PQTConfig):
    """(p,) uint32 per-part weights s.t. bin id pre-image = sum_j w_j*code_j.

    Matches ops/binning.py exactly: exact mixed radix when the unhashed
    space fits the table, multiplicative mixing otherwise.
    """
    r = cfg.part_radix
    if r ** cfg.p <= cfg.hash_size and r ** cfg.p <= 2 ** 31:
        w = [r ** (cfg.p - 1 - j) for j in range(cfg.p)]
        return np.asarray(w, np.uint32), True
    mix = binning._MIX_MULTIPLIERS
    return np.asarray([mix[j % len(mix)] for j in range(cfg.p)],
                      np.uint32), False


def _finalize_bin_ids(cfg: PQTConfig, acc: jax.Array,
                      exact: bool) -> jax.Array:
    """uint32 partial-sum -> int32 bin slot id (binning.hashed_bin_ids tail)."""
    if exact:
        return acc.astype(jnp.int32)
    acc = acc * jnp.uint32(2654435761)
    shift = 32 - int(np.log2(cfg.hash_size))
    return (acc >> jnp.uint32(shift)).astype(jnp.int32)


def _pair_stage(cfg: PQTConfig, tree: PQTree, queries: jax.Array,
                pair_occ=None):
    """Per part-pair: the pair_top_m best (l1,l2)x(l1,l2) combinations.

    Returns (d_pairs (B, p/2, M) ascending sums, h_pairs (B, p/2, M) uint32
    partial bin terms).  Stage 1 of the pair pipeline: exact (approx_max_k)
    ordering within each pair, the analog of selectBinKernel2D2Parts
    (PerturbationProTree.cu:2914-3012) with true distance ordering.

    When `pair_occ` is given, pairs absent from the database get +inf
    distance so they sort behind every live pair (stage-2 then rarely
    enumerates them) — the pair-occupancy prefilter applied at the cheapest
    possible point (M indices per pair instead of per enumerated bin).
    """
    W = cfg.k1_query
    d1 = level1_tables(cfg, tree, queries)               # (B, p, c1)
    d2 = level2_tables(cfg, tree, queries)               # (B, p, c1, c2)
    _, l1_idx = jax.lax.top_k(-d1, W)                    # (B, p, W)
    cand_d2 = jnp.take_along_axis(d2, l1_idx[..., None], axis=2)
    B, p = cand_d2.shape[:2]
    L = W * cfg.c2
    flat_d2 = cand_d2.reshape(B, p, L)
    codes = (l1_idx[..., None] * cfg.c2 +
             jnp.arange(cfg.c2, dtype=jnp.int32)).reshape(B, p, L)
    weights, exact = _part_hash_weights(cfg)
    M = min(cfg.pair_top_m, L * L)
    r = cfg.part_radix

    d_pairs, h_pairs = [], []
    for j in range(p // 2):
        a, b = 2 * j, 2 * j + 1
        s = (flat_d2[:, a, :, None] + flat_d2[:, b, None, :]).reshape(B, -1)
        neg, idx = jax.lax.approx_max_k(-s, M)
        d = -neg
        # Recover the two parts' codes of each selected pair from idx
        # directly ((B, M) gathers from the (B, L) code lists) instead of
        # materializing (B, L*L) code/hash grids like the distance grid —
        # the grids cost 2 full uint32 passes over L^2 per pair.
        idx = idx.astype(jnp.int32)
        ca_sel = jnp.take_along_axis(codes[:, a, :], idx // L, axis=-1)
        cb_sel = jnp.take_along_axis(codes[:, b, :], idx % L, axis=-1)
        h_sel = (ca_sel.astype(jnp.uint32) * jnp.uint32(weights[a])
                 + cb_sel.astype(jnp.uint32) * jnp.uint32(weights[b]))
        if pair_occ is not None and cfg.pair_filter_enabled:
            occ = pair_occ[j][ca_sel * r + cb_sel]
            d = jnp.where(occ > 0, d, jnp.inf)
        d_s, h_s = jax.lax.sort((d, h_sel), dimension=-1, num_keys=1)
        d_pairs.append(d_s)
        h_pairs.append(h_s)
    return (jnp.stack(d_pairs, axis=1), jnp.stack(h_pairs, axis=1),
            exact)


def _enumerate_bins_pair(cfg: PQTConfig, h_pairs: jax.Array,
                         exact: bool) -> jax.Array:
    """Stage 2: 2D traversal over the two sorted pair lists -> bin slot ids.

    h_pairs: (B, n_pairs, M) uint32 partial terms, ascending by pair
    distance.  The traversal rank lookup rides the MXU as one-hot matmuls on
    the u16 halves of the partials (u32 does not fit f32 exactly; u16 does),
    so NO gather touches the (B, E) enumeration.  Analog of
    selectBinKernel2DFinal (PerturbationProTree.cu:3012-3188).
    """
    B, n_pairs, M = h_pairs.shape
    E = min(cfg.effective_enum_width, M * M if n_pairs == 2 else M)
    if n_pairs == 1:
        return _finalize_bin_ids(cfg, h_pairs[:, 0, :E], exact)
    assert n_pairs == 2, "pair pipeline supports p in (2, 4)"
    seq = distseq.pair_sequence(M, E)                     # (E, 2)
    onehots = []
    for col in range(2):
        oh = np.zeros((E, M), np.float32)
        oh[np.arange(E), seq[:, col]] = 1.0
        onehots.append(jnp.asarray(oh))
    hi = (h_pairs >> jnp.uint32(16)).astype(jnp.float32)   # (B, 2, M)
    lo = (h_pairs & jnp.uint32(0xFFFF)).astype(jnp.float32)

    def pick(x, col):
        # HIGHEST precision: the operands are exact u16 integers in f32, and
        # TPU's default matmul pass truncates inputs to bf16 (integer-exact
        # only up to 2^8) — the hash bits MUST survive the matmul exactly.
        return jnp.einsum("bm,em->be", x[:, col], onehots[col],
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

    hi_sum = (pick(hi, 0) + pick(hi, 1)).astype(jnp.uint32)
    lo_sum = (pick(lo, 0) + pick(lo, 1)).astype(jnp.uint32)
    acc = (hi_sum << jnp.uint32(16)) + lo_sum              # mod 2^32 exact
    return _finalize_bin_ids(cfg, acc, exact)


def _use_pallas_rerank(cfg: PQTConfig, K: int) -> bool:
    """Whether to reconstruct line distances with the fused Pallas kernel.

    MEASURED VERDICT (r4, TPU v5e, benchmarks/ab_rerank.py): the Pallas
    kernel is bit-correct on chip (top-1 agreement 1.0) but ~100x SLOWER
    than the XLA c1-unrolled compare-select (6.9 ms vs 0.06 ms per
    256-query batch) — Mosaic's per-block lane gathers cannot compete with
    XLA's fused vectorized lowering of the same math.  'auto' therefore
    resolves to XLA permanently; 'pallas' stays opt-in as a parity/lowering
    testbed (K is the realized candidate-row count, which slab mode can
    round up).
    """
    if cfg.rerank_kernel == "xla":
        return False
    from pqt_tpu.ops.pallas.rerank import BLOCK, supports
    ok = supports(cfg) and K % BLOCK == 0
    if cfg.rerank_kernel == "pallas":
        if not ok:
            raise ValueError(
                "rerank_kernel='pallas' needs the compact payload and "
                f"candidate count ({K}) % {BLOCK} == 0")
        if jax.default_backend() != "tpu":
            raise ValueError(
                "rerank_kernel='pallas' requires a TPU backend (Mosaic "
                f"lowering); current backend is '{jax.default_backend()}'. "
                "Use rerank_kernel='xla' here.")
        return True
    # auto = XLA by measurement (see docstring).
    return False


def _probe_bins(cfg: PQTConfig, bins: jax.Array, prefix2: jax.Array,
                bin_offset=None):
    """Occupancy probe + compaction: ONE extent-row gather per enumerated bin.

    bins: (B, E) slot ids.  prefix2: (local_hash, 2) int32 (start, end).
    Returns (start (B, max_bins), count (B, max_bins)) of the first max_bins
    non-empty probed bins, in enumeration order.

    Closed experiment (r3, TPU v5e): a Pallas kernel holding the whole
    extent table in VMEM cannot lower — Mosaic has no general vector
    gather from VMEM ("Cannot do int indexing on TPU"), only lane-dim
    take_along_axis, and a 2^20-slot table gather cannot be decomposed
    into lane+sublane gathers without a sort.  The XLA row gather below IS
    the hardware's native scattered-load path (~7 ns/index measured,
    benchmarks/ab_query.py), so the kernel was retired in r4.
    """
    B, E = bins.shape
    local = prefix2.shape[0]
    if bin_offset is not None:
        bins = bins - bin_offset
    in_range = (bins >= 0) & (bins < local)
    safe = jnp.where(in_range, bins, 0)
    ext = prefix2[safe]                                    # (B, E, 2) gather
    start = ext[..., 0]
    cnt = jnp.where(in_range, ext[..., 1] - ext[..., 0], 0)
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, E), 1)
    key = jnp.where(cnt > 0, pos, jnp.int32(E))
    _, start_s, cnt_s = jax.lax.sort((key, start, cnt), dimension=-1,
                                     num_keys=1)
    nb = min(cfg.max_bins, E)
    return start_s[:, :nb], cnt_s[:, :nb]


def query_core_pair(cfg: PQTConfig, tree: PQTree, prefix2, payload,
                    queries, k: int, bin_offset=None, pair_occ=None,
                    want_candidates: bool = False):
    """Single-shard pair-pipeline query math over raw CSR arrays.

    Returns (cand_ids (B, k), dists (B, k), n_candidates (B,)); -1 ids mark
    missing results.  With want_candidates=True, returns the full candidate
    set (B, max_candidates) before top-k instead (for exact re-rank), plus
    each candidate's CSR position (for position-indexed re-fetches, e.g.
    the out-of-core refine path's vectors_csr gather).
    """
    from pqt_tpu.models.db import unpack_payload_cfg

    queries = queries.astype(jnp.float32)
    d_pairs, h_pairs, exact = _pair_stage(cfg, tree, queries, pair_occ)
    bins = _enumerate_bins_pair(cfg, h_pairs, exact)
    start, cnt = _probe_bins(cfg, bins, prefix2, bin_offset)
    rows, valid, positions, _ = _collect_rows(cfg, payload, start, cnt)
    cand_ids = rows[..., 0]
    q_line = line_tables(cfg, tree, queries)               # (B, lp, c1)
    if _use_pallas_rerank(cfg, rows.shape[1]):
        from pqt_tpu.ops.pallas.rerank import rerank_fused
        q_pad = jnp.pad(q_line, ((0, 0), (0, 0), (0, 128 - cfg.c1)))
        dists = rerank_fused(rows.transpose(0, 2, 1), q_pad)
    else:
        _, a_idx, b_idx, lam, cand_t3 = unpack_payload_cfg(cfg, rows)
        dists = reconstruct_dists_idx(a_idx, b_idx, lam, q_line, cand_t3)
    dists = jnp.where(valid, dists, jnp.inf)
    if cfg.dedup_candidates:
        dists = _mask_duplicate_candidates(cand_ids, valid, dists)
    if want_candidates:
        return cand_ids, dists, jnp.sum(valid, axis=-1), positions
    k_eff = min(k, dists.shape[-1])
    neg_top, top_idx = jax.lax.top_k(-dists, k_eff)
    top_ids = jnp.take_along_axis(cand_ids, top_idx, axis=-1)
    top_ids = jnp.where(jnp.isfinite(-neg_top), top_ids, -1)
    return top_ids, -neg_top, jnp.sum(valid, axis=-1)


def _collect_rows(cfg: PQTConfig, payload, start, cnt, *extra_tables):
    """Candidate rows from probed-bin extents, by the configured gather mode.

    start/cnt: (B, nb) CSR start + occupancy of each probed bin (in
    enumeration order).  Returns (rows (B, K, W), valid (B, K),
    positions (B, K) int32 CSR row index of each candidate, extra_rows)
    where K = max_candidates (rows mode) or its slab-rounded size, and
    extra_rows fetches the same row windows from each array in
    `extra_tables` (e.g. CSR-ordered raw vectors for exact re-rank).
    The positions let a downstream stage re-fetch rows from ANY
    CSR-ordered table (e.g. the refine path's exact re-rank over a
    spilled database's vectors_csr).

    "slabs" mode fetches contiguous slab_size-row slices per bin — the same
    bytes in ~1/slab_size the gather indices (see binning.gather_slabs).
    """
    if cfg.gather_mode == "slabs":
        S = cfg.slab_size
        T = -(-cfg.max_candidates // S)
        slab_starts, slab_valid = binning.gather_slabs(
            start, cnt, T, S, cfg.max_vec_per_bin)
        rows, valid = binning.fetch_slab_rows(payload, slab_starts,
                                              slab_valid, S)
        extra = tuple(
            binning.fetch_slab_rows(t, slab_starts, slab_valid, S)[0]
            for t in extra_tables)
        # same end-shift as fetch_slab_rows: row i of slab t sits at
        # CSR position min(start, N-S) + i
        B, T_ = slab_starts.shape
        eff = jnp.minimum(slab_starts, max(payload.shape[0] - S, 0))
        positions = (eff[..., None] +
                     jax.lax.broadcasted_iota(jnp.int32, (B, T_, S), 2)
                     ).reshape(B, T_ * S)
        return rows, valid, positions, extra
    positions, valid = binning.gather_candidates(
        start, cnt, cfg.max_candidates, cfg.max_vec_per_bin)
    safe_pos = jnp.where(valid, positions, 0)
    rows = payload[safe_pos]
    extra = tuple(t[safe_pos] for t in extra_tables)
    return rows, valid, safe_pos, extra


def query_core_exact(cfg: PQTConfig, tree: PQTree, prefix2, payload,
                     vectors_csr, queries, k: int, bin_offset=None,
                     pair_occ=None):
    """Single-shard EXACT re-rank query over raw CSR arrays.

    Like query_core_pair but ranks every gathered candidate by its TRUE
    squared distance, reading `vectors_csr` — raw vectors laid out in CSR
    ORDER (position-indexed, same order as `payload`), so a hash-range shard
    of the database can carry the matching contiguous vector slice.  The
    perfect-rerank analog of rerankBIGKernelPerfect
    (PerturbationProTree.cu:5532-5619), shardable because no original-id
    indexed array is needed.
    """
    queries = queries.astype(jnp.float32)
    if cfg.pair_pipeline_enabled:
        _, h_pairs, exact = _pair_stage(cfg, tree, queries, pair_occ)
        bins = _enumerate_bins_pair(cfg, h_pairs, exact)
        start, cnt = _probe_bins(cfg, bins, prefix2, bin_offset)
    else:
        sorted_d2, sorted_codes = _sorted_part_lists(cfg, tree, queries)
        counts = prefix2[:, 1] - prefix2[:, 0]
        bins, cnt = _enumerate_bins(cfg, sorted_d2, sorted_codes, counts,
                                    bin_offset, pair_occ)
        start = prefix2[bins, 0]
    rows, valid, _, (vec_rows,) = _collect_rows(cfg, payload, start, cnt,
                                                vectors_csr)
    cand_ids = rows[..., 0]
    vecs = vec_rows.astype(jnp.float32)                    # (B, K, dim)
    diff = vecs - queries[:, None, :]
    dists = jnp.sum(diff * diff, axis=-1)
    dists = jnp.where(valid, dists, jnp.inf)
    if cfg.dedup_candidates:
        dists = _mask_duplicate_candidates(cand_ids, valid, dists)
    k_eff = min(k, dists.shape[-1])
    neg_top, top_idx = jax.lax.top_k(-dists, k_eff)
    top_ids = jnp.take_along_axis(cand_ids, top_idx, axis=-1)
    top_ids = jnp.where(jnp.isfinite(-neg_top), top_ids, -1)
    return top_ids, -neg_top, jnp.sum(valid, axis=-1)


def query_core(cfg: PQTConfig, tree: PQTree, prefix, counts, payload,
               queries, k: int, bin_offset=None, pair_occ=None,
               want_candidates: bool = False):
    """Shared single-shard query math over raw CSR arrays.

    prefix/counts are (local) occupancy tables (prefix rebased to the local
    payload array); payload is the (local) CSR-ordered packed payload
    (see PQTDatabase).  Returns (cand_ids (B, k), dists (B, k),
    n_candidates (B,)) with line re-ranking; -1 ids mark missing results.
    With want_candidates=True, returns the pre-top-k candidate set plus
    CSR positions instead (same contract as query_core_pair).
    """
    from pqt_tpu.models.db import unpack_payload_cfg

    queries = queries.astype(jnp.float32)
    sorted_d2, sorted_codes = _sorted_part_lists(cfg, tree, queries)
    bins, bin_counts = _enumerate_bins(cfg, sorted_d2, sorted_codes, counts,
                                       bin_offset, pair_occ)
    prefix_of_bins = prefix[bins]
    rows, valid, positions, _ = _collect_rows(cfg, payload, prefix_of_bins,
                                              bin_counts)
    cand_ids, a_idx, b_idx, lam, cand_t3 = unpack_payload_cfg(cfg, rows)
    q_line = line_tables(cfg, tree, queries)          # (B, lp, c1)
    dists = reconstruct_dists_idx(a_idx, b_idx, lam, q_line, cand_t3)
    dists = jnp.where(valid, dists, jnp.inf)
    if cfg.dedup_candidates:
        dists = _mask_duplicate_candidates(cand_ids, valid, dists)
    if want_candidates:
        return cand_ids, dists, jnp.sum(valid, axis=-1), positions
    k_eff = min(k, dists.shape[-1])
    neg_top, top_idx = jax.lax.top_k(-dists, k_eff)
    top_ids = jnp.take_along_axis(cand_ids, top_idx, axis=-1)
    top_ids = jnp.where(jnp.isfinite(-neg_top), top_ids, -1)
    return top_ids, -neg_top, jnp.sum(valid, axis=-1)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def query_knn(cfg: PQTConfig, tree: PQTree, db: PQTDatabase,
              queries: jax.Array, k: int, exact_rerank: bool = False
              ) -> QueryResult:
    """Batched approximate k-NN (queryKNN / queryBIGKNNRerank equivalent).

    queries: (B, dim).  Returns ids sorted by reconstructed (or exact)
    distance.  `exact_rerank=True` requires db.vectors (perfect-rerank path).
    """
    queries = queries.astype(jnp.float32)
    if exact_rerank:
        assert db.vectors is not None or db.vectors_csr is not None, \
            "exact rerank needs keep_vectors=True"
        if db.vectors is None:
            # Out-of-core builds spill raw vectors in CSR order; the
            # position-indexed exact core reads them directly.
            top_ids, top_dists, n_cand = query_core_exact(
                cfg, tree, db.prefix2, db.payload, db.vectors_csr,
                queries, k, pair_occ=db.pair_occ)
            k_eff = top_ids.shape[-1]
        else:
            if cfg.pair_pipeline_enabled:
                cand_ids, line_d, _, _ = query_core_pair(
                    cfg, tree, db.prefix2, db.payload, queries, k,
                    pair_occ=db.pair_occ, want_candidates=True)
                valid = jnp.isfinite(line_d)
            else:
                sorted_d2, sorted_codes = _sorted_part_lists(cfg, tree,
                                                             queries)
                bins, bin_counts = _enumerate_bins(
                    cfg, sorted_d2, sorted_codes, db.counts,
                    pair_occ=db.pair_occ)
                prefix_of_bins = db.prefix[bins]
                positions, valid = binning.gather_candidates(
                    prefix_of_bins, bin_counts, cfg.max_candidates,
                    cfg.max_vec_per_bin)
                safe_pos = jnp.where(valid, positions, 0)
                cand_ids = db.payload[safe_pos, 0]        # (B, K)
            safe_ids = jnp.where(valid, cand_ids, 0)
            cand_vecs = db.vectors[safe_ids].astype(jnp.float32)  # by id
            diff = cand_vecs - queries[:, None, :]
            dists = jnp.sum(diff * diff, axis=-1)
            dists = jnp.where(valid, dists, jnp.inf)
            if cfg.dedup_candidates:
                dists = _mask_duplicate_candidates(cand_ids, valid, dists)
            k_eff = min(k, cfg.max_candidates)
            neg_top, top_idx = jax.lax.top_k(-dists, k_eff)
            top_ids = jnp.take_along_axis(cand_ids, top_idx, axis=-1)
            top_ids = jnp.where(jnp.isfinite(-neg_top), top_ids, -1)
            top_dists = -neg_top
            n_cand = jnp.sum(valid, axis=-1)
    else:
        if cfg.pair_pipeline_enabled:
            top_ids, top_dists, n_cand = query_core_pair(
                cfg, tree, db.prefix2, db.payload, queries, k,
                pair_occ=db.pair_occ)
        else:
            top_ids, top_dists, n_cand = query_core(
                cfg, tree, db.prefix, db.counts, db.payload, queries, k,
                pair_occ=db.pair_occ)
        k_eff = min(k, cfg.max_candidates)
    if k_eff < k:    # requested more than the candidate budget: pad
        pad = k - k_eff
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
        top_dists = jnp.pad(top_dists, ((0, 0), (0, pad)),
                            constant_values=jnp.inf)
    return QueryResult(indices=top_ids, dists=top_dists,
                       n_candidates=n_cand)


@functools.partial(jax.jit, static_argnums=(0,))
def query_candidates(cfg: PQTConfig, tree: PQTree, db: PQTDatabase,
                     queries: jax.Array):
    """The raw gathered candidate set (before any re-rank).

    Returns (cand_ids (B, max_candidates) int32, valid (B, max_candidates)
    bool).  Used to measure candidate recall (the R_total ceiling of the
    reference's sweep, test/test1B.cpp:984-1020).
    """
    queries = queries.astype(jnp.float32)
    if cfg.pair_pipeline_enabled:
        cand_ids, line_d, _, _ = query_core_pair(
            cfg, tree, db.prefix2, db.payload, queries, 0,
            pair_occ=db.pair_occ, want_candidates=True)
        return cand_ids, jnp.isfinite(line_d)
    sorted_d2, sorted_codes = _sorted_part_lists(cfg, tree, queries)
    bins, bin_counts = _enumerate_bins(cfg, sorted_d2, sorted_codes,
                                       db.counts, pair_occ=db.pair_occ)
    prefix_of_bins = db.prefix[bins]
    positions, valid = binning.gather_candidates(
        prefix_of_bins, bin_counts, cfg.max_candidates, cfg.max_vec_per_bin)
    safe_pos = jnp.where(valid, positions, 0)
    cand_ids = db.payload[safe_pos, 0]
    return jnp.where(valid, cand_ids, -1), valid


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def query_knn_refine(cfg: PQTConfig, tree: PQTree, db: PQTDatabase,
                     queries: jax.Array, k: int, refine_factor: int = 8,
                     k_line: Optional[int] = None) -> QueryResult:
    """Two-stage query: line re-rank to k*refine_factor, then exact re-rank.

    The analog of queryBIGKNNRerank2 followed by the perfect pass
    (PerturbationProTree.cu:8596-8795): cheap codes prune, exact distances
    decide.  Works with either vector layout:

      * db.vectors (in-RAM build): stage-2 gathers by ORIGINAL id;
      * db.vectors_csr only (spilled/out-of-core build): stage 1 carries
        each surviving candidate's CSR POSITION through the line top-k, and
        stage 2 gathers `vectors_csr[position]` — no id-indexed vector
        array is ever materialized, so the billion-path database serves
        its fastest accurate mode directly (the same storage the
        reference's big pipelines re-rank from, test1B.cpp:1121-1125).
    """
    if db.vectors is None and db.vectors_csr is None:
        raise ValueError("query_knn_refine needs raw vectors: build with "
                         "keep_vectors=True (in-RAM or spilled)")
    queries = queries.astype(jnp.float32)
    k1 = k_line or (k * refine_factor)
    if db.vectors is not None:
        stage1 = query_knn(cfg, tree, db, queries, k1, False)
        # Exact distances only for the surviving k1 candidates (db.vectors
        # is indexed by original id).
        safe_ids = jnp.maximum(stage1.indices, 0)
        cand_vecs = db.vectors[safe_ids].astype(jnp.float32)
        ids1, n_cand = stage1.indices, stage1.n_candidates
    else:
        # CSR-position refine for spilled databases.
        if cfg.pair_pipeline_enabled:
            cand_ids, line_d, n_cand, pos = query_core_pair(
                cfg, tree, db.prefix2, db.payload, queries, 0,
                pair_occ=db.pair_occ, want_candidates=True)
        else:
            cand_ids, line_d, n_cand, pos = query_core(
                cfg, tree, db.prefix, db.counts, db.payload, queries, 0,
                pair_occ=db.pair_occ, want_candidates=True)
        k1_eff = min(k1, line_d.shape[-1])
        neg1, idx1 = jax.lax.top_k(-line_d, k1_eff)
        ids1 = jnp.take_along_axis(cand_ids, idx1, axis=-1)
        pos1 = jnp.take_along_axis(pos, idx1, axis=-1)
        ids1 = jnp.where(jnp.isfinite(-neg1), ids1, -1)
        cand_vecs = db.vectors_csr[
            jnp.where(ids1 >= 0, pos1, 0)].astype(jnp.float32)
    diff = cand_vecs - queries[:, None, :]
    exact = jnp.sum(diff * diff, axis=-1)
    exact = jnp.where(ids1 >= 0, exact, jnp.inf)
    k_eff = min(k, exact.shape[-1])
    neg_top, top_idx = jax.lax.top_k(-exact, k_eff)
    ids = jnp.take_along_axis(ids1, top_idx, axis=-1)
    ids = jnp.where(jnp.isfinite(-neg_top), ids, -1)
    dists = -neg_top
    if k_eff < k:
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        dists = jnp.pad(dists, ((0, 0), (0, k - k_eff)),
                        constant_values=jnp.inf)
    return QueryResult(indices=ids, dists=dists, n_candidates=n_cand)
