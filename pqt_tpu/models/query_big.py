"""BIG query path: two-stage pairwise bin selection for large probe budgets.

The reference's billion-scale query (queryBIGKNN / getBIGBins2D,
PerturbationProTree.cu:2839-3188, 3702-3778) pairs up the p parts, builds a
sorted list of the best `n_intermediate` 2D bins per part-pair using an
anisotropic traversal heuristic, then merges the two pair-lists with a second
2D traversal.  The heuristic exists because sorting thousands of candidate
sums per query inside one CUDA block is expensive.

On TPU, batched top-k over the FULL outer-sum tables is cheap, so both
stages use exact distance ordering instead of the anisotropic approximation
(strictly better bin ordering at the same probe budget; the anisotropic
sequence family is still available in ops/distseq.py).

Stage 1: per (query, pair) exact top-n_intermediate of d2[i] + d2[j] over
         the L x L rank grid (L = k1_query * c2).
Stage 2: exact ordering of the n_intermediate^2 pair-sum combinations,
         occupancy filtering, compaction to max_bins.

Requires p to be even (the reference hard-codes pairs (0,1) and (2,3)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import PQTDatabase
from pqt_tpu.models.query import (QueryResult, _mask_duplicate_candidates,
                                  _sorted_part_lists)
from pqt_tpu.models.tree import PQTree, line_tables
from pqt_tpu.ops import binning
from pqt_tpu.ops.linecodes import reconstruct_dists_idx


def _pair_merge(cfg: PQTConfig, sorted_d2, sorted_codes, n_intermediate):
    """Stage 1: exact top-n_intermediate 2D bins per part-pair.

    sorted_d2/sorted_codes: (B, p, L).  Returns
      pair_d2 (B, p//2, n_intermediate) ascending sums,
      pair_codes (B, p//2, n_intermediate, 2) the two parts' codes.
    """
    B, p, L = sorted_d2.shape
    assert p % 2 == 0, "BIG path needs an even part count"
    np_pairs = p // 2
    a_d2 = sorted_d2[:, 0::2, :]          # (B, np, L)
    b_d2 = sorted_d2[:, 1::2, :]
    sums = a_d2[..., :, None] + b_d2[..., None, :]     # (B, np, L, L)
    flat = sums.reshape(B, np_pairs, L * L)
    neg_top, sel = jax.lax.top_k(-flat, n_intermediate)
    i_idx = sel // L                       # rank in part 2k
    j_idx = sel % L                        # rank in part 2k+1
    a_codes = jnp.take_along_axis(sorted_codes[:, 0::2, :], i_idx, axis=-1)
    b_codes = jnp.take_along_axis(sorted_codes[:, 1::2, :], j_idx, axis=-1)
    return -neg_top, jnp.stack([a_codes, b_codes], axis=-1)


def _final_bins(cfg: PQTConfig, pair_d2, pair_codes, counts,
                bin_offset=None):
    """Stage 2: order the cross-product of the two pair-lists, filter, compact.

    pair_d2: (B, 2, M); pair_codes: (B, 2, M, 2).
    Returns (bins (B, max_bins) local slot ids, counts (B, max_bins)).
    """
    B, npair, M = pair_d2.shape
    assert npair == 2, "final merge expects exactly two part-pairs (p=4)"
    sums = pair_d2[:, 0, :, None] + pair_d2[:, 1, None, :]   # (B, M, M)
    flat = sums.reshape(B, M * M)
    n_enum = min(cfg.bin_enum_factor * cfg.max_bins, M * M)
    _, sel = jax.lax.top_k(-flat, n_enum)                    # ascending sums
    i_idx = sel // M
    j_idx = sel % M

    # Recover the four per-part codes of each enumerated bin.
    def pick(pair_slot, part_slot, idx):
        src = pair_codes[:, pair_slot, :, part_slot]         # (B, M)
        return jnp.take_along_axis(src, idx, axis=-1)        # (B, E)

    codes4 = jnp.stack(
        [pick(0, 0, i_idx), pick(0, 1, i_idx),
         pick(1, 0, j_idx), pick(1, 1, j_idx)], axis=-1)     # (B, E, 4)
    bin_ids = binning.hashed_bin_ids(codes4, cfg.part_radix, cfg.hash_size)

    local_size = counts.shape[0]
    if bin_offset is not None:
        bin_ids = bin_ids - bin_offset
    in_range = (bin_ids >= 0) & (bin_ids < local_size)
    safe_ids = jnp.where(in_range, bin_ids, 0)
    bin_counts = jnp.where(in_range, counts[safe_ids], 0)
    return binning.compact_nonempty_bins(safe_ids, bin_counts, cfg.max_bins)


def query_big_core(cfg: PQTConfig, tree: PQTree, prefix, counts, payload,
                   queries, k: int, n_intermediate: int = 256,
                   bin_offset=None):
    """Single-shard BIG query math (line re-rank)."""
    from pqt_tpu.models.db import unpack_payload_cfg

    queries = queries.astype(jnp.float32)
    sorted_d2, sorted_codes = _sorted_part_lists(cfg, tree, queries)
    pair_d2, pair_codes = _pair_merge(cfg, sorted_d2, sorted_codes,
                                      n_intermediate)
    bins, bin_counts = _final_bins(cfg, pair_d2, pair_codes, counts,
                                   bin_offset)
    prefix_of_bins = prefix[bins]
    positions, valid = binning.gather_candidates(
        prefix_of_bins, bin_counts, cfg.max_candidates, cfg.max_vec_per_bin)
    safe_pos = jnp.where(valid, positions, 0)
    cand_ids, a_idx, b_idx, lam, cand_t3 = unpack_payload_cfg(
        cfg, payload[safe_pos])
    q_line = line_tables(cfg, tree, queries)
    dists = reconstruct_dists_idx(a_idx, b_idx, lam, q_line, cand_t3)
    dists = jnp.where(valid, dists, jnp.inf)
    if cfg.dedup_candidates:
        dists = _mask_duplicate_candidates(cand_ids, valid, dists)
    k_eff = min(k, cfg.max_candidates)
    neg_top, top_idx = jax.lax.top_k(-dists, k_eff)
    top_ids = jnp.take_along_axis(cand_ids, top_idx, axis=-1)
    top_ids = jnp.where(jnp.isfinite(-neg_top), top_ids, -1)
    return top_ids, -neg_top, jnp.sum(valid, axis=-1)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def query_big_knn(cfg: PQTConfig, tree: PQTree, db: PQTDatabase,
                  queries: jax.Array, k: int,
                  n_intermediate: int = 256) -> QueryResult:
    """Batched BIG k-NN (queryBIGKNNRerank2 equivalent, line re-rank)."""
    top_ids, dists, n_cand = query_big_core(
        cfg, tree, db.prefix, db.counts, db.payload, queries, k,
        n_intermediate)
    k_eff = min(k, cfg.max_candidates)
    if k_eff < k:
        pad = k - k_eff
        top_ids = jnp.pad(top_ids, ((0, 0), (0, pad)), constant_values=-1)
        dists = jnp.pad(dists, ((0, 0), (0, pad)),
                        constant_values=jnp.inf)
    return QueryResult(indices=top_ids, dists=dists, n_candidates=n_cand)


@functools.partial(jax.jit, static_argnums=(0, 4, 5, 6))
def query_big_knn_perfect(cfg: PQTConfig, tree: PQTree, db: PQTDatabase,
                          queries: jax.Array, k: int, refine_factor: int = 8,
                          n_intermediate: int = 256) -> QueryResult:
    """BIG query + exact re-rank of the line-rerank survivors
    (queryBIGKNNRerankPerfect equivalent; needs db.vectors)."""
    assert db.vectors is not None
    k1 = min(k * refine_factor, cfg.max_candidates)
    stage1 = query_big_knn(cfg, tree, db, queries, k1, n_intermediate)
    safe_ids = jnp.maximum(stage1.indices, 0)
    cand_vecs = db.vectors[safe_ids].astype(jnp.float32)
    diff = cand_vecs - queries[:, None, :].astype(jnp.float32)
    exact = jnp.sum(diff * diff, axis=-1)
    exact = jnp.where(stage1.indices >= 0, exact, jnp.inf)
    k_eff = min(k, k1)
    neg_top, top_idx = jax.lax.top_k(-exact, k_eff)
    ids = jnp.take_along_axis(stage1.indices, top_idx, axis=-1)
    dists = -neg_top
    if k_eff < k:
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
        dists = jnp.pad(dists, ((0, 0), (0, k - k_eff)),
                        constant_values=jnp.inf)
    return QueryResult(indices=ids, dists=dists,
                       n_candidates=stage1.n_candidates)
