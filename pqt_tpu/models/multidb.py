"""Multi-database (groupParts) variant: independent inverted files over
part groups.

Reference ProTree::buildMultiDB / selectMultiBinKernel /
getMultiKVectorIDsKernel (ProTree.cu:990-1058, 1352-1399, 1584-1654,
2936-3448): the p parts are split into g = p/group_parts groups, each group
gets its OWN inverted file over (c1*c2)^group_parts bins, queries probe
every group's file independently, and the candidate union (vectors found in
any group, deduplicated) is re-ranked.  Coarser per-group bins mean each
group recalls a superset along its own subspace — the classic multi-index
trade: higher candidate recall for more gather work.

Here each group is a full PQTDatabase (own CSR layout + payloads), probed
with the shared traversal machinery restricted to its parts.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import (PQTDatabase, _pad_chunk, encode_line_codes,
                               encode_part_codes, unpack_payload_cfg)
from pqt_tpu.models.query import (QueryResult, _mask_duplicate_candidates,
                                  _sorted_part_lists)
from pqt_tpu.models.tree import PQTree, line_tables
from pqt_tpu.ops import binning, distseq
from pqt_tpu.ops.linecodes import reconstruct_dists_idx


class MultiDatabase(NamedTuple):
    """g independent inverted files sharing one tree.

    Parts per group is cfg.p // n_groups (kept out of the pytree leaves so
    it stays static under jit).  Raw vectors (for exact re-rank) are shared
    across groups — original-id indexed, stored ONCE — and pair_occ is the
    per-group code-pair occupancy when group_parts == 2 (the pair filter
    applied to multi-DB probing).
    """
    databases: tuple            # tuple[PQTDatabase], one per group
    vectors: jax.Array = None   # optional (n, dim), original-id order
    pair_occ: jax.Array = None  # optional (g, radix^2) uint8

    @property
    def n_groups(self) -> int:
        return len(self.databases)


def build_multi_database(cfg: PQTConfig, tree: PQTree, data,
                         group_parts: int,
                         encode_chunk: int = 65536,
                         keep_vectors: bool = False,
                         spill_path=None) -> MultiDatabase:
    """Build one inverted file per part group (buildMultiDB equivalent).

    Vectors keep their NATIVE dtype end-to-end (uint8 stays uint8 — 4x HBM
    and host-RAM win, BASELINE.md r4); encoding casts per chunk only.
    With `spill_path`, each group's CSR payload lands in a disk memmap
    (`<spill_path>.g<i>`) instead of host RAM — the payload is the term
    that multiplies by g, so this bounds the multi-DB build's extra memory
    at the reference's own scale (buildMultiDB ProTree.cu:1584-1654 keeps
    every group's arrays in device memory instead).
    """
    assert cfg.p % group_parts == 0
    g = cfg.p // group_parts
    radix = cfg.part_radix

    data = np.asarray(data)
    if data.dtype not in (np.uint8, np.float32):
        data = data.astype(np.float32)
    n = data.shape[0]
    part_codes = np.empty((n, cfg.p), np.int32)
    codes = np.empty((n, cfg.line_parts), np.uint32)
    t3 = np.empty((n,), np.float32)
    for s in range(0, n, encode_chunk):
        e = min(n, s + encode_chunk)
        chunk = _pad_chunk(data[s:e], encode_chunk)
        part_codes[s:e] = np.asarray(
            encode_part_codes(cfg, tree, chunk))[: e - s]
        c_chunk, t_chunk = encode_line_codes(cfg, tree, chunk)
        codes[s:e] = np.asarray(c_chunk)[: e - s]
        t3[s:e] = np.asarray(t_chunk)[: e - s]

    from pqt_tpu.io import native
    from pqt_tpu.models.db import pack_payload_cfg
    packed = pack_payload_cfg(cfg, np.arange(n, dtype=np.int32), codes, t3)
    dbs = []
    pair_occ = None
    if group_parts == 2:
        pair_occ = np.zeros((g, radix * radix), np.uint8)
    for gi in range(g):
        sub = part_codes[:, gi * group_parts:(gi + 1) * group_parts]
        if pair_occ is not None:
            pair_occ[gi][np.unique(sub[:, 0] * radix + sub[:, 1])] = 1
        bin_ids = np.asarray(binning.hashed_bin_ids(
            jnp.asarray(sub), radix, cfg.hash_size))
        counts, prefix, order = native.build_csr(bin_ids, cfg.hash_size)
        if spill_path:
            pay = np.memmap(f"{spill_path}.g{gi}", np.int32, mode="w+",
                            shape=packed.shape)
            for s in range(0, n, encode_chunk):
                e = min(n, s + encode_chunk)
                pay[s:e] = packed[order[s:e]]
        else:
            pay = jnp.asarray(native.gather_rows(packed, order))
        dbs.append(PQTDatabase(
            prefix=jnp.asarray(prefix), counts=jnp.asarray(counts),
            payload=pay, pair_occ=None, vectors=None,
            prefix2=jnp.asarray(np.stack([prefix, prefix + counts], axis=1))))
    return MultiDatabase(
        databases=tuple(dbs),
        vectors=jnp.asarray(data) if keep_vectors else None,
        pair_occ=jnp.asarray(pair_occ) if pair_occ is not None else None)


def _group_bins(cfg: PQTConfig, sorted_d2, sorted_codes, counts,
                group_parts: int, group_idx: int, max_bins: int,
                pair_occ_g=None):
    """Enumerate + compact probed bins for one part group.

    `pair_occ_g` ((radix^2,) uint8, group_parts == 2 only): enumerated
    bins whose (part a, part b) code pair never occurs in the database are
    pruned before the occupancy gather — the pair filter applied to
    multi-DB probing (each group IS a pair, so the filter is exact here).
    """
    B = sorted_codes.shape[0]
    lo = group_idx * group_parts
    codes_g = sorted_codes[:, lo:lo + group_parts, :]       # (B, gp, L)
    L = codes_g.shape[-1]
    base = min(L, 16)
    n_enum = min(cfg.bin_enum_factor * max_bins, base ** group_parts)
    seq = distseq.static_sequence(base, group_parts)[:n_enum]
    onehot = np.zeros((group_parts, n_enum, base), np.float32)
    onehot[np.arange(group_parts)[:, None],
           np.arange(n_enum)[None, :], seq.T] = 1.0
    codes16 = codes_g[:, :, :base].astype(jnp.float32)
    part_codes = jnp.einsum("bpr,per->bpe", codes16, jnp.asarray(onehot),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST
                            ).astype(jnp.int32)
    part_codes_t = jnp.transpose(part_codes, (0, 2, 1))     # (B, E, gp)
    bin_ids = binning.hashed_bin_ids(
        part_codes_t, cfg.part_radix, cfg.hash_size)
    bin_counts = counts[bin_ids]
    if pair_occ_g is not None and group_parts == 2:
        pc = (part_codes_t[..., 0] * cfg.part_radix + part_codes_t[..., 1])
        bin_counts = jnp.where(pair_occ_g[pc] > 0, bin_counts, 0)
    return binning.compact_nonempty_bins(bin_ids, bin_counts, max_bins)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def query_multi_knn(cfg: PQTConfig, tree: PQTree, mdb: MultiDatabase,
                    queries: jax.Array, k: int,
                    exact_rerank: bool = False) -> QueryResult:
    """Probe every group's inverted file; re-rank the candidate union.

    The per-group probe budget is max_bins/g and candidate budget
    max_candidates/g so total work matches the single-DB path.  Duplicate
    candidates across groups are masked before top-k (the reference's
    occurrence-count dedup, ProTree.cu:3243-3310).  With
    `exact_rerank=True` (needs build_multi_database(keep_vectors=True))
    the deduped union is ranked by TRUE distance — the multi-DB analog of
    the perfect pass, which the reference's multi path lacks
    (getMultiKBestVectorsKernel reranks in-bin only, ProTree.cu:3374-3448).
    """
    # group count is pytree STRUCTURE (static under jit); the group_parts
    # int leaf would be traced, so derive gp from the structure.
    g = len(mdb.databases)
    gp = cfg.p // g
    queries = queries.astype(jnp.float32)
    sorted_d2, sorted_codes = _sorted_part_lists(cfg, tree, queries)
    per_bins = max(cfg.max_bins // g, 1)
    per_cand = max(cfg.max_candidates // g, 1)

    all_ids, all_a, all_b, all_lam, all_t3, all_valid = [], [], [], [], [], []
    for gi, db in enumerate(mdb.databases):
        occ_g = (mdb.pair_occ[gi]
                 if mdb.pair_occ is not None and cfg.pair_filter_enabled
                 and gp == 2 else None)
        bins, bin_counts = _group_bins(cfg, sorted_d2, sorted_codes,
                                       db.counts, gp, gi, per_bins, occ_g)
        prefix_of_bins = db.prefix[bins]
        positions, valid = binning.gather_candidates(
            prefix_of_bins, bin_counts, per_cand, cfg.max_vec_per_bin)
        safe_pos = jnp.where(valid, positions, 0)
        g_ids, g_a, g_b, g_lam, g_t3 = unpack_payload_cfg(
            cfg, db.payload[safe_pos])
        all_ids.append(g_ids)
        all_a.append(g_a)
        all_b.append(g_b)
        all_lam.append(g_lam)
        all_t3.append(g_t3)
        all_valid.append(valid)

    cand_ids = jnp.concatenate(all_ids, axis=1)
    cand_a = jnp.concatenate(all_a, axis=1)
    cand_b = jnp.concatenate(all_b, axis=1)
    cand_lam = jnp.concatenate(all_lam, axis=1)
    cand_t3 = jnp.concatenate(all_t3, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    q_line = line_tables(cfg, tree, queries)
    dists = reconstruct_dists_idx(cand_a, cand_b, cand_lam, q_line, cand_t3)
    dists = jnp.where(valid, dists, jnp.inf)
    # cross-group duplicates are expected; dedup keeps one survivor per id
    # and (reference semantics, ProTree.cu:3243-3310 getMultiKVectorIDs:
    # occurrence count ranks first) the survivor carries how many groups
    # found it — a vector recalled along several subspaces is likelier to
    # be a true neighbor than a one-group hit at similar line distance.
    from pqt_tpu.models.query import _duplicate_stats
    dup, occ = _duplicate_stats(cand_ids, valid)
    dists = jnp.where(dup, jnp.inf, dists)
    k_eff = min(k, cand_ids.shape[1])
    if exact_rerank:
        assert mdb.vectors is not None, \
            "exact_rerank needs build_multi_database(keep_vectors=True)"
        live = jnp.isfinite(dists)
        safe_ids = jnp.where(live, cand_ids, 0)
        vecs = mdb.vectors[safe_ids].astype(jnp.float32)
        diff = vecs - queries[:, None, :]
        dists = jnp.where(live, jnp.sum(diff * diff, axis=-1), jnp.inf)
        neg_top, top_idx = jax.lax.top_k(-dists, k_eff)
        top_ids = jnp.take_along_axis(cand_ids, top_idx, axis=-1)
        top_ids = jnp.where(jnp.isfinite(-neg_top), top_ids, -1)
        dists_out = -neg_top
    elif cfg.multidb_rank == "occurrence":
        # lexicographic (occurrences desc, line distance asc); +inf slots
        # (invalid or duplicate) always sort last via the finite flag.
        finite = jnp.isfinite(dists)
        key0 = (~finite).astype(jnp.int32)
        key1 = jnp.where(finite, -occ, 0)
        _, _, d_s, ids_s = jax.lax.sort(
            (key0, key1, dists, cand_ids), dimension=-1, num_keys=3)
        top_ids = ids_s[:, :k_eff]
        dists_out = d_s[:, :k_eff]
        top_ids = jnp.where(jnp.isfinite(dists_out), top_ids, -1)
    else:
        neg_top, top_idx = jax.lax.top_k(-dists, k_eff)
        top_ids = jnp.take_along_axis(cand_ids, top_idx, axis=-1)
        top_ids = jnp.where(jnp.isfinite(-neg_top), top_ids, -1)
        dists_out = -neg_top
    if k_eff < k:
        top_ids = jnp.pad(top_ids, ((0, 0), (0, k - k_eff)),
                          constant_values=-1)
        dists_out = jnp.pad(dists_out, ((0, 0), (0, k - k_eff)),
                            constant_values=jnp.inf)
    return QueryResult(indices=top_ids, dists=dists_out,
                       n_candidates=jnp.sum(valid, axis=-1))
