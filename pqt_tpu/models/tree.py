"""Two-level product-quantization tree: codebooks + training.

Structure (reference: ProTree::createTree ProTree.cu:457-510,
PerturbationProTree.cu:274-303; CPU twin treequantizer.hpp:155-177):

  * level 1: per-part codebook cb1 (p, c1, vl) — product k-means;
  * level 2: for every (part, l1-cell), a refinement codebook trained on the
    raw sub-vectors of that cell's population, cb2 (p, c1, c2, vl).

TPU-first deviations from the reference:
  * all c1*p level-2 sub-k-means run as ONE vmapped masked-k-means program
    instead of sequential launches;
  * "virtual" full-dim L1 centroids (c1, dim) — the concatenation of each
    part's c-th centroid, used by line-code geometry (treequantizer.hpp:640-661)
    — are precomputed once, along with the per-line-part centroid-pair
    distance table.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.kmeans import lbg_kmeans
from pqt_tpu.ops.distance import (centroid_pair_sqdist, part_sqdist_tables,
                                  subpart_sqdist_tables)


class PQTree(NamedTuple):
    """Trained tree. All leaves are jax arrays; the tree is a pytree."""
    cb1: jax.Array          # (p, c1, vl)
    cb2: jax.Array          # (p, c1, c2, vl)
    centroids_full: jax.Array   # (c1, dim) virtual full-dim L1 centroids
    pair_dists: jax.Array   # (line_parts, c1, c1) centroid-pair sq distances

    @classmethod
    def from_codebooks(cls, cfg: PQTConfig, cb1, cb2) -> "PQTree":
        p, c1, vl = cb1.shape
        centroids_full = jnp.transpose(cb1, (1, 0, 2)).reshape(c1, p * vl)
        pair_dists = centroid_pair_sqdist(centroids_full, cfg.line_parts)
        return cls(cb1=cb1, cb2=cb2, centroids_full=centroids_full,
                   pair_dists=pair_dists)


def _train_level1(cfg: PQTConfig, data: jax.Array, key):
    """Per-part L1 codebooks: p independent k-means over part sub-vectors."""
    n = data.shape[0]
    parts = data.reshape(n, cfg.p, cfg.vl).transpose(1, 0, 2)  # (p, n, vl)
    keys = jax.random.split(key, cfg.p)

    def one(part_data, k):
        return lbg_kmeans(
            part_data, None, cfg.c1, iters=cfg.kmeans_iters,
            churn_tol=cfg.kmeans_churn_tol, move_tol=cfg.kmeans_move_tol,
            split_epsilon=cfg.split_epsilon, key=k, init=cfg.kmeans_init)

    cb1, assign = jax.vmap(one)(parts, keys)    # (p, c1, vl), (p, n)
    return cb1, assign.transpose(1, 0)          # assign -> (n, p)


def _train_level2(cfg: PQTConfig, data: jax.Array, assign1: jax.Array, key):
    """Refinement codebooks for every (part, l1-cell), batched via masking."""
    n = data.shape[0]
    parts = data.reshape(n, cfg.p, cfg.vl).transpose(1, 0, 2)  # (p, n, vl)
    # masks[p, c, n]: vector n belongs to cell (p, c).
    masks = (assign1.transpose(1, 0)[:, None, :] ==
             jnp.arange(cfg.c1, dtype=jnp.int32)[None, :, None])
    keys = jax.random.split(key, cfg.p * cfg.c1).reshape(cfg.p, cfg.c1, 2)

    def one_cell(part_data, mask, k):
        c, _ = lbg_kmeans(
            part_data, mask, cfg.c2, iters=cfg.kmeans_iters,
            churn_tol=cfg.kmeans_churn_tol, move_tol=cfg.kmeans_move_tol,
            split_epsilon=cfg.split_epsilon, key=k, init=cfg.kmeans_init)
        return c

    # vmap over cells (data shared), then over parts.
    per_part = jax.vmap(one_cell, in_axes=(None, 0, 0))
    cb2 = jax.vmap(per_part)(parts, masks, keys)   # (p, c1, c2, vl)
    return cb2


def train_tree(cfg: PQTConfig, train_data, key=None) -> PQTree:
    """Train the full two-level tree (createTree equivalent).

    train_data: (n, dim) array-like; uint8 inputs are cast to float32 the way
    the reference's FileReader does (utils/filereader.hpp:136-178).
    """
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    data = jnp.asarray(train_data, jnp.float32)
    if cfg.train_subsample and data.shape[0] > cfg.train_subsample:
        sub_key, key = jax.random.split(key)
        sel = jax.random.choice(sub_key, data.shape[0],
                                (cfg.train_subsample,), replace=False)
        data = data[sel]
    k1, k2 = jax.random.split(key)
    cb1, assign1 = _train_level1(cfg, data, k1)
    cb2 = _train_level2(cfg, data, assign1, k2)
    return PQTree.from_codebooks(cfg, cb1, cb2)


def mark_dense_vectors(cfg: PQTConfig, assign1: jax.Array,
                       percent: float = 0.3) -> jax.Array:
    """True for vectors in the densest L1 bins holding `percent` of samples.

    Reference createTreeSplitSparse / calcL1Histogram / markSparseVectors
    (ProTree.cu:512-706): the full-vector L1 bin is the mixed-radix combo of
    the p level-1 assignments; bins are ranked by occupancy and the top bins
    covering `percent` of the population are "dense".
    """
    n, p = assign1.shape
    n_bins = cfg.c1 ** p
    bin_id = assign1[:, 0].astype(jnp.int32)
    for j in range(1, p):
        bin_id = bin_id * cfg.c1 + assign1[:, j].astype(jnp.int32)
    hist = jnp.zeros((n_bins,), jnp.int32).at[bin_id].add(1)
    order = jnp.argsort(-hist)                       # densest first
    sorted_hist = hist[order]
    cum = jnp.cumsum(sorted_hist)
    # bins needed to cover percent*n samples (inclusive of the crossing bin)
    n_dense_bins = jnp.sum(cum < percent * n) + 1
    rank_of_bin = jnp.zeros((n_bins,), jnp.int32).at[order].set(
        jnp.arange(n_bins, dtype=jnp.int32))
    dense_bin = rank_of_bin < n_dense_bins
    return dense_bin[bin_id]


def mark_dense_vectors_for(cfg: PQTConfig, tree: PQTree, data,
                           percent: float = 0.3,
                           chunk: int = 1 << 17) -> jax.Array:
    """Dense-population mask for arbitrary `data` under a trained L1.

    Chunked L1 assignment against tree.cb1, then the same densest-bins
    ranking as `mark_dense_vectors` — used when the split tree was trained
    on a subsample but the full dataset must be routed into the
    dense/sparse member databases (test1B modes 5/6 route the build
    population the same way, markSparseVectors ProTree.cu:570-639).
    """
    data = np.asarray(data)
    assigns = []
    for s in range(0, data.shape[0], chunk):
        x = jnp.asarray(data[s:s + chunk], jnp.float32)
        d1 = level1_tables(cfg, tree, x)             # (B, p, c1)
        assigns.append(np.asarray(jnp.argmin(d1, axis=-1), np.int32))
    assign1 = jnp.asarray(np.concatenate(assigns))
    return mark_dense_vectors(cfg, assign1, percent)


def train_tree_split(cfg: PQTConfig, train_data, percent: float = 0.3,
                     key=None):
    """Sparse/dense split training (createTreeSplitSparse, ProTree.cu:641-706).

    Trains ONE shared L1 codebook, then two sets of refinement codebooks:
    one fitted on the dense population (vectors in the busiest L1 bins
    holding `percent` of samples) and one on the sparse remainder.

    Returns (dense_tree, sparse_tree, dense_mask) where dense_mask applies
    to the (possibly subsampled) training set order.
    """
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    data = jnp.asarray(train_data, jnp.float32)
    k1, k2a, k2b = jax.random.split(key, 3)
    cb1, assign1 = _train_level1(cfg, data, k1)
    dense_mask = mark_dense_vectors(cfg, assign1, percent)

    def level2_with_population(pop_mask, key):
        n = data.shape[0]
        parts = data.reshape(n, cfg.p, cfg.vl).transpose(1, 0, 2)
        cell = (assign1.transpose(1, 0)[:, None, :] ==
                jnp.arange(cfg.c1, dtype=jnp.int32)[None, :, None])
        masks = cell & pop_mask[None, None, :]
        keys = jax.random.split(key, cfg.p * cfg.c1).reshape(cfg.p, cfg.c1, 2)

        def one_cell(part_data, mask, k):
            c, _ = lbg_kmeans(
                part_data, mask, cfg.c2, iters=cfg.kmeans_iters,
                churn_tol=cfg.kmeans_churn_tol, move_tol=cfg.kmeans_move_tol,
                split_epsilon=cfg.split_epsilon, key=k, init=cfg.kmeans_init)
            return c

        per_part = jax.vmap(one_cell, in_axes=(None, 0, 0))
        return jax.vmap(per_part)(parts, masks, keys)

    cb2_dense = level2_with_population(dense_mask, k2a)
    cb2_sparse = level2_with_population(~dense_mask, k2b)
    return (PQTree.from_codebooks(cfg, cb1, cb2_dense),
            PQTree.from_codebooks(cfg, cb1, cb2_sparse),
            dense_mask)


# ---------------------------------------------------------------------------
# Distance-table helpers shared by encode and query paths.
# ---------------------------------------------------------------------------

def level1_tables(cfg: PQTConfig, tree: PQTree, x: jax.Array) -> jax.Array:
    """(n, p, c1) squared distances of each part to the L1 codebook."""
    return part_sqdist_tables(x, tree.cb1)


def level2_tables(cfg: PQTConfig, tree: PQTree, x: jax.Array) -> jax.Array:
    """(n, p, c1, c2) squared distances of each part to EVERY refinement
    codebook.

    One einsum over the flattened (c1*c2) centroid axis — the reference
    computes these lazily per chosen l1 (assignPerturbationBestBinKernel2,
    PerturbationProTree.cu:830-960); on the MXU the dense table is cheaper
    than the gather it saves.
    """
    n = x.shape[0]
    flat_cb2 = tree.cb2.reshape(cfg.p, cfg.c1 * cfg.c2, cfg.vl)
    d = part_sqdist_tables(x, flat_cb2)
    return d.reshape(n, cfg.p, cfg.c1, cfg.c2)


def line_tables(cfg: PQTConfig, tree: PQTree, x: jax.Array) -> jax.Array:
    """(n, line_parts, c1) segment distances to virtual L1 centroids
    (lineAssignmentKernel, PerturbationProTree.cu:7739-7820)."""
    return subpart_sqdist_tables(x, tree.centroids_full, cfg.line_parts)
