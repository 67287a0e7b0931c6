"""LBG k-means, batched and masked, as a single jitted XLA program.

Re-design of the reference's k-means (reference: pqt/VectorQuantization.cu:296-393,
pqt/ProQuantization.cu:1047-1169, cpu_version/quantizer/vectorquantizer.hpp:9-162):

  * LBG splitting: start from the mean, double the centroid count by splitting
    each centroid into c+eps / c-eps, run Lloyd iterations, repeat.
  * Double convergence test: stop when the fraction of vectors changing
    assignment falls below `churn_tol` or the mean centroid movement falls
    below `move_tol` (ProQuantization.cu:1108-1140) — but fully on-device
    inside a lax.while_loop instead of a D2H copy per iteration.
  * Masked: a weight mask selects the sub-population, which lets the tree
    build run all (part, l1-cell) sub-k-means as ONE vmapped program instead
    of the reference's c1*p sequential launches (ProTree.cu:484-502).

E/M steps are matmuls (distance via ||x||^2+||c||^2-2x.c, M-step via
one-hot^T @ x) so both land on the MXU.  Memory is bounded by scanning over
fixed-size chunks of the data.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from pqt_tpu.ops.distance import pairwise_sqdist


def _lloyd_converge(data, mask, centroids, *, iters, churn_tol, move_tol,
                    chunk, compute_dtype):
    """Run Lloyd iterations until convergence.  Shapes are static.

    data: (n, d) float; mask: (n,) bool; centroids: (k, d).
    Returns (centroids, assignments (n,) int32).
    """
    n, d = data.shape
    k = centroids.shape[0]
    n_chunks = n // chunk
    data_c = data.reshape(n_chunks, chunk, d)
    mask_c = mask.reshape(n_chunks, chunk)
    fmask = mask.astype(jnp.float32)
    n_active = jnp.maximum(jnp.sum(fmask), 1.0)

    def e_m_step(centroids, prev_assign):
        """One fused E+M pass over the data, chunked to bound memory."""
        prev_c = prev_assign.reshape(n_chunks, chunk)

        def body(carry, inp):
            sums, counts, churn = carry
            x, m, prev = inp
            dist = pairwise_sqdist(x, centroids, compute_dtype)  # (chunk, k)
            assign = jnp.argmin(dist, axis=-1).astype(jnp.int32)
            onehot = (assign[:, None] ==
                      jnp.arange(k, dtype=jnp.int32)[None, :])
            w = onehot.astype(jnp.float32) * m.astype(jnp.float32)[:, None]
            # M-step accumulation on the MXU: (k, chunk) @ (chunk, d).
            sums = sums + jax.lax.dot_general(
                w, x.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(w, axis=0)
            churn = churn + jnp.sum(
                (assign != prev).astype(jnp.float32) * m.astype(jnp.float32))
            return (sums, counts, churn), assign

        init = (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32),
                jnp.zeros((), jnp.float32))
        (sums, counts, churn), assign = jax.lax.scan(
            body, init, (data_c, mask_c, prev_c))
        new_centroids = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None],
            centroids)
        return new_centroids, assign.reshape(n), churn / n_active

    def cond(state):
        _, _, it, done = state
        return jnp.logical_and(it < iters, jnp.logical_not(done))

    def step(state):
        centroids, assign, it, _ = state
        new_centroids, new_assign, churn = e_m_step(centroids, assign)
        move = jnp.mean(jnp.sum((new_centroids - centroids) ** 2, axis=-1))
        scale = jnp.mean(jnp.sum(new_centroids ** 2, axis=-1)) + 1e-12
        done = jnp.logical_or(churn < churn_tol,
                              move / scale < move_tol * move_tol)
        return new_centroids, new_assign, it + 1, done

    init_assign = jnp.full((n,), -1, jnp.int32)
    state = (centroids, init_assign, jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.bool_))
    centroids, assign, _, _ = jax.lax.while_loop(cond, step, state)
    return centroids, assign


def _cluster_variances(data, mask, centroids, assign, chunk):
    """Per-cluster per-dimension variance (k, d), one chunked scan."""
    n, d = data.shape
    k = centroids.shape[0]
    n_chunks = n // chunk
    data_c = data.reshape(n_chunks, chunk, d)
    mask_c = mask.reshape(n_chunks, chunk)
    assign_c = assign.reshape(n_chunks, chunk)

    def body(carry, inp):
        sq, counts = carry
        x, m, a = inp
        onehot = (a[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :])
        w = onehot.astype(jnp.float32) * m.astype(jnp.float32)[:, None]
        diff = x.astype(jnp.float32)[:, None, :] - centroids[None, :, :]
        sq = sq + jnp.einsum("nk,nkd->kd", w, diff * diff,
                             preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(w, axis=0)
        return (sq, counts), None

    (sq, counts), _ = jax.lax.scan(
        body, (jnp.zeros((k, d), jnp.float32), jnp.zeros((k,), jnp.float32)),
        (data_c, mask_c, assign_c))
    return sq / jnp.maximum(counts, 1.0)[:, None]


def _kmeanspp_init(data, mask, k, key):
    """k-means++ (D^2-sampling) initialization on a masked population.

    Not in the reference (which is pure LBG) — added because LBG's
    split-all-doubling frequently strands well-separated modes in a shared
    centroid; D^2 sampling covers modes with high probability.
    """
    n, d = data.shape
    fdata = data.astype(jnp.float32)
    fmask = mask.astype(jnp.float32)

    # First center: the masked population's mean-nearest point is as good as
    # any; use a D^2 draw from the mean.
    mean0 = jnp.sum(fdata * fmask[:, None], axis=0) / jnp.maximum(
        jnp.sum(fmask), 1.0)
    d0 = jnp.sum((fdata - mean0) ** 2, axis=-1)

    def pick(key, dmin):
        # sample index proportional to masked dmin (fall back to uniform
        # over the mask when all distances are 0)
        w = dmin * fmask
        total = jnp.sum(w)
        w = jnp.where(total > 0, w, fmask)
        logits = jnp.log(jnp.maximum(w, 1e-30))
        return jax.random.categorical(key, logits)

    keys = jax.random.split(key, k)
    idx0 = pick(keys[0], d0)
    centers0 = jnp.zeros((k, d), jnp.float32).at[0].set(fdata[idx0])
    dmin0 = jnp.sum((fdata - fdata[idx0]) ** 2, axis=-1)

    def body(j, carry):
        centers, dmin = carry
        idx = pick(keys[j], dmin)
        c = fdata[idx]
        centers = centers.at[j].set(c)
        dmin = jnp.minimum(dmin, jnp.sum((fdata - c) ** 2, axis=-1))
        return centers, dmin

    centers, _ = jax.lax.fori_loop(1, k, body, (centers0, dmin0))
    return centers


def lbg_kmeans(data: jax.Array, mask: Optional[jax.Array], k: int, *,
               iters: int = 30, churn_tol: float = 2e-3,
               move_tol: float = 5e-3, split_epsilon: float = 1e-3,
               chunk: int = 65536, compute_dtype=jnp.float32,
               key: Optional[jax.Array] = None, init: str = "kmeans++"):
    """k-means on a (masked) population.

    Args:
      data: (n, d).  n is padded internally to a multiple of the chunk size.
      mask: (n,) bool population selector, or None for all.
      k: target centroid count (any positive int; split schedule doubles and
         clips, matching VectorQuantization.cu:296-393's power-of-two ladder).
      init: "kmeans++" (default; D^2 seeding + Lloyd) or "lbg" (the
         reference's split-doubling ladder).
    Returns:
      (centroids (k, d) float32, assignments (n,) int32).
      Assignments are valid only where mask is True.
    """
    n, d = data.shape
    if mask is None:
        mask = jnp.ones((n,), jnp.bool_)
    chunk = min(chunk, n)
    pad = (-n) % chunk
    if pad:
        data = jnp.concatenate(
            [data, jnp.zeros((pad, d), data.dtype)], axis=0)
        mask = jnp.concatenate([mask, jnp.zeros((pad,), jnp.bool_)], axis=0)

    if key is None:
        key = jax.random.PRNGKey(0)

    if init == "kmeans++":
        init_key, key = jax.random.split(key)
        centroids = _kmeanspp_init(data, mask, k, init_key)
        centroids, assign = _lloyd_converge(
            data, mask, centroids, iters=iters, churn_tol=churn_tol,
            move_tol=move_tol, chunk=chunk, compute_dtype=compute_dtype)
        return centroids, assign[:n]
    if init != "lbg":
        raise ValueError(f"unknown init {init!r}")

    fmask = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(fmask), 1.0)
    mean0 = jnp.sum(data.astype(jnp.float32) * fmask[:, None],
                    axis=0) / denom
    centroids = mean0[None, :]                       # (1, d)

    # Split size and direction must track the CLUSTER's spread: the
    # reference's absolute +-1e-3 (vectorquantizer.hpp augmentCentroids)
    # silently fails to separate clusters when feature magnitudes are large
    # (e.g. SIFT uint8 0..255) — all points follow one child and the codebook
    # collapses.  Perturbing along each cluster's own per-dim std also aims
    # the split at the high-variance axis, which is where a merged pair of
    # modes separates.
    var0 = jnp.sum(((data.astype(jnp.float32) - mean0) ** 2) *
                   fmask[:, None], axis=0) / denom
    cvars = var0[None, :]                            # (1, d)

    if key is None:
        key = jax.random.PRNGKey(0)

    n_levels = max(1, (k - 1).bit_length())          # ceil(log2(k))
    cur = 1
    assign = jnp.zeros((data.shape[0],), jnp.int32)
    for level in range(n_levels):
        grow = min(2 * cur, k)
        n_new = grow - cur
        key, sub = jax.random.split(key)
        direction = jax.random.normal(sub, (n_new, d), jnp.float32) + 1.0
        eps = split_epsilon * jnp.sqrt(cvars[:n_new] + 1e-12) * direction
        split_from = centroids[:n_new]
        centroids = jnp.concatenate(
            [centroids.at[:n_new].add(-eps), split_from + eps], axis=0)
        cur = grow
        centroids, assign = _lloyd_converge(
            data, mask, centroids, iters=iters, churn_tol=churn_tol,
            move_tol=move_tol, chunk=chunk, compute_dtype=compute_dtype)
        if grow < k:   # variances only needed if another split follows
            cvars = _cluster_variances(data, mask, centroids, assign, chunk)
    return centroids, assign[:n]


def batched_masked_kmeans(data: jax.Array, masks: jax.Array, k: int,
                          **kw):
    """Run M independent masked k-means problems over shared data.

    data: (n, d); masks: (M, n).  Returns (M, k, d) centroids.
    This replaces the reference's sequential per-(part, cell) sub-k-means loop
    (ProTree.cu:484-502) with one vmapped program.
    """
    keys = jax.random.split(kw.pop("key", jax.random.PRNGKey(0)),
                            masks.shape[0])

    def one(m, key):
        c, _ = lbg_kmeans(data, m, k, key=key, **kw)
        return c

    return jax.vmap(one)(masks, keys)
