"""Batched L2 distance computation on the MXU.

The reference computes distances with one CUDA block per vector and a
segmented shared-memory tree reduction (reference: pqt/ProQuantization.cu:101-137,
pqt/VectorQuantization.cu:26-102).  On TPU the same work is a batched matmul:

    ||x - c||^2 = ||x||^2 + ||c||^2 - 2 <x, c>

which XLA tiles onto the 128x128 systolic array.  All functions here are
shape-polymorphic in the batch dimension and traceable under jit/vmap/shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# TPU matmuls default to bf16 passes; the ||x||^2+||c||^2-2x.c identity then
# loses ~1e-2 relative accuracy, which is catastrophic for k-means splits and
# for exact ground truth at SIFT scale (distances ~1e5).  All distance-table
# matmuls therefore run at full f32 precision; callers can relax it.
_DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def pairwise_sqdist(x: jax.Array, c: jax.Array,
                    compute_dtype=jnp.float32,
                    precision=_DEFAULT_PRECISION) -> jax.Array:
    """All-pairs squared L2 distances.

    Args:
      x: (n, d) vectors.
      c: (k, d) centroids.
    Returns:
      (n, k) squared distances, float32.
    """
    x_c = x.astype(compute_dtype)
    c_c = c.astype(compute_dtype)
    # -2 x @ c^T on the MXU; norms on the VPU; XLA fuses the elementwise adds.
    dot = jax.lax.dot_general(
        x_c, c_c, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    xn = jnp.sum(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    cn = jnp.sum(c.astype(jnp.float32) ** 2, axis=-1)
    d = xn + cn[None, :] - 2.0 * dot
    return jnp.maximum(d, 0.0)


def part_sqdist_tables(x: jax.Array, codebook: jax.Array,
                       compute_dtype=jnp.float32,
                       precision=_DEFAULT_PRECISION) -> jax.Array:
    """Per-part squared distances from vectors to a per-part codebook.

    Equivalent of the reference's segmented distance kernel
    (ProQuantization.cu:101-165) producing all p part-distances at once.

    Args:
      x: (n, d) vectors; d = p * vl.
      codebook: (p, k, vl) per-part centroids.
    Returns:
      (n, p, k) squared distances.
    """
    n, d = x.shape
    p, k, vl = codebook.shape
    assert d == p * vl, (d, p, vl)
    xp = x.reshape(n, p, vl).astype(compute_dtype)
    cb = codebook.astype(compute_dtype)
    # (n, p, vl) x (p, k, vl) -> (p, n, k) batched matmul on the MXU.
    dot = jnp.einsum("npv,pkv->npk", xp, cb,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    xn = jnp.sum(x.reshape(n, p, vl).astype(jnp.float32) ** 2, axis=-1)
    cn = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)
    d2 = xn[:, :, None] + cn[None, :, :] - 2.0 * dot
    return jnp.maximum(d2, 0.0)


def subpart_sqdist_tables(x: jax.Array, centroids: jax.Array,
                          line_parts: int,
                          compute_dtype=jnp.float32,
                          precision=_DEFAULT_PRECISION) -> jax.Array:
    """Squared distances between line-part segments of x and of full centroids.

    The reference's `lineAssignmentKernel` / CPU `_L1distancesVirtual`
    (PerturbationProTree.cu:7739-7820, cpu_version/quantizer/treequantizer.hpp:640-661):
    for every query, line-part lp, and L1 centroid c (full-dim centroid, all
    parts concatenated), the distance between segment lp of the query and
    segment lp of the centroid.

    Args:
      x: (n, d) vectors.
      centroids: (c1, d) full-dimensional L1 centroids (concatenated parts).
      line_parts: number of re-rank segments (dim % line_parts == 0).
    Returns:
      (n, line_parts, c1) squared distances.
    """
    n, d = x.shape
    c1 = centroids.shape[0]
    lvl = d // line_parts
    xp = x.reshape(n, line_parts, lvl).astype(compute_dtype)
    cp = centroids.reshape(c1, line_parts, lvl).astype(compute_dtype)
    dot = jnp.einsum("nlv,clv->nlc", xp, cp,
                     preferred_element_type=jnp.float32,
                     precision=precision)
    xn = jnp.sum(x.reshape(n, line_parts, lvl).astype(jnp.float32) ** 2, axis=-1)
    cn = jnp.sum(centroids.reshape(c1, line_parts, lvl).astype(jnp.float32) ** 2,
                 axis=-1)
    d2 = xn[:, :, None] + cn.T[None, :, :] - 2.0 * dot
    return jnp.maximum(d2, 0.0)


def centroid_pair_sqdist(centroids: jax.Array, line_parts: int) -> jax.Array:
    """Per-line-part squared distances between every pair of L1 centroids.

    Reference `computeCBL1L1Dist` (PerturbationProTree.cu:1902-1917) / CPU
    `computeLookupTable` (treequantizer.hpp:183-203).

    Args:
      centroids: (c1, d) full-dimensional L1 centroids.
    Returns:
      (line_parts, c1, c1) squared distances between centroid segments.
    """
    c1, d = centroids.shape
    lvl = d // line_parts
    cp = centroids.reshape(c1, line_parts, lvl).astype(jnp.float32)
    diff = cp[:, None, :, :] - cp[None, :, :, :]        # (c1, c1, lp, lvl)
    d2 = jnp.sum(diff * diff, axis=-1)                  # (c1, c1, lp)
    return jnp.transpose(d2, (2, 0, 1))


def brute_force_knn(queries: jax.Array, db: jax.Array, k: int,
                    batch: int = 1024,
                    db_chunk: int = 262144) -> tuple[jax.Array, jax.Array]:
    """Exact k-NN by full distance computation; the correctness oracle.

    Equivalent of the reference's in-library brute-force cross-checks
    (ProTree.cu:2873-2920, PerturbationProTree.cu:8115-8163).

    Memory-bounded: queries stream in batches and the database streams in
    column chunks with a running top-k merge (a full q x n distance matrix
    at n=1e6+ would exhaust HBM).

    Returns (dists (q, k), indices (q, k)), ascending by distance.
    """
    n_q = queries.shape[0]
    n = db.shape[0]

    # Exact hierarchical top-k: lax.top_k lowers to a full sort, so sorting
    # 256k-wide rows directly is ~100x slower than top-k per 2048-wide tile
    # followed by a merge (still exact: the global top-k is contained in the
    # union of per-tile top-k).  Chunks are tile-aligned.
    tile = 2048
    db_chunk = min(db_chunk, -(-n // tile) * tile)
    n_chunks = -(-n // db_chunk)

    @jax.jit
    def one_batch(q, db):
        # db is an argument (not a closure) so the jitted program does not
        # embed the full database as a constant.
        def body(carry, s):
            best_d, best_i = carry
            block = jax.lax.dynamic_slice_in_dim(
                db, s * db_chunk, db_chunk, 0)
            d = pairwise_sqdist(q, block)
            col = jax.lax.broadcasted_iota(
                jnp.int32, d.shape, 1) + s * db_chunk
            # mask padding columns of the final chunk
            d = jnp.where(col < n, d, jnp.inf)
            bq = d.shape[0]
            if db_chunk > tile:
                k_t = min(k, tile)
                dt = d.reshape(bq, db_chunk // tile, tile)
                ct = col.reshape(bq, db_chunk // tile, tile)
                neg_t, sel_t = jax.lax.top_k(-dt, k_t)
                d = (-neg_t).reshape(bq, -1)
                col = jnp.take_along_axis(ct, sel_t, axis=2).reshape(bq, -1)
            cat_d = jnp.concatenate([best_d, d], axis=1)
            cat_i = jnp.concatenate([best_i, col], axis=1)
            neg_top, sel = jax.lax.top_k(-cat_d, k)
            return (-neg_top, jnp.take_along_axis(cat_i, sel, axis=1)), None

        init = (jnp.full((q.shape[0], k), jnp.inf),
                jnp.full((q.shape[0], k), -1, jnp.int32))
        (best_d, best_i), _ = jax.lax.scan(
            body, init, jnp.arange(n_chunks))
        return best_d, best_i

    if n % db_chunk:
        pad = db_chunk - n % db_chunk
        db = jnp.concatenate([db, jnp.zeros((pad, db.shape[1]), db.dtype)])
    assert db_chunk % tile == 0 or db_chunk < tile

    if n_q <= batch:
        return one_batch(queries, db)
    outs_d, outs_i = [], []
    for s in range(0, n_q, batch):
        d, i = one_batch(queries[s:s + batch], db)
        outs_d.append(d)
        outs_i.append(i)
    return jnp.concatenate(outs_d, 0), jnp.concatenate(outs_i, 0)


def brute_force_knn_fast(queries: jax.Array, db: jax.Array, k: int,
                         recall_target: float = 0.95,
                         precision=None) -> tuple[jax.Array, jax.Array]:
    """Throughput-oriented brute force: full distances + TPU-native
    approx_max_k (PartialReduce) instead of a sort-based exact top-k.

    This is what a production exact-scan baseline on TPU actually runs —
    used as the hardware-normalized QPS baseline in bench.py (ground truth
    still comes from the exact brute_force_knn).
    """
    if precision is None:
        precision = jax.lax.Precision.DEFAULT
    d = pairwise_sqdist(queries, db, precision=precision)
    neg_d, idx = jax.lax.approx_max_k(-d, k, recall_target=recall_target)
    return -neg_d, idx
