"""Micro-profile of _pair_stage internals on the current device.

pair_stage is the largest isolated stage of the pair pipeline (5.5 ms at
the 1M/256 operating point).  This times each internal step separately to
find which op is mis-lowering.

Run:  python benchmarks/micro_pairstage.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pqt_tpu as P
from pqt_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
from pqt_tpu.io import artifacts
from pqt_tpu.models import query as Q
from pqt_tpu.models.tree import level1_tables, level2_tables


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000, out


def main():
    n, batch = 1_000_000, 256
    dim = 128
    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like
    data, subcenters = make_sift_like(n, dim, rng)
    queries = jnp.asarray(make_queries(batch, subcenters, rng))

    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (n - 1).bit_length()))
    cfg = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000, hash_size=hash_size,
        max_bins=512, max_candidates=1024, pair_top_m=128, enum_width=2048)
    cache_dir = os.environ.get("PQT_PROFILE_CACHE", "/tmp/pqt_profile_cache")
    tree = artifacts.load_or_build(
        os.path.join(cache_dir, f"tree_n{n}"),
        lambda p: artifacts.load_tree(p, cfg),
        lambda: P.train_tree(cfg, data[:200_000]),
        lambda p, t: artifacts.save_tree(p, cfg, t))
    db = artifacts.load_or_build(
        os.path.join(cache_dir, f"db_n{n}"),
        lambda p: artifacts.load_database(p, cfg),
        lambda: P.build_database(cfg, tree, data, encode_chunk=1 << 17),
        lambda p, d: artifacts.save_database(p, cfg, d))
    qf = queries.astype(jnp.float32)
    W, M, L = cfg.k1_query, cfg.pair_top_m, cfg.k1_query * cfg.c2
    print(f"B={batch} W={W} M={M} L={L} device={jax.devices()[0]}",
          flush=True)

    t, d1 = timeit(jax.jit(lambda q: level1_tables(cfg, tree, q)), qf)
    print(f"level1_tables          {t:8.2f} ms")
    t, d2 = timeit(jax.jit(lambda q: level2_tables(cfg, tree, q)), qf)
    print(f"level2_tables          {t:8.2f} ms")

    t, (_, l1_idx) = timeit(jax.jit(lambda d: jax.lax.top_k(-d, W)), d1)
    print(f"top_k(l1, {W})          {t:8.2f} ms")

    def cand(d2, l1_idx):
        cd = jnp.take_along_axis(d2, l1_idx[..., None], axis=2)
        return cd.reshape(batch, cfg.p, L)
    t, flat_d2 = timeit(jax.jit(cand), d2, l1_idx)
    print(f"take_along(d2)         {t:8.2f} ms")

    def grid(fd):
        return (fd[:, 0, :, None] + fd[:, 1, None, :]).reshape(batch, -1)
    t, s = timeit(jax.jit(grid), flat_d2)
    print(f"pair grid sum          {t:8.2f} ms")

    t, (neg, idx) = timeit(jax.jit(lambda s: jax.lax.approx_max_k(-s, M)), s)
    print(f"approx_max_k({M})      {t:8.2f} ms")

    t, _ = timeit(jax.jit(lambda s: jax.lax.top_k(-s, M)), s)
    print(f"exact top_k({M})       {t:8.2f} ms")

    def recover(idx, l1_idx):
        codes = (l1_idx[..., None] * cfg.c2 +
                 jnp.arange(cfg.c2, dtype=jnp.int32)).reshape(batch, cfg.p, L)
        ca = jnp.take_along_axis(codes[:, 0, :], idx // L, axis=-1)
        cb = jnp.take_along_axis(codes[:, 1, :], idx % L, axis=-1)
        return ca, cb
    t, _ = timeit(jax.jit(recover), idx.astype(jnp.int32), l1_idx)
    print(f"code recovery          {t:8.2f} ms")

    def final_sort(d, h):
        return jax.lax.sort((d, h), dimension=-1, num_keys=1)
    d = -neg
    h = idx.astype(jnp.uint32)
    t, _ = timeit(jax.jit(final_sort), d, h)
    print(f"final sort (B, {M})    {t:8.2f} ms")

    # whole stage, fused
    f = jax.jit(lambda q: Q._pair_stage(cfg, tree, q, db.pair_occ)[:2])
    t, _ = timeit(f, qf)
    print(f"pair_stage fused       {t:8.2f} ms")


if __name__ == "__main__":
    main()
