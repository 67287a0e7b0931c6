"""Sanity-check the surprisingly fast r4 timings: force device->host
transfers (np.asarray) in the timed loop and verify recall vs brute force.
If block_until_ready were lying on the axon platform, np.asarray timings
would blow up and/or results would be wrong.
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
from pqt_tpu.ops.distance import brute_force_knn


def main():
    n = 1_000_000
    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like
    data, subcenters = make_sift_like(n, 128, rng)
    queries = jnp.asarray(make_queries(1024, subcenters, rng))

    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (n - 1).bit_length()))
    cfg = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000, hash_size=hash_size,
        max_bins=512, max_candidates=1024, pair_top_m=128, enum_width=512,
        pair_filter=False)
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
    if db.vectors is None:
        db = db._replace(vectors=jnp.asarray(data, jnp.float32))
    print(f"device={jax.devices()[0]}", flush=True)

    B = 256

    def q(x):
        return P.query_knn(cfg, tree, db, x, 100, True).indices

    np.asarray(q(queries[:B]))  # compile + settle

    # Timed loop with FORCED host transfer every batch.
    t0 = time.perf_counter()
    ids = np.concatenate([np.asarray(q(queries[s:s + B]))
                          for s in range(0, 1024, B)])
    dt = time.perf_counter() - t0
    print(f"forced-transfer pass: {1024 / dt:9.0f} QPS "
          f"({dt / 4 * 1000:6.2f} ms/batch)", flush=True)

    # Ground truth for recall.
    dbd = jnp.asarray(data, jnp.float32)
    t0 = time.perf_counter()
    _, gt = brute_force_knn(queries, dbd, 100, batch=B)
    gt = np.asarray(gt)
    dt_bf = time.perf_counter() - t0
    print(f"brute force: {1024 / dt_bf:9.0f} QPS", flush=True)
    r1 = float((ids[:, 0] == gt[:, 0]).mean())
    print(f"R@1 = {r1:.4f}", flush=True)


if __name__ == "__main__":
    main()
