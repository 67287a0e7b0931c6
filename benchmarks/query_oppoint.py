"""Time query_knn at several probe operating points using cached artifacts.

Usage: python benchmarks/query_oppoint.py [n_db] [batch]
Requires a prior benchmarks/profile_pair.py run (populates the cache).
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


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dim = 128
    rng = np.random.default_rng(0)
    from bench import make_sift_like
    data, _ = make_sift_like(n, dim, rng)
    queries = jnp.asarray(np.clip(
        data[rng.integers(0, n, batch)] + rng.normal(0, 6, (batch, dim)),
        0, 255).round().astype(np.float32))

    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (n - 1).bit_length()))
    base = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000, hash_size=hash_size,
        max_bins=512, max_candidates=1024)
    cache_dir = os.environ.get("PQT_PROFILE_CACHE", "/tmp/pqt_profile_cache")
    tree = artifacts.load_tree(os.path.join(cache_dir, f"tree_n{n}"), base)
    db = artifacts.load_database(os.path.join(cache_dir, f"db_n{n}"), base)

    points = [
        dict(max_bins=512, max_candidates=1024, pair_top_m=128, enum_width=1024),
        dict(max_bins=512, max_candidates=1024, pair_top_m=256, enum_width=1024),
        dict(max_bins=512, max_candidates=1024, pair_top_m=256, enum_width=2048),
        dict(max_bins=512, max_candidates=1024, pair_top_m=128, enum_width=0),
        dict(max_bins=256, max_candidates=512, pair_top_m=128, enum_width=1024),
        dict(max_bins=1024, max_candidates=2048, pair_top_m=256, enum_width=2048),
    ]
    for kw in points:
        cfg = base.replace(**kw)
        f = jax.jit(lambda q, c=cfg: P.query_knn(c, tree, db, q, 100).indices)
        t = timeit(f, queries)
        print(f"{kw} -> {t:7.2f} ms  {batch / t * 1000:9,.0f} QPS", flush=True)


if __name__ == "__main__":
    main()
