"""Rule out lazy/elided execution in the fast state.

If the axon runtime only materializes the buffers that block_until_ready
names (plus deps), then blocking on outs[-1] alone would under-count: the
other 15 batches might never execute inside the timed window.  Compare
  A) block only the last output      (the P3 protocol)
  B) block EVERY output (pytree block_until_ready)
  C) block every output AND download every result (np.asarray)
in one clean process, plus spot host-verification of batch results.
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


def main():
    n = 1_000_000
    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like
    data, subcenters = make_sift_like(n, 128, rng)
    queries = jnp.asarray(make_queries(4096, subcenters, rng))

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

    jax.block_until_ready(q(queries[:B]))

    for trial in range(2):
        t0 = time.perf_counter()
        outs = [q(queries[s:s + B]) for s in range(0, 4096, B)]
        jax.block_until_ready(outs[-1])
        dt = time.perf_counter() - t0
        print(f"A block-last   trial {trial}: {4096 / dt:9.0f} QPS "
              f"({dt / 16 * 1000:6.2f} ms/batch)", flush=True)

    for trial in range(2):
        t0 = time.perf_counter()
        outs = [q(queries[s:s + B]) for s in range(0, 4096, B)]
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        print(f"B block-all    trial {trial}: {4096 / dt:9.0f} QPS "
              f"({dt / 16 * 1000:6.2f} ms/batch)", flush=True)

    t0 = time.perf_counter()
    outs = [q(queries[s:s + B]) for s in range(0, 4096, B)]
    ids = np.concatenate([np.asarray(o) for o in outs])
    dt = time.perf_counter() - t0
    print(f"C fetch-all: {4096 / dt:9.0f} QPS ({dt / 16 * 1000:6.2f} "
          f"ms/batch)", flush=True)

    # Spot host verification across ALL batches: query j*256+1 per batch.
    dbf = data.astype(np.float32)
    qs = np.asarray(queries, np.float32)
    bad = 0
    for j in range(16):
        i = j * 256 + 1
        d = ((dbf - qs[i]) ** 2).sum(axis=1)
        t1 = int(np.argmin(d))
        got = int(ids[i, 0])
        if got != t1 and not np.isclose(d[got], d[t1]):
            bad += 1
            print(f"  batch {j}: got {got} (d={d[got]:.1f}) "
                  f"vs {t1} (d={d[t1]:.1f})", flush=True)
    print(f"host verify across batches: {16 - bad}/16 ok", flush=True)


if __name__ == "__main__":
    main()
