"""Is the ~1M QPS 'fast state' real computation?

bisect_state.py showed: a fresh process runs the exact-rerank query at
~0.2-0.45 ms/batch until the first brute_force_knn execution, after which
the SAME program measures ~10 ms/batch forever.  Two hypotheses:
  (a) the runtime really executes at ~HBM speed of light (0.19 ms/batch is
      exactly the 134 MB/batch gather bound) and the brute-force program
      knocks the session off a fast dispatch path;
  (b) the fast state is an illusion (result caching / elided execution).

Decisive test, in a fresh process with NO brute-force run:
  1. time the P3 protocol on NOVEL query values (fresh random draws no
     process has ever sent) — a value-cache cannot hit;
  2. download the results and host-verify top-1 against NumPy exact
     distances for a few queries — elided execution cannot be correct.
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

    # NOVEL values: a fresh seed never used before (seed 424242).
    rng2 = np.random.default_rng(424242)
    novel = jnp.asarray(make_queries(4096, subcenters, rng2))
    jax.block_until_ready(q(novel[:B]))        # compile + warm

    for trial in range(3):
        rng3 = np.random.default_rng(900000 + trial)
        fresh = jnp.asarray(make_queries(4096, subcenters, rng3))
        jax.block_until_ready(fresh)
        t0 = time.perf_counter()
        outs = [q(fresh[s:s + B]) for s in range(0, 4096, B)]
        jax.block_until_ready(outs[-1])
        dt = time.perf_counter() - t0
        print(f"novel-values P3 trial {trial}: {4096 / dt:9.0f} QPS "
              f"({dt / 16 * 1000:6.2f} ms/batch)", flush=True)

    # Host-verify correctness of the LAST trial's outputs (top-1 vs NumPy
    # exact over the full 1M database, 8 queries).
    ids = np.asarray(outs[0])                  # first batch of last trial
    qs = np.asarray(fresh[:8], np.float32)
    dbf = data.astype(np.float32)
    errs = 0
    t0 = time.perf_counter()
    for i in range(8):
        d = ((dbf - qs[i]) ** 2).sum(axis=1)
        true_top1 = int(np.argmin(d))
        got = int(ids[i, 0])
        ok = got == true_top1 or np.isclose(d[got], d[true_top1])
        if not ok:
            # the probe can miss; report distance ratio for judgment
            print(f"  q{i}: got id {got} d={d[got]:.1f} vs true {true_top1} "
                  f"d={d[true_top1]:.1f}", flush=True)
            errs += 1
    print(f"host verify: {8 - errs}/8 top-1 exact matches "
          f"({time.perf_counter() - t0:.1f}s numpy)", flush=True)


if __name__ == "__main__":
    main()
