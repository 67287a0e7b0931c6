"""Second-stage bisect: WHY does the same measurement protocol give
~1M QPS in bisect_headline.py but ~30k QPS in steadystate.py?

Reproduce steadystate's preamble step by step, re-measuring the exact-path
P3 protocol (single pass, 16 distinct device-resident batches) after each
step.  Candidate causes: extra HBM residents (dbd), running the brute-force
program, running other query programs.
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
from pqt_tpu.ops.distance import brute_force_knn, brute_force_knn_fast


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

    def p3(tag):
        t0 = time.perf_counter()
        outs = [q(queries[s:s + B]) for s in range(0, 4096, B)]
        jax.block_until_ready(outs[-1])
        dt = time.perf_counter() - t0
        print(f"P3 after {tag:34s} {4096 / dt:9.0f} QPS "
              f"({dt / 16 * 1000:6.2f} ms/batch)", flush=True)

    jax.block_until_ready(q(queries[:B]))     # compile
    p3("artifacts only (baseline)")
    p3("artifacts only (repeat)")

    dbd = jnp.asarray(data, jnp.float32)
    jax.block_until_ready(dbd)
    p3("+ dbd resident")

    gt = np.asarray(brute_force_knn(queries[:1024], dbd, 100, batch=B)[1])
    p3("+ brute_force_knn gt run")
    p3("+ gt run (repeat)")

    jax.block_until_ready(brute_force_knn_fast(queries[:B], dbd, 100)[1])
    p3("+ brute_force_knn_fast compiled")

    def line(x):
        return P.query_knn(cfg, tree, db, x, 100).indices
    jax.block_until_ready(line(queries[:B]))
    p3("+ line path compiled+run")

    del dbd
    p3("after del dbd")


if __name__ == "__main__":
    main()
