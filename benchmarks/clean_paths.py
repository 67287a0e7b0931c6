"""Clean-state steady throughput for engine paths OR brute force.

The axon runtime drops a session from its fast dispatch path permanently
after executing the big brute-force scan program (benchmarks/bisect_state.py
measured ~1M -> ~26k QPS on the same query program).  So every path gets
its number from a process that has executed NOTHING heavy before it:

  python benchmarks/clean_paths.py engine   # exact / line / refine paths
  python benchmarks/clean_paths.py brute    # brute_force_knn_fast only
  python benchmarks/clean_paths.py refbudget  # exact at 4096/4096
  python benchmarks/clean_paths.py u8       # exact path, uint8 vs f32
                                            # candidate vectors (VERDICT #7)
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

B = 256


def measure(name, fn, queries, trials=3):
    jax.block_until_ready(fn(queries[:B]))        # compile + warm
    for trial in range(trials):
        t0 = time.perf_counter()
        outs = [fn(queries[s:s + B]) for s in range(0, 4096, B)]
        jax.block_until_ready(outs[-1])
        dt = time.perf_counter() - t0
        print(f"{name} trial {trial}: {4096 / dt:9.0f} QPS "
              f"({dt / 16 * 1000:6.2f} ms/batch)", flush=True)
    return outs


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "engine"
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
    print(f"device={jax.devices()[0]} mode={which}", flush=True)

    if which == "brute":
        from pqt_tpu.ops.distance import brute_force_knn_fast
        dbd = jnp.asarray(data, jnp.float32)
        jax.block_until_ready(dbd)
        measure("brute_fast", lambda x: brute_force_knn_fast(x, dbd, 100)[1],
                queries)
        return

    if which == "u8":
        # uint8 candidate-vector storage: the exact-rerank gather moves 4x
        # fewer bytes (cast happens on the gathered (B,K,dim) block only).
        db8 = db._replace(vectors=jnp.asarray(data))          # uint8
        measure("exact u8 vecs", lambda x: P.query_knn(
            cfg, tree, db8, x, 100, True).indices, queries)
        db32 = db8._replace(vectors=jnp.asarray(data, jnp.float32))
        measure("exact f32 vecs", lambda x: P.query_knn(
            cfg, tree, db32, x, 100, True).indices, queries)
        return

    if db.vectors is None:
        db = db._replace(vectors=jnp.asarray(data, jnp.float32))

    if which == "refbudget":
        ref_cfg = cfg.replace(max_bins=4096, max_candidates=4096,
                              pair_top_m=256, enum_width=4096)
        measure("exact 4096/4096", lambda x: P.query_knn(
            ref_cfg, tree, db, x, 100, True).indices, queries)
        return

    measure("exact 512/1024", lambda x: P.query_knn(
        cfg, tree, db, x, 100, True).indices, queries)
    measure("line 512/1024", lambda x: P.query_knn(
        cfg, tree, db, x, 100).indices, queries)
    measure("refine 512/1024", lambda x: P.query_knn_refine(
        cfg, tree, db, x, 100, k_line=cfg.max_candidates).indices, queries)


if __name__ == "__main__":
    main()
