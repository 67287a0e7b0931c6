"""Bisect the r3 headline gap: bench.py 17.8k QPS vs sweep_knobs3 28.8k QPS
for the SAME exact-rerank path at the SAME 512/1024 budget (VERDICT r3 #1).

Candidate explanations, each isolated below on identical artifacts:
  P1  reps=30 of ONE 256-query batch (sweep protocol, amortized+hot)
  P2  single pass over 4 distinct 256-batches (bench.py protocol)
  P3  single pass over 16 distinct 256-batches (more dispatch pipelining)
  P4  30 reps cycling over 4 distinct batches (hot, distinct data)
  P5  P1 again but with an extra 512 MB f32 copy of the DB resident in HBM
      (bench.py keeps `dbd` alive for ground truth; memory-pressure probe)

Run: python benchmarks/bisect_headline.py
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
    dim = 128
    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like
    data, subcenters = make_sift_like(n, dim, rng)
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

    jax.block_until_ready(q(queries[:B]))  # compile

    def report(name, n_queries, secs):
        print(f"{name:44s} {n_queries / secs:9.0f} QPS "
              f"({secs / (n_queries / B) * 1000:6.2f} ms/batch)", flush=True)

    # P1: sweep protocol — 30 reps, one batch
    t0 = time.perf_counter()
    for _ in range(30):
        out = q(queries[:B])
    jax.block_until_ready(out)
    report("P1 reps=30 same batch", 30 * B, time.perf_counter() - t0)

    # P2: bench protocol — one pass, 4 distinct batches
    for trial in range(3):
        t0 = time.perf_counter()
        outs = [q(queries[s:s + B]) for s in range(0, 1024, B)]
        jax.block_until_ready(outs[-1])
        report(f"P2 single pass 4 batches (trial {trial})", 1024,
               time.perf_counter() - t0)

    # P3: one pass, 16 distinct batches
    t0 = time.perf_counter()
    outs = [q(queries[s:s + B]) for s in range(0, 4096, B)]
    jax.block_until_ready(outs[-1])
    report("P3 single pass 16 batches", 4096, time.perf_counter() - t0)

    # P4: 30 reps cycling 4 distinct batches
    t0 = time.perf_counter()
    for r in range(30):
        out = q(queries[(r % 4) * B:(r % 4 + 1) * B])
    jax.block_until_ready(out)
    report("P4 reps=30 cycling 4 batches", 30 * B, time.perf_counter() - t0)

    # P5: P1 with an extra 512MB f32 DB copy resident (bench.py's `dbd`)
    dbd = jnp.asarray(data, jnp.float32)
    jax.block_until_ready(dbd)
    t0 = time.perf_counter()
    for _ in range(30):
        out = q(queries[:B])
    jax.block_until_ready(out)
    report("P5 reps=30 same batch + 512MB resident", 30 * B,
           time.perf_counter() - t0)
    del dbd

    # P6: host->device transfer cost per batch (bench slices device array;
    # sweep also slices device array — but check np host slices too)
    qh = np.asarray(queries)
    t0 = time.perf_counter()
    for r in range(30):
        out = q(jnp.asarray(qh[(r % 4) * B:(r % 4 + 1) * B]))
    jax.block_until_ready(out)
    report("P6 reps=30 host np upload each call", 30 * B,
           time.perf_counter() - t0)


if __name__ == "__main__":
    main()
