"""Stage-level profiling of the query pipeline on the current device.

Times each stage of query_knn in isolation (each jitted separately) so we
know where to spend Pallas effort.  Run:

    python benchmarks/profile_query.py [n_db] [batch]
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
from pqt_tpu.models import query as Q
from pqt_tpu.models.tree import level1_tables, level2_tables, line_tables
from pqt_tpu.ops import binning
from pqt_tpu.ops.linecodes import reconstruct_dists


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dim = 128
    rng = np.random.default_rng(0)
    centers = rng.uniform(0, 140, (1024, dim)).astype(np.float32)
    data = (centers[rng.integers(0, 1024, n)]
            + rng.normal(0, 18, (n, dim))).astype(np.float32)
    queries = jnp.asarray(data[rng.integers(0, n, batch)]
                          + rng.normal(0, 6, (batch, dim)).astype(np.float32))

    hash_size = max(1 << 18, 1 << (n - 1).bit_length())
    cfg = P.SIFT1M_CONFIG.replace(kmeans_iters=6, hash_size=hash_size)
    t0 = time.time()
    tree = P.train_tree(cfg, data[:100_000])
    jax.block_until_ready(tree.cb2)
    print(f"train {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    db = P.build_database(cfg, tree, data, encode_chunk=1 << 17)
    print(f"build {time.time() - t0:.1f}s", flush=True)
    print(f"n={n} batch={batch} device={jax.devices()[0]}", flush=True)

    qf = queries.astype(jnp.float32)

    # Stage 1+3: sorted per-part lists.
    f_lists = jax.jit(lambda q: Q._sorted_part_lists(cfg, tree, q))
    t, (sorted_d2, sorted_codes) = timeit(f_lists, qf)
    print(f"sorted_part_lists      {t:8.2f} ms")

    # Stage 4: bin enumeration.
    f_bins = jax.jit(lambda d2, c, cnt: Q._enumerate_bins(cfg, d2, c, cnt))
    t, (bins, bin_counts) = timeit(f_bins, sorted_d2, sorted_codes, db.counts)
    print(f"enumerate_bins         {t:8.2f} ms")

    # Stage 5: candidate gather positions.
    f_gather = jax.jit(lambda b, bc, pre: binning.gather_candidates(
        pre[b], bc, cfg.max_candidates, cfg.max_vec_per_bin))
    t, (positions, valid) = timeit(f_gather, bins, bin_counts, db.prefix)
    print(f"gather_positions       {t:8.2f} ms")

    # Stage 5b: packed payload gather.
    from pqt_tpu.models.db import unpack_payload

    def payload(pos, v):
        safe = jnp.where(v, pos, 0)
        return unpack_payload(db.payload[safe])
    f_payload = jax.jit(payload)
    t, (cand_ids, cand_codes, cand_t3) = timeit(f_payload, positions, valid)
    print(f"payload_gather         {t:8.2f} ms")

    # Stage 2: line tables.
    f_line = jax.jit(lambda q: line_tables(cfg, tree, q))
    t, q_line = timeit(f_line, qf)
    print(f"line_tables            {t:8.2f} ms")

    # Stage 6: line-code distance reconstruction.
    f_rerank = jax.jit(lambda c, ql, t3: reconstruct_dists(c, ql, t3))
    t, dists = timeit(f_rerank, cand_codes, q_line, cand_t3)
    print(f"reconstruct_dists      {t:8.2f} ms")

    # Stage 7: top-k.
    f_topk = jax.jit(lambda d: jax.lax.top_k(-d, 100))
    t, _ = timeit(f_topk, jnp.where(valid, dists, jnp.inf))
    print(f"top_k(100)             {t:8.2f} ms")

    # Whole pipeline.
    f_all = jax.jit(lambda q: P.query_knn(cfg, tree, db, q, 100).indices)
    t, _ = timeit(f_all, queries)
    print(f"TOTAL query_knn        {t:8.2f} ms   -> {batch / t * 1000:,.0f} QPS")


if __name__ == "__main__":
    main()
