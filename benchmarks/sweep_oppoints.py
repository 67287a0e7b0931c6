"""Sweep query op points (probe budgets) at SIFT1M-like scale on the device.

Builds one database, then measures QPS + recall@{1,10,100} for several
(max_bins, max_candidates, pair_top_m, enum_width) settings of the pair
pipeline, plus the brute-force baseline.  Run:

    python benchmarks/sweep_oppoints.py [n_db] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pqt_tpu as P
from pqt_tpu.ops.distance import brute_force_knn, brute_force_knn_fast
from pqt_tpu.utils.cache import enable_persistent_cache
from pqt_tpu.utils.metrics import recall_at

enable_persistent_cache()


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dim = 128
    rng = np.random.default_rng(0)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_sift_like
    data, _ = make_sift_like(n, dim, rng)
    n_q = max(batch, 1024)           # recall over >= 1024 queries
    q_src = rng.integers(0, n, n_q)
    queries_all = jnp.asarray(np.clip(
        data[q_src] + rng.normal(0, 6.0, (n_q, dim)),
        0, 255).round().astype(np.float32))
    queries = queries_all[:batch]

    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (n - 1).bit_length()))
    base = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000, hash_size=hash_size)
    t0 = time.time()
    tree = P.train_tree(base, data[:200_000])
    jax.block_until_ready(tree.cb2)
    print(f"train {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    db = P.build_database(base, tree, data, encode_chunk=1 << 17)
    print(f"build {time.time()-t0:.1f}s", flush=True)

    dbd = jnp.asarray(data)
    _, gt = brute_force_knn(queries_all, dbd, 100, batch=batch)
    gt = np.asarray(gt)
    print("gt done", flush=True)

    # NOT re-jitted: a fresh jit would close over the 512MB database and
    # embed it as an HLO constant (the remote compile service rejects it);
    # eager dispatch matches what bench.py measures.
    t, _ = timeit(lambda q: brute_force_knn_fast(q, dbd, 100)[1], queries)
    print(f"brute: {t:8.2f} ms  {batch/t*1000:9.0f} QPS", flush=True)

    points = [
        ("512/1024 m128 e1024", dict(max_bins=512, max_candidates=1024,
                                     pair_top_m=128, enum_width=1024)),
        ("512/768 m128 e1024", dict(max_bins=512, max_candidates=768,
                                    pair_top_m=128, enum_width=1024)),
        ("512/896 m128 e1024", dict(max_bins=512, max_candidates=896,
                                    pair_top_m=128, enum_width=1024)),
        ("512/1024 m128 e768", dict(max_bins=512, max_candidates=1024,
                                    pair_top_m=128, enum_width=768)),
        ("512/1024 m96 e1024", dict(max_bins=512, max_candidates=1024,
                                    pair_top_m=96, enum_width=1024)),
        ("512/1024 m128 e1024 W12", dict(max_bins=512, max_candidates=1024,
                                         pair_top_m=128, enum_width=1024,
                                         k1_query=12)),
        ("512/1024 m128 e1024 W16", dict(max_bins=512, max_candidates=1024,
                                         pair_top_m=128, enum_width=1024,
                                         k1_query=16)),
    ]
    for name, kw in points:
        cfg = base.replace(**kw)
        # query_knn is already jitted with tree/db as ARGUMENTS (pytrees),
        # so nothing large lands in the compiled program as a constant.
        f = lambda q, cfg=cfg: P.query_knn(cfg, tree, db, q, 100).indices
        t, _ = timeit(f, queries)
        ids = np.concatenate([
            np.asarray(f(queries_all[s:s + batch]))
            for s in range(0, n_q, batch)])
        rec = recall_at(ids, gt, ks=(1, 10, 100))
        print(f"{name:<26} {t:8.2f} ms  {batch/t*1000:9.0f} QPS  "
              f"R@1={rec['R@1']:.4f} R@10={rec['R@10']:.4f} "
              f"R@100={rec['R@100']:.4f}", flush=True)


if __name__ == "__main__":
    main()
