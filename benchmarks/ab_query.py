"""A/B query-path variants on cached 1M artifacts (real chip).

Times query_knn end-to-end for the gather_mode variants (rows | slabs),
verifying result parity against the baseline variant as it goes.  (The
probe_kernel=vmem variants were retired with the kernel in r4 — see
query._probe_bins.)  Uses the artifact cache written by
benchmarks/profile_pair.py (run that first if the cache is cold).

Run:  python benchmarks/ab_query.py [n_db] [batch]
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
    return (time.perf_counter() - t0) / reps * 1000, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dim = 128
    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like
    data, subcenters = make_sift_like(n, dim, rng)
    queries = jnp.asarray(make_queries(batch, subcenters, rng))

    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (n - 1).bit_length()))
    base = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000, hash_size=hash_size,
        max_bins=512, max_candidates=1024, pair_top_m=128, enum_width=2048)
    cache_dir = os.environ.get("PQT_PROFILE_CACHE", "/tmp/pqt_profile_cache")
    tree = artifacts.load_or_build(
        os.path.join(cache_dir, f"tree_n{n}"),
        lambda p: artifacts.load_tree(p, base),
        lambda: P.train_tree(base, data[:200_000]),
        lambda p, t: artifacts.save_tree(p, base, t))
    db = artifacts.load_or_build(
        os.path.join(cache_dir, f"db_n{n}"),
        lambda p: artifacts.load_database(p, base),
        lambda: P.build_database(base, tree, data, encode_chunk=1 << 17),
        lambda p, d: artifacts.save_database(p, base, d))
    print(f"n={n} batch={batch} device={jax.devices()[0]}", flush=True)

    variants = [
        ("xla/rows", dict(gather_mode="rows")),
        ("xla/slabs", dict(gather_mode="slabs")),
    ]
    ref_ids = None
    for name, kw in variants:
        cfg = base.replace(**kw)
        try:
            f = jax.jit(lambda q, _cfg=cfg: P.query_knn(
                _cfg, tree, db, q, 100).indices)
            t, ids = timeit(f, queries)
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
            continue
        ids = np.asarray(ids)
        if name == variants[0][0]:
            ref_ids, agree = ids, "1.0000 (self)"
        elif ref_ids is None:
            agree = "n/a (baseline failed)"
        else:
            agree = f"{float((ids[:, 0] == ref_ids[:, 0]).mean()):.4f}"
        qps = batch / (t / 1000)
        print(f"{name:12s} {t:8.2f} ms  {qps:9.0f} QPS  "
              f"top1-agree={agree}", flush=True)


if __name__ == "__main__":
    main()
