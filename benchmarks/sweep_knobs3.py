"""Knob sweep round 3: refine/exact paths + winning combos (real chip).

Round 2 results (TPU v5e, n=1M, held-out queries):
  line B256 nofilter: 42.6k QPS (winner; pair filter costs more than it
  saves once enum_width == max_bins), B512 base 42.2k.
Jit note: call the engine's own jitted entry points directly — wrapping
them in another jit closes over tree/db and bakes them into the shipped
HLO (the remote-compile backend rejects >~100MB bodies with HTTP 413).

Run:  python benchmarks/sweep_knobs3.py [n_db]
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
from pqt_tpu.utils.metrics import intersection_at


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000, out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = 128
    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like
    data, subcenters = make_sift_like(n, dim, rng)
    qmax = 512
    queries_all = jnp.asarray(make_queries(qmax, subcenters, rng))

    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (n - 1).bit_length()))
    base = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000, hash_size=hash_size,
        max_bins=512, max_candidates=1024, pair_top_m=128, enum_width=512,
        pair_filter=False)
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
    if db.vectors is None:
        db = db._replace(vectors=jnp.asarray(data, jnp.float32))
    print(f"n={n} device={jax.devices()[0]}", flush=True)

    gt_d, gt_all = brute_force_knn(queries_all,
                                   jnp.asarray(data, jnp.float32), 100,
                                   batch=256)
    gt_all = np.asarray(gt_all)

    variants = [
        ("line B256 nofilter", 256, {}, "line"),
        ("line B512 nofilter", 512, {}, "line"),
        ("refine B256", 256, {}, "refine"),
        ("refine B512", 512, {}, "refine"),
        ("exactcore B256", 256, {}, "exact"),
        ("refine B256 filter", 256, dict(pair_filter=True), "refine"),
        ("line ref-budget 4096/4096", 256,
         dict(max_bins=4096, max_candidates=4096, pair_top_m=256,
              enum_width=4096), "line"),
        ("refine ref-budget", 256,
         dict(max_bins=4096, max_candidates=4096, pair_top_m=256,
              enum_width=4096), "refine"),
    ]
    for name, B, kw, mode in variants:
        cfg = base.replace(**kw)
        queries, gt = queries_all[:B], gt_all[:B]
        if mode == "line":
            f = lambda q, _c=cfg: P.query_knn(_c, tree, db, q, 100).indices
        elif mode == "refine":
            f = lambda q, _c=cfg: P.query_knn_refine(
                _c, tree, db, q, 100, k_line=_c.max_candidates).indices
        else:
            f = lambda q, _c=cfg: P.query_knn(
                _c, tree, db, q, 100, True).indices
        t, ids = timeit(f, queries)
        ids = np.asarray(ids)
        r1 = float((ids[:, 0] == gt[:, 0]).mean())
        i10 = intersection_at(ids, gt, ks=(10,))["top10_intersection"]
        qps = B / (t / 1000)
        print(f"{name:28s} {t:7.2f} ms {qps:8.0f} QPS  R@1={r1:.4f} "
              f"I10={i10:.4f}", flush=True)


if __name__ == "__main__":
    main()
