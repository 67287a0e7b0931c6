"""Knob sweep: fused query QPS + true recall per config variant (real chip).

The stage-level profilers overestimate per-stage cost on this host (about
0.7 ms fixed dispatch latency per jitted call), so tuning decisions must be
made on the FUSED pipeline.  For each variant this measures end-to-end
query_knn QPS and true R@1 / top-10 intersection / candidate recall against
exact ground truth on held-out queries.

Run:  python benchmarks/sweep_knobs.py [n_db] [batch]
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
from pqt_tpu.models.query import query_candidates
from pqt_tpu.ops.distance import brute_force_knn
from pqt_tpu.utils.metrics import candidate_recall, intersection_at


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

    gt_d, gt = brute_force_knn(queries, jnp.asarray(data, jnp.float32), 100,
                               batch=batch)
    gt = np.asarray(gt)

    variants = [
        ("base e2048/m128/b512/c1024", {}),
        ("enum 1024", dict(enum_width=1024)),
        ("enum 512", dict(enum_width=512)),
        ("bins 256 enum 1024", dict(max_bins=256, enum_width=1024)),
        ("pair_m 64", dict(pair_top_m=64)),
        ("cand 512", dict(max_candidates=512)),
        ("cand 2048", dict(max_candidates=2048)),
        ("bins 1024 enum 4096", dict(max_bins=1024, enum_width=4096)),
        ("no pair filter", dict(pair_filter=False)),
    ]
    for name, kw in variants:
        cfg = base.replace(**kw)
        f = jax.jit(lambda q, _c=cfg: P.query_knn(_c, tree, db, q, 100)
                    .indices)
        t, ids = timeit(f, queries)
        ids = np.asarray(ids)
        r1 = float((ids[:, 0] == gt[:, 0]).mean())
        i10 = intersection_at(ids, gt, ks=(10,))["top10_intersection"]
        ci, cv = query_candidates(cfg, tree, db, queries)
        crec = candidate_recall(np.asarray(ci), np.asarray(cv), gt)
        qps = batch / (t / 1000)
        print(f"{name:26s} {t:7.2f} ms {qps:8.0f} QPS  R@1={r1:.4f} "
              f"I10={i10:.4f} cand={crec:.4f}", flush=True)


if __name__ == "__main__":
    main()
