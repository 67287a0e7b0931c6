"""Steady-state (device-resident, pipelined) chip throughput for every
query path + brute force, after the r4 discovery that all r3 numbers were
axon-tunnel dispatch-bound (benchmarks/bisect_headline.py):

  P1/P4 device-resident protocols  ~0.20-0.27 ms/batch (~1M QPS)
  P6 host-upload-per-call          ~9.1 ms/batch       (28k QPS)

The tunnel's ~9 ms/128KB upload + ~0.7 ms dispatch RTT are artifacts of
the remote dev environment, not of TPU hardware (real hosts feed chips by
PCIe/DMA at GB/s).  Steady-state pipelined throughput with queries and
results on device is the honest chip metric; brute force is measured the
same way so vs_baseline stays apples-to-apples.

Run: python benchmarks/steadystate.py [n_db]
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
from pqt_tpu.utils.metrics import intersection_at


def steady_qps(fn, queries, B, min_batches=64):
    """Pipelined steady-state QPS over distinct device-resident batches."""
    n = queries.shape[0]
    nb = n // B
    jax.block_until_ready(fn(queries[:B]))          # compile + warm
    passes = max(1, -(-min_batches // nb))
    t0 = time.perf_counter()
    out = None
    for _ in range(passes):
        for s in range(nb):
            out = fn(queries[s * B:(s + 1) * B])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return passes * nb * B / dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
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
    print(f"n={n} device={jax.devices()[0]}", flush=True)
    t0 = time.perf_counter()
    if db.vectors is None:
        db = db._replace(vectors=jnp.asarray(data, jnp.float32))
    jax.block_until_ready(db.vectors)
    print(f"[t] vectors upload {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    dbd = jnp.asarray(data, jnp.float32)
    jax.block_until_ready(dbd)
    print(f"[t] dbd upload {time.perf_counter() - t0:.1f}s", flush=True)

    B = 256
    t0 = time.perf_counter()
    gt = np.asarray(brute_force_knn(queries[:1024], dbd, 100, batch=B)[1])
    print(f"[t] ground truth {time.perf_counter() - t0:.1f}s", flush=True)

    ref_cfg = cfg.replace(max_bins=4096, max_candidates=4096,
                          pair_top_m=256, enum_width=4096)
    runs = [
        ("exact 512/1024", lambda x: P.query_knn(
            cfg, tree, db, x, 100, True).indices),
        ("line 512/1024", lambda x: P.query_knn(
            cfg, tree, db, x, 100).indices),
        ("refine 512/1024", lambda x: P.query_knn_refine(
            cfg, tree, db, x, 100, k_line=cfg.max_candidates).indices),
        ("exact ref-budget 4096/4096", lambda x: P.query_knn(
            ref_cfg, tree, db, x, 100, True).indices),
        ("brute force (approx_max_k)", lambda x: brute_force_knn_fast(
            x, dbd, 100)[1]),
    ]
    for name, fn in runs:
        print(f"[t] starting {name}", flush=True)
        try:
            qps = steady_qps(fn, queries, B)
        except Exception as e:  # noqa: BLE001
            print(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        ids = np.concatenate([np.asarray(fn(queries[s:s + B]))
                              for s in range(0, 1024, B)])
        r1 = float((ids[:, 0] == gt[:, 0]).mean())
        i10 = intersection_at(ids, gt, ks=(10,))["top10_intersection"]
        print(f"{name:30s} {qps:9.0f} QPS  ({B / qps * 1000:6.3f} ms/batch)"
              f"  R@1={r1:.4f} I10={i10:.4f}", flush=True)


if __name__ == "__main__":
    main()
