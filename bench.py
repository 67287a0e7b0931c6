"""Benchmark: SIFT1M-scale query throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": QPS, "unit": "queries/s", "vs_baseline": ...}

The reference publishes no numbers (BASELINE.md), so `vs_baseline` is the
speedup over same-chip exact brute-force search at the same batch size — a
hardware-normalized, self-contained baseline.  Additional context fields
(recall, latency, build time) ride along in the same JSON object.

Tree shape matches the reference's SIFT1M operating point
(p=4, c1=c2=16, k1=8, line_parts=16; BASELINE.md).  The probe budget uses
the TPU-tuned knee (max_bins=512, candidates=1024) from
benchmarks/sweep_oppoints.py — recall is identical to the reference-shaped
4096/4096 budget (R@1 0.992 on this fixture) at ~4.5x the throughput, so
the tuned point is the honest production setting.  Dataset is synthetic
SIFT-like (clustered uint8) so the bench is hermetic; env vars override:
  PQT_BENCH_N        database size            (default 1_000_000)
  PQT_BENCH_QUERIES  query count              (default 1024)
  PQT_BENCH_BATCH    query batch size         (default 256)
  PQT_BENCH_MAX_BINS / PQT_BENCH_MAX_CAND     probe budget (512 / 1024)
"""

import json
import os
import time

import numpy as np


def make_sift_like(n, dim, rng, n_centers=1024, sigma=18.0):
    """Clustered uint8 vectors with SIFT-ish value range."""
    centers = rng.uniform(0, 140, (n_centers, dim)).astype(np.float32)
    out = np.empty((n, dim), np.float32)
    chunk = 1 << 20
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        which = rng.integers(0, n_centers, e - s)
        block = centers[which] + rng.normal(0, sigma, (e - s, dim))
        out[s:e] = np.clip(block, 0, 255)
    return np.round(out).astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp

    import pqt_tpu as P
    from pqt_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from pqt_tpu.ops.distance import brute_force_knn
    from pqt_tpu.utils.metrics import recall_at

    n = int(os.environ.get("PQT_BENCH_N", 1_000_000))
    n_queries = int(os.environ.get("PQT_BENCH_QUERIES", 1024))
    batch = int(os.environ.get("PQT_BENCH_BATCH", 256))
    dim = 128
    rng = np.random.default_rng(0)

    db_vecs = make_sift_like(n, dim, rng)
    # Queries are perturbed database rows: like real SIFT query sets, each
    # query has a genuinely close true NN (descriptor correspondences),
    # rather than sitting equidistant from an entire cluster.
    q_src = rng.integers(0, n, n_queries)
    queries = np.clip(
        db_vecs[q_src] + rng.normal(0, 6.0, (n_queries, dim)),
        0, 255).round().astype(np.float32)

    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (n - 1).bit_length()))
    max_bins = int(os.environ.get("PQT_BENCH_MAX_BINS", 512))
    max_cand = int(os.environ.get("PQT_BENCH_MAX_CAND", 1024))
    pair_m = int(os.environ.get("PQT_BENCH_PAIR_M", 128))
    enum_w = int(os.environ.get("PQT_BENCH_ENUM", 2 * max_bins))
    cfg = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000, hash_size=hash_size,
        max_bins=max_bins, max_candidates=max_cand,
        pair_top_m=pair_m, enum_width=enum_w)

    t0 = time.time()
    tree = P.train_tree(cfg, db_vecs[:200_000])
    jax.block_until_ready(tree.cb2)
    t_train = time.time() - t0

    t0 = time.time()
    db = P.build_database(cfg, tree, db_vecs, encode_chunk=1 << 17)
    t_build = time.time() - t0

    # Ground truth (exact) + brute-force throughput baseline.
    qd = jnp.asarray(queries)
    dbd = jnp.asarray(db_vecs)
    _, gt = brute_force_knn(qd, dbd, 100, batch=batch)
    gt = np.asarray(gt)

    def run_batched(fn):
        """Compile on first batch, then time the full sweep."""
        fn(qd[:batch])  # warm-up/compile
        jax.block_until_ready(fn(qd[:batch]))
        t0 = time.time()
        outs = []
        for s in range(0, n_queries, batch):
            outs.append(fn(qd[s:s + batch]))
        jax.block_until_ready(outs[-1])
        dt = time.time() - t0
        return outs, n_queries / dt, dt / (n_queries / batch)

    # PQT query (line re-rank, k=100).
    def pqt_query(q):
        return P.query_knn(cfg, tree, db, q, 100).indices

    res, qps, lat = run_batched(pqt_query)
    ids = np.concatenate([np.asarray(r) for r in res])
    rec = recall_at(ids, gt, ks=(1, 10, 100))

    # Brute-force baseline at the same batch size: full distance scan with
    # the TPU-native approx_max_k top-k (what a production exact-scan
    # deployment would run; exact sort-based top-k is ~100x slower and would
    # flatter us).
    from pqt_tpu.ops.distance import brute_force_knn_fast

    def brute(q):
        return brute_force_knn_fast(q, dbd, 100)[1]

    _, brute_qps, _ = run_batched(brute)

    print(json.dumps({
        "metric": f"qps_sift1m_like_n{n}_b{batch}_line_rerank",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / brute_qps, 3),
        "brute_force_qps": round(brute_qps, 1),
        "p50_batch_latency_ms": round(lat * 1000, 2),
        "recall_at_1": round(rec["R@1"], 4),
        "recall_at_10": round(rec["R@10"], 4),
        "recall_at_100": round(rec["R@100"], 4),
        "train_s": round(t_train, 1),
        "build_s": round(t_build, 1),
        "n_db": n,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
