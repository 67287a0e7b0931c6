"""Recall-vs-candidate-budget sweep: the reference's signature parity curve.

The reference's 1B harness sweeps the re-rank candidate budget nVec =
2^7..2^20 and reports R@1/R@10/R@100 plus R_total (candidate recall) at each
point (/root/reference/test/test1B.cpp:984-1020).  This reproduces that
curve on the synthetic SIFT-like fixture with held-out queries: per budget,
max_candidates = nVec and max_bins = nVec/2 (clamped), measuring

  * R1     : true R@1 (result[0] == gt NN)
  * R10/R100 (nn_in_topk): gt NN anywhere in top-k (testPPQT.cpp foundBest)
  * I10/I100 : true top-k intersection
  * R_total: candidate recall (NN gathered at all — the re-rank ceiling)
  * line / refine quality at each point

Run:  python benchmarks/sweep_recall.py [n_db] [n_queries] [budgets...]
Emits one JSON line per operating point.
"""

import json
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
from pqt_tpu.models.query import query_candidates
from pqt_tpu.ops.distance import brute_force_knn
from pqt_tpu.utils.metrics import (candidate_recall, intersection_at,
                                   recall_at)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    budgets = ([int(b) for b in sys.argv[3:]] if len(sys.argv) > 3
               else [1 << e for e in range(7, 18)])
    batch = min(256, n_queries)
    dim = 128
    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like
    data, subcenters = make_sift_like(n, dim, rng)
    queries = make_queries(n_queries, subcenters, rng)

    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (n - 1).bit_length()))
    base_cfg = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000, hash_size=hash_size)

    t0 = time.time()
    from pqt_tpu.io import artifacts
    cache_dir = os.environ.get("PQT_PROFILE_CACHE", "/tmp/pqt_profile_cache")
    os.makedirs(cache_dir, exist_ok=True)
    tree = artifacts.load_or_build(
        os.path.join(cache_dir, f"tree_n{n}"),
        lambda p: artifacts.load_tree(p, base_cfg),
        lambda: P.train_tree(base_cfg, data[:200_000]),
        lambda p, t: artifacts.save_tree(p, base_cfg, t))
    db = artifacts.load_or_build(
        os.path.join(cache_dir, f"db_n{n}"),
        lambda p: artifacts.load_database(p, base_cfg),
        lambda: P.build_database(base_cfg, tree, data, encode_chunk=1 << 17),
        lambda p, d: artifacts.save_database(p, base_cfg, d))
    if db.vectors is None:      # refine path needs raw vectors
        db = db._replace(vectors=jnp.asarray(data, jnp.float32))
    jax.block_until_ready(db.payload)
    print(f"# train+build/load {time.time() - t0:.1f}s on {jax.devices()[0]}",
          file=sys.stderr, flush=True)

    qd = jnp.asarray(queries)
    dbd = jnp.asarray(data, jnp.float32)
    _, gt = brute_force_knn(qd, dbd, 100, batch=batch)
    gt = np.asarray(gt)

    for nvec in budgets:
        nvec = min(nvec, n)
        cfg = base_cfg.replace(
            max_candidates=nvec,
            max_bins=max(64, min(nvec // 2, 4096)),
            pair_top_m=256,
            enum_width=max(256, min(nvec, 65536)),
            max_vec_per_bin=min(1024, nvec))
        ids_l, ids_r, c_ids, c_valid = [], [], [], []
        t0 = time.time()
        for s in range(0, n_queries, batch):
            q = qd[s:s + batch]
            ids_l.append(np.asarray(
                P.query_knn(cfg, tree, db, q, 100).indices))
            ids_r.append(np.asarray(P.query_knn_refine(
                cfg, tree, db, q, 100, k_line=min(nvec, 4096)).indices))
            ci, cv = query_candidates(cfg, tree, db, q)
            c_ids.append(np.asarray(ci))
            c_valid.append(np.asarray(cv))
        dt = time.time() - t0
        line_ids = np.concatenate(ids_l)
        ref_ids = np.concatenate(ids_r)
        rec = recall_at(line_ids, gt, ks=(10, 100))
        inter = intersection_at(line_ids, gt, ks=(10, 100))
        r_total = candidate_recall(np.concatenate(c_ids),
                                   np.concatenate(c_valid), gt)
        print(json.dumps({
            "nvec": nvec,
            "R1": round(float((line_ids[:, 0] == gt[:, 0]).mean()), 4),
            "R10": round(rec["R@10"], 4),
            "R100": round(rec["R@100"], 4),
            "I10": round(inter["top10_intersection"], 4),
            "I100": round(inter["top100_intersection"], 4),
            "R_total": round(r_total, 4),
            "refine_R1": round(float((ref_ids[:, 0] == gt[:, 0]).mean()), 4),
            "refine_I10": round(intersection_at(ref_ids, gt, ks=(10,))
                                ["top10_intersection"], 4),
            "wall_s": round(dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
