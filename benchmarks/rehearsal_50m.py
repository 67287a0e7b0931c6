"""Billion-path dress rehearsal: chunked out-of-core build + query at >=50M.

VERDICT r2 missing #2 / next-round #3: the flagship reference workflow is
the chunked SIFT1B build (test/test1B.cpp:764-898) — 10M-vector chunks
encoded on device, merged on host, queried with the BIG pipeline.  This
script runs that exact shape at 50M (or any --n) on one chip:

  * data is generated per chunk from the shared two-level cluster model
    (never materializing the full set in RAM at once beyond one chunk);
  * ChunkedDBBuilder streams: device encode -> host histogram + spill;
  * finalize() places rows at final CSR positions with bounded RAM;
  * queries run at the SIFT1B-shaped operating point (k1=16, lp=32,
    8192 bins/8192 candidates per chip — see config.py SIFT1B notes);
  * emits ONE BENCH-style JSON line.

Run:  python benchmarks/rehearsal_50m.py [--n 50000000] [--chunk 10000000]
"""

import argparse
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
from pqt_tpu.models.db import ChunkedDBBuilder
from pqt_tpu.ops.distance import brute_force_knn_fast
from pqt_tpu.utils.metrics import intersection_at, recall_at


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000_000)
    ap.add_argument("--chunk", type=int, default=10_000_000)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--spill", default="/tmp/pqt_rehearsal_spill")
    # Probe budget flags: the remote-compile service on this host stalls on
    # >=8192-bin single-shard query programs (see BASELINE.md backend note),
    # so the single-chip rehearsal defaults to 4096 bins; sharded serving
    # restores the reference's global budget by splitting it across shards.
    ap.add_argument("--bins", type=int, default=4096)
    ap.add_argument("--cand", type=int, default=8192)
    ap.add_argument("--enum", dest="enum_w", type=int, default=8192)
    ap.add_argument("--keep-vectors", action="store_true",
                    help="spill raw vectors (CSR memmap) and ALSO run the "
                         "exact re-rank path (validates the r4 vector-spill "
                         "machinery at scale)")
    args = ap.parse_args()
    n, dim = args.n, 128

    # SIFT1B shape per BASELINE.md, scaled: hash table ~4x the vector count
    # (the reference's 4e8 slots for 1e9 vectors is 0.4x; we can afford 2-4x
    # at 50M for fewer collisions), lp=32 codes, k1=16.
    hash_size = 1 << min(29, max(22, (2 * n - 1).bit_length()))
    cfg = P.SIFT1B_CONFIG.replace(
        hash_size=hash_size, kmeans_iters=8, train_subsample=2_000_000,
        max_bins=args.bins, max_candidates=args.cand, pair_top_m=256,
        enum_width=args.enum_w, max_vec_per_bin=512)

    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like

    # Shared subcluster model; per-chunk generation reuses it so queries
    # have genuine near neighbors somewhere in the 50M set.
    _, subcenters = make_sift_like(1, dim, rng)     # just the model
    queries = make_queries(args.queries, subcenters, rng)

    def gen_chunk(size, seed):
        r = np.random.default_rng(seed)
        which = r.integers(0, subcenters.shape[0], size)
        block = subcenters[which] + r.normal(0, 5.0, (size, dim))
        return np.clip(np.round(block), 0, 255).astype(np.uint8)

    # --- train on a dedicated sample (test1B.cpp:703-724 trains on 2M) ---
    t0 = time.time()
    train = gen_chunk(min(2_000_000, n), seed=999)
    tree = P.train_tree(cfg, train)
    jax.block_until_ready(tree.cb2)
    t_train = time.time() - t0
    del train
    print(f"# train {t_train:.1f}s", file=sys.stderr, flush=True)

    # --- chunked build -----------------------------------------------------
    os.makedirs(os.path.dirname(args.spill) or "/tmp", exist_ok=True)
    t0 = time.time()
    # encode_chunk: the line-code selection materializes (n, lp, c1*c1)
    # grids; at lp=32 a 2^17-row chunk is ~4.3 GB of ephemerals -> OOM on
    # 16 GB HBM.  2^16 keeps encode under ~2.2 GB.
    builder = ChunkedDBBuilder(cfg, tree, encode_chunk=1 << 16,
                               spill_path=args.spill,
                               keep_vectors=args.keep_vectors)
    done = 0
    ci = 0
    while done < n:
        size = min(args.chunk, n - done)
        chunk = gen_chunk(size, seed=ci)
        builder.add_chunk(chunk)
        done += size
        ci += 1
        print(f"# chunk {ci}: {done}/{n} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
        del chunk
    db = builder.finalize()
    jax.block_until_ready(db.payload)
    t_build = time.time() - t0
    print(f"# build {t_build:.1f}s", file=sys.stderr, flush=True)

    # --- occupancy histogram (test1B.cpp:1057-1090 mode-3 analog) ----------
    from pqt_tpu.utils.metrics import occupancy_histogram
    occ = occupancy_histogram(np.asarray(db.counts))
    print(f"# occupancy {occ}", file=sys.stderr, flush=True)

    # --- query timing FIRST (r4 session-state rule: the brute-force scan
    # program poisons the fast dispatch path — BASELINE.md r4) -------------
    qd = jnp.asarray(queries)

    def timed(fn):
        jax.block_until_ready(fn(qd[:args.batch]))
        best = 0.0
        for _ in range(3):
            t0 = time.time()
            outs = [fn(qd[s:s + args.batch])
                    for s in range(0, args.queries, args.batch)]
            jax.block_until_ready(outs)
            best = max(best, args.queries / (time.time() - t0))
        del outs
        # fresh pass with immediate per-batch downloads (bulk fetches after
        # many heavy dispatches hit the relay's ResourceExhausted — r4)
        ids = np.concatenate([np.asarray(fn(qd[s:s + args.batch]))
                              for s in range(0, args.queries, args.batch)])
        return best, ids

    qps_line, ids = timed(
        lambda x: P.query_knn(cfg, tree, db, x, 100).indices)
    qps_exact, ids_exact = (None, None)
    if db.vectors_csr is not None:
        qps_exact, ids_exact = timed(
            lambda x: P.query_knn(cfg, tree, db, x, 100, True).indices)

    # --- approximate ground truth (AFTER all timings) ----------------------
    # Exact 50M x 512 brute force on-chip would dominate the rehearsal;
    # scan the full DB chunk-wise with approx_max_k per chunk and merge —
    # recall target 0.999 makes missed-NN probability negligible for R@1.
    t0 = time.time()
    best_d = np.full((args.queries, 100), np.inf, np.float32)
    best_i = np.full((args.queries, 100), -1, np.int64)
    off = 0
    sub = 1 << 21           # DB rows per scan block: (B, 2M) dists fit HBM
    for ci2 in range(ci):
        size = min(args.chunk, n - off)
        chunk = gen_chunk(size, seed=ci2)
        for bs in range(0, size, sub):
            be = min(size, bs + sub)
            cd = jnp.asarray(chunk[bs:be])
            for s in range(0, args.queries, args.batch):
                d, idx = brute_force_knn_fast(
                    qd[s:s + args.batch], cd, 100, recall_target=0.999)
                d = np.asarray(d)
                idx = np.asarray(idx).astype(np.int64) + off + bs
                cat_d = np.concatenate([best_d[s:s + args.batch], d], axis=1)
                cat_i = np.concatenate([best_i[s:s + args.batch], idx],
                                       axis=1)
                sel = np.argsort(cat_d, axis=1, kind="stable")[:, :100]
                best_d[s:s + args.batch] = np.take_along_axis(cat_d, sel, 1)
                best_i[s:s + args.batch] = np.take_along_axis(cat_i, sel, 1)
            del cd
        off += size
        del chunk
        print(f"# gt chunk {ci2 + 1}/{ci} ({time.time() - t0:.0f}s)",
              file=sys.stderr, flush=True)
    t_gt = time.time() - t0
    gt = best_i

    rec = recall_at(ids, gt, ks=(10, 100))
    inter = intersection_at(ids, gt, ks=(10, 100))
    out = {
        "metric": f"rehearsal_sift1b_shape_n{n}_b{args.batch}",
        "value": round(qps_line, 1),
        "unit": "queries/s",
        "recall_at_1": round(float((ids[:, 0] == gt[:, 0]).mean()), 4),
        "nn_in_top10": round(rec["R@10"], 4),
        "nn_in_top100": round(rec["R@100"], 4),
        "top10_intersection": round(inter["top10_intersection"], 4),
        "train_s": round(t_train, 1),
        "build_s": round(t_build, 1),
        "gt_s": round(t_gt, 1),
        "n_db": n,
        "hash_size": cfg.hash_size,
        "probe_budget": f"{cfg.max_bins}/{cfg.max_candidates}",
        "occupancy": occ,
        "device": str(jax.devices()[0]),
    }
    if qps_exact is not None:
        out.update({
            "exact_qps": round(qps_exact, 1),
            "exact_recall_at_1": round(
                float((ids_exact[:, 0] == gt[:, 0]).mean()), 4),
            "exact_top10_intersection": round(intersection_at(
                ids_exact, gt, ks=(10,))["top10_intersection"], 4),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
