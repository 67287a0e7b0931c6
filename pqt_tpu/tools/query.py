"""CLI: batch-query a built database; report recall and timing.

Equivalent of the reference's tool_query (tool_query.cpp:92-166) plus the
recall analysis of testPPQT/test1B and cpu_version/tools/query.cpp.

Usage:
  python -m pqt_tpu.tools.query --basename out/sift1m --dim 128 \
      --queries sift_query.fvecs [--groundtruth sift_gt.ivecs] [--k 100]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--basename", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--groundtruth", default=None, help=".ivecs exact NNs")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--p", type=int, default=4)
    ap.add_argument("--c1", type=int, default=16)
    ap.add_argument("--c2", type=int, default=16)
    ap.add_argument("--lineparts", type=int, default=16)
    ap.add_argument("--hashsize", type=int, default=1 << 22)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--k1", type=int, default=8, help="L1 probe width W")
    ap.add_argument("--maxbins", type=int, default=4096)
    ap.add_argument("--candidates", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4096,
                    help="query chunk (tool_query.cpp:153 uses 4096)")
    ap.add_argument("--exact-rerank", action="store_true",
                    help="re-rank candidates with exact distances "
                         "(requires --keep-vectors at build)")
    ap.add_argument("--refine", action="store_true",
                    help="two-stage line->exact refine path (works on "
                         "in-RAM and spilled databases)")
    ap.add_argument("--sharded", type=int, default=0, metavar="N",
                    help="serve from a hash-range-sharded database over N "
                         "devices with merged per-shard top-k "
                         "(parallel/sharded.py; SURVEY §5.8)")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from pqt_tpu.config import PQTConfig
    from pqt_tpu.io import artifacts
    from pqt_tpu.models.query import query_knn, query_knn_refine
    from pqt_tpu.tools.create_db import artifact_paths, read_dataset
    from pqt_tpu.utils.metrics import intersection_at, recall_at

    cfg = PQTConfig(dim=args.dim, p=args.p, c1=args.c1, c2=args.c2,
                    line_parts=args.lineparts, hash_size=args.hashsize,
                    k1_query=min(args.k1, args.c1),
                    k1_build=min(16, args.c1), max_bins=args.maxbins,
                    max_candidates=args.candidates)
    paths = artifact_paths(args.basename, cfg)
    tree = artifacts.load_tree(paths["tree"], cfg)
    db = artifacts.load_database(paths["db"], cfg)
    # spilled (sidecar) leaves come back as lazy host memmaps: upload them
    # ONCE — jitted calls would otherwise re-transfer the whole multi-GB
    # database on every batch
    db = db._replace(**{f: jnp.asarray(np.asarray(getattr(db, f)))
                        for f in ("payload", "vectors", "vectors_csr")
                        if isinstance(getattr(db, f), np.memmap)})
    print(f"database: {db.n_vectors} vectors")

    if args.sharded and args.refine:
        raise SystemExit("--refine is not available with --sharded "
                         "(sharded modes: line, or exact via "
                         "--exact-rerank)")
    if args.sharded:
        from jax.sharding import Mesh
        from pqt_tpu.parallel.sharded import (make_sharded_query_fn,
                                              place_sharded_db,
                                              shard_database)
        devs = jax.devices()
        if len(devs) < args.sharded:
            raise SystemExit(f"--sharded {args.sharded} needs that many "
                             f"devices; {len(devs)} visible")
        mesh = Mesh(np.array(devs[:args.sharded]), ("db",))
        sdb = place_sharded_db(shard_database(cfg, db, args.sharded), mesh)
        qfn = make_sharded_query_fn(
            cfg, mesh, args.k,
            mode="exact" if args.exact_rerank else "line")

        def run(q):
            return qfn(tree, sdb, q).indices
    elif args.refine:
        def run(q):
            return query_knn_refine(cfg, tree, db, q, args.k).indices
    else:
        def run(q):
            return query_knn(cfg, tree, db, q, args.k,
                             args.exact_rerank).indices

    queries = np.asarray(read_dataset(args.queries), np.float32)
    n_q = queries.shape[0]
    batch = min(args.batch, n_q)

    results = []
    # warm-up compile on the first batch shape
    pad = (-n_q) % batch
    if pad:
        queries = np.concatenate(
            [queries, np.zeros((pad, args.dim), np.float32)])
    jax.block_until_ready(run(jnp.asarray(queries[:batch])))
    t0 = time.time()
    for s in range(0, queries.shape[0], batch):
        results.append(run(jnp.asarray(queries[s:s + batch])))
    jax.block_until_ready(results[-1])
    dt = time.time() - t0
    ids = np.concatenate([np.asarray(r) for r in results])[:n_q]
    print(f"{n_q} queries in {dt:.3f}s -> {n_q / dt:.0f} QPS, "
          f"{dt / n_q * 1000:.3f} ms/query")

    if args.groundtruth:
        gt = np.asarray(read_dataset(args.groundtruth))
        rec = recall_at(ids, gt, ks=(1, 10, 100))
        inter = intersection_at(ids, gt, ks=(10, 100))
        print("recall:", {**rec, **inter})


if __name__ == "__main__":
    main()
