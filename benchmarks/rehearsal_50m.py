"""Billion-path dress rehearsal: chunked out-of-core build + query at >=20M.

VERDICT r3 #2: the flagship reference workflow is the chunked SIFT1B build
(test/test1B.cpp:764-898) — chunks encoded on device, merged on host,
queried at the SIFT1B operating shape.  This harness runs that workflow
with the engine's multi-process build path (db.encode_chunk_to_file per
worker + db.merge_chunk_files host merge — the same shape a multi-host
build uses, SURVEY §2.4), staged into separate processes because the dev
relay breaks device->host transfers in heavy sessions (BASELINE.md r4):

  train   (TPU)  train on a sample, save the tree artifact
  encode_i(TPU)  one fresh process per chunk: gen data, encode, write npz
  gt      (CPU)  exact ground truth via torch (f32 scan + f64 re-rank of
                 the top-200), runs CONCURRENTLY with the encodes
  merge   (host) streaming counting-sort into CSR (+ vector spill memmap)
  query   (TPU)  upload merged CSR, steady-state timings, NO downloads
  recall  (CPU)  line ids + host-f64 exact re-rank of the candidate set
  parent  (host) metrics + ONE BENCH-style JSON line

Run:  python benchmarks/rehearsal_50m.py [--n 20000000] [--chunk 2000000]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DIM = 128
WORK = os.environ.get("PQT_REHEARSAL_DIR", "/tmp/pqt_rehearsal")


def build_cfg(args):
    import pqt_tpu as P
    hash_size = 1 << min(29, max(22, (2 * args.n - 1).bit_length()))
    return P.SIFT1B_CONFIG.replace(
        hash_size=hash_size, kmeans_iters=8,
        train_subsample=args.train_n,
        max_bins=args.bins, max_candidates=args.cand, pair_top_m=256,
        enum_width=args.enum_w, max_vec_per_bin=512)


def cluster_model(n):
    """Two-level cluster model scaled with n: keep ~20 points per
    subcluster so NN structure (and the bin-occupancy distribution) stays
    SIFT-like at any scale.  The first 20M rehearsal used the fixed 65k
    subcenters of the 1M bench and collapsed 20M points into ~28k bins
    (717 mean occupancy — candidate recall 0.17 at an 8192 budget); that
    measured the fixture's mode count, not the engine."""
    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like
    # Mode diversity must scale with n in BOTH levels: with a fixed 1024
    # coarse clusters the coarse identity dominates all p parts jointly
    # and the tree can only realize ~56k distinct bins no matter how many
    # subclusters exist (run 2 of the 20M rehearsal).  ~320 points per
    # coarse cluster and ~20 per subcluster keeps bin occupancy SIFT-like
    # at any scale.
    n_coarse = max(1024, n // 320)
    _, subcenters = make_sift_like(1, DIM, rng, n_coarse=n_coarse,
                                   subs_per_coarse=16)
    return subcenters, make_queries


def gen_chunk(subcenters, size, seed):
    r = np.random.default_rng(seed)
    which = r.integers(0, subcenters.shape[0], size)
    block = subcenters[which] + r.normal(0, 5.0, (size, DIM))
    return np.clip(np.round(block), 0, 255).astype(np.uint8)


def parse():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000)
    ap.add_argument("--chunk", type=int, default=2_000_000)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    # 200k is the largest train sample whose session can still export the
    # tree through the relay (D2H breaks after ~1M-row k-means, r4);
    # proportionally it is 1% of a 20M build vs the reference's 0.2% for
    # 1B (test1B.cpp:703-724).
    ap.add_argument("--train-n", type=int, default=200_000)
    ap.add_argument("--bins", type=int, default=4096)
    ap.add_argument("--cand", type=int, default=8192)
    ap.add_argument("--enum", dest="enum_w", type=int, default=8192)
    ap.add_argument("--mode", default="full")
    ap.add_argument("--chunk-id", type=int, default=-1)
    # 100M+: payload+hash fit HBM but raw vectors (12.8 GB at 100M) do
    # not — keep the exact/refine stages HOST-side (the recall stage's
    # memmap re-rank) and serve the line path on device only.
    ap.add_argument("--skip-exact-device", action="store_true")
    return ap.parse_args()


def tree_paths():
    return os.path.join(WORK, "tree")


def stage_train(args):
    import jax
    import pqt_tpu as P
    from pqt_tpu.io import artifacts
    from pqt_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    cfg = build_cfg(args)
    subcenters, _ = cluster_model(args.n)
    train = gen_chunk(subcenters, args.train_n, seed=999)
    t0 = time.time()
    tree = P.train_tree(cfg, train)
    jax.block_until_ready(tree.cb2)
    artifacts.save_tree(tree_paths(), cfg, tree)
    print(json.dumps({"train_s": round(time.time() - t0, 1)}))


def stage_encode(args):
    from pqt_tpu.io import artifacts
    from pqt_tpu.models.db import encode_chunk_to_file
    from pqt_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    cfg = build_cfg(args)
    tree = artifacts.load_tree(tree_paths(), cfg)
    subcenters, _ = cluster_model(args.n)
    i = args.chunk_id
    size = min(args.chunk, args.n - i * args.chunk)
    data = gen_chunk(subcenters, size, seed=i)
    t0 = time.time()
    n = encode_chunk_to_file(
        cfg, tree, data, i * args.chunk,
        os.path.join(WORK, f"chunk{i}.npz"),
        encode_chunk=1 << 16, keep_vectors=True)
    print(json.dumps({"chunk": i, "rows": n,
                      "encode_s": round(time.time() - t0, 1)}))


def stage_gt(args):
    """Exact GT: f32 torch scan for top-200, f64 re-rank to top-100."""
    if os.path.exists(os.path.join(WORK, "gt.npy")):
        print(json.dumps({"gt_s": 0.0, "gt": "cached"}))
        return
    import torch
    torch.set_num_threads(os.cpu_count() or 8)
    subcenters, make_queries = cluster_model(args.n)
    queries = make_queries(args.queries, subcenters,
                           np.random.default_rng(0))
    q32 = torch.from_numpy(queries)                     # (Q, dim) f32
    qn = (q32 * q32).sum(1)
    Q = args.queries
    best_d = torch.full((Q, 200), float("inf"))
    best_i = torch.full((Q, 200), -1, dtype=torch.int64)
    t0 = time.time()
    n_chunks = -(-args.n // args.chunk)
    for ci in range(n_chunks):
        size = min(args.chunk, args.n - ci * args.chunk)
        c = torch.from_numpy(
            gen_chunk(subcenters, size, seed=ci).astype(np.float32))
        cn = (c * c).sum(1)
        for s in range(0, Q, 64):
            d = (qn[s:s + 64, None] + cn[None, :]
                 - 2.0 * (q32[s:s + 64] @ c.T))
            v, idx = torch.topk(d, 200, dim=1, largest=False)
            cat_d = torch.cat([best_d[s:s + 64], v], dim=1)
            cat_i = torch.cat([best_i[s:s + 64],
                               idx + ci * args.chunk], dim=1)
            v2, sel = torch.topk(cat_d, 200, dim=1, largest=False)
            best_d[s:s + 64] = v2
            best_i[s:s + 64] = torch.gather(cat_i, 1, sel)
        print(f"# gt chunk {ci + 1}/{n_chunks} ({time.time() - t0:.0f}s)",
              file=sys.stderr, flush=True)
    # f64 re-rank of the 200 survivors per query (exact ordering);
    # regenerate each source chunk ONCE and scatter its distances.
    cand = best_i.numpy()                               # (Q, 200)
    q64 = queries.astype(np.float64)
    d64 = np.empty(cand.size, np.float64)
    flat = cand.ravel()
    chunk_of = flat // args.chunk
    for ci in np.unique(chunk_of):
        size = min(args.chunk, args.n - int(ci) * args.chunk)
        arr = gen_chunk(subcenters, size, seed=int(ci))
        sel = np.nonzero(chunk_of == ci)[0]
        v = arr[flat[sel] - int(ci) * args.chunk].astype(np.float64)
        d64[sel] = ((v - q64[sel // 200]) ** 2).sum(1)
    d64 = d64.reshape(Q, 200)
    sel100 = np.argsort(d64, axis=1, kind="stable")[:, :100]
    gt = np.take_along_axis(cand, sel100, axis=1)
    np.save(os.path.join(WORK, "gt.npy"), gt)
    print(json.dumps({"gt_s": round(time.time() - t0, 1)}))


def stage_merge(args):
    from pqt_tpu.io import artifacts
    from pqt_tpu.models.db import merge_chunk_files
    from pqt_tpu.utils.metrics import occupancy_histogram
    cfg = build_cfg(args)
    tree = artifacts.load_tree(tree_paths(), cfg)
    n_chunks = -(-args.n // args.chunk)
    paths = [os.path.join(WORK, f"chunk{i}.npz") for i in range(n_chunks)]
    t0 = time.time()
    db = merge_chunk_files(cfg, tree, paths, keep_vectors=True,
                           spill_path=os.path.join(WORK, "spill"),
                           to_device=False)
    np.save(os.path.join(WORK, "prefix.npy"), db.prefix)
    np.save(os.path.join(WORK, "counts.npy"), db.counts)
    # payload/vectors live in the spill memmaps already
    occ = occupancy_histogram(np.asarray(db.counts))
    print(json.dumps({"merge_s": round(time.time() - t0, 1),
                      "n_rows": int(db.payload.shape[0]),
                      "occupancy": occ}))


def load_merged(args, cfg):
    from pqt_tpu.models.db import PQTDatabase, payload_width
    prefix = np.load(os.path.join(WORK, "prefix.npy"))
    counts = np.load(os.path.join(WORK, "counts.npy"))
    w = payload_width(cfg)
    payload = np.memmap(os.path.join(WORK, "spill"), np.int32, mode="r",
                        shape=(args.n, w))
    vecs = np.memmap(os.path.join(WORK, "spill.vecs"), np.uint8, mode="r",
                     shape=(args.n, DIM))
    prefix2 = np.stack([prefix, prefix + counts], axis=1)
    return PQTDatabase(prefix=prefix, counts=counts, payload=payload,
                       pair_occ=None, vectors=None, prefix2=prefix2,
                       vectors_csr=vecs)


def stage_query(args):
    """TPU timing: upload merged CSR, steady-state timings, NO downloads."""
    import jax
    import jax.numpy as jnp
    import pqt_tpu as P
    from pqt_tpu.io import artifacts
    from pqt_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    cfg = build_cfg(args)
    tree = artifacts.load_tree(tree_paths(), cfg)
    dbh = load_merged(args, cfg)
    t0 = time.time()
    db = dbh._replace(
        prefix=jnp.asarray(dbh.prefix), counts=jnp.asarray(dbh.counts),
        payload=jnp.asarray(np.asarray(dbh.payload)),
        prefix2=jnp.asarray(dbh.prefix2),
        vectors_csr=(None if args.skip_exact_device else
                     jnp.asarray(np.asarray(dbh.vectors_csr))))
    jax.block_until_ready(db.payload)
    t_up = time.time() - t0
    subcenters, make_queries = cluster_model(args.n)
    qd = jnp.asarray(make_queries(args.queries, subcenters,
                                  np.random.default_rng(0)))
    B = args.batch
    out = {"upload_s": round(t_up, 1)}
    fns = [("line", lambda x: P.query_knn(cfg, tree, db, x, 100).indices)]
    if not args.skip_exact_device:
        fns += [
            ("exact", lambda x: P.query_knn(cfg, tree, db, x, 100,
                                            True).indices),
            # out-of-core refine (r5): line top-1024 by CSR position, then
            # exact re-rank of those rows only — the fastest accurate mode
            # now served directly from the spilled CSR vectors
            ("refine", lambda x: P.query_knn_refine(
                cfg, tree, db, x, 100, k_line=1024).indices)]
    for name, fn in fns:
        jax.block_until_ready(fn(qd[:B]))
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [fn(qd[s:s + B])
                    for s in range(0, args.queries, B)]
            jax.block_until_ready(outs)
            best = max(best, args.queries / (time.perf_counter() - t0))
        out[f"{name}_qps"] = round(best, 1)
        print(f"# {name} {best:.0f} QPS", file=sys.stderr, flush=True)
    print(json.dumps(out))


def stage_recall(args):
    """CPU: line ids + host-f64 exact re-rank of the gathered candidates."""
    import jax.numpy as jnp
    import pqt_tpu as P
    from pqt_tpu.io import artifacts
    from pqt_tpu.models.query import query_candidates
    cfg = build_cfg(args)
    tree = artifacts.load_tree(tree_paths(), cfg)
    db = load_merged(args, cfg)
    db = db._replace(payload=np.asarray(db.payload), vectors_csr=None)
    subcenters, make_queries = cluster_model(args.n)
    queries = make_queries(args.queries, subcenters,
                           np.random.default_rng(0))
    qd = jnp.asarray(queries)
    vecs = np.memmap(os.path.join(WORK, "spill.vecs"), np.uint8, mode="r",
                     shape=(args.n, DIM))
    # invert CSR once (original id -> CSR position) for the vector memmap
    pos_of_id = np.empty(args.n, np.int64)
    pos_of_id[db.payload[:, 0]] = np.arange(args.n)
    B = args.batch
    line_rows, exact_rows, refine_rows = [], [], []
    for s in range(0, args.queries, B):
        line_top = np.asarray(
            P.query_knn(cfg, tree, db, qd[s:s + B], 1024).indices)
        line_rows.append(line_top[:, :100])
        ci, cv = query_candidates(cfg, tree, db, qd[s:s + B])
        ci, cv = np.asarray(ci), np.asarray(cv)
        block = np.full((ci.shape[0], 100), -1, np.int64)
        refine_block = np.full((ci.shape[0], 100), -1, np.int64)
        for j in range(ci.shape[0]):
            cand = np.unique(ci[j][cv[j] & (ci[j] >= 0)])
            if cand.size == 0:
                continue
            v = vecs[pos_of_id[cand]].astype(np.float64)
            d = ((v - queries[s + j].astype(np.float64)) ** 2).sum(1)
            order = np.argsort(d, kind="stable")[:100]
            block[j, :order.size] = cand[order]
            # refine path: exact re-rank of the line top-1024 only (host
            # twin of query_knn_refine's CSR-position gather)
            rc = line_top[j][line_top[j] >= 0]
            if rc.size:
                rv = vecs[pos_of_id[rc]].astype(np.float64)
                rd = ((rv - queries[s + j].astype(np.float64)) ** 2).sum(1)
                ro = np.argsort(rd, kind="stable")[:100]
                refine_block[j, :ro.size] = rc[ro]
        exact_rows.append(block)
        refine_rows.append(refine_block)
    ids_line = np.concatenate(line_rows)
    ids_exact = np.concatenate(exact_rows)
    np.save(os.path.join(WORK, "ids_line.npy"), ids_line)
    np.save(os.path.join(WORK, "ids_exact.npy"), ids_exact)
    np.save(os.path.join(WORK, "ids_refine.npy"),
            np.concatenate(refine_rows))
    print(json.dumps({"recall_rows": int(ids_line.shape[0])}))


def run_stage(args, mode, extra=(), env_cpu=False, timeout=3600):
    env = dict(os.environ)
    if env_cpu:
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, os.path.abspath(__file__),
           "--n", str(args.n), "--chunk", str(args.chunk),
           "--queries", str(args.queries), "--batch", str(args.batch),
           "--train-n", str(args.train_n), "--bins", str(args.bins),
           "--cand", str(args.cand), "--enum", str(args.enum_w),
           "--mode", mode, *extra]
    if args.skip_exact_device:
        cmd.append("--skip-exact-device")
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=timeout)
    sys.stderr.write(r.stderr[-1500:])
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-1500:])
        raise SystemExit(f"rehearsal stage {mode} failed")
    return json.loads([ln for ln in r.stdout.splitlines()
                       if ln.startswith("{")][-1])


def main():
    args = parse()
    os.makedirs(WORK, exist_ok=True)
    if args.mode == "train":
        return stage_train(args)
    if args.mode == "encode":
        return stage_encode(args)
    if args.mode == "gt":
        return stage_gt(args)
    if args.mode == "merge":
        return stage_merge(args)
    if args.mode == "query":
        return stage_query(args)
    if args.mode == "recall":
        return stage_recall(args)

    # ---- orchestrator (strip the TPU plugin from THIS process) ----------
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        env = dict(os.environ)
        env["PQT_AXON_STASH"] = env.pop("PALLAS_AXON_POOL_IPS")
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                  env)
    stash = os.environ.pop("PQT_AXON_STASH", None)

    def tpu_env():
        e = dict(os.environ)
        if stash:
            e["PALLAS_AXON_POOL_IPS"] = stash
        return e

    # GT runs concurrently on CPU (torch only, no TPU session)
    gt_cmd = [sys.executable, os.path.abspath(__file__),
              "--n", str(args.n), "--chunk", str(args.chunk),
              "--queries", str(args.queries), "--mode", "gt"]
    gt_env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    gt_proc = subprocess.Popen(gt_cmd, env=gt_env, stdout=subprocess.PIPE,
                               stderr=subprocess.DEVNULL, text=True)

    def run_tpu(mode, extra=(), timeout=3600):
        env = tpu_env()
        cmd = [sys.executable, os.path.abspath(__file__),
               "--n", str(args.n), "--chunk", str(args.chunk),
               "--queries", str(args.queries), "--batch", str(args.batch),
               "--train-n", str(args.train_n), "--bins", str(args.bins),
               "--cand", str(args.cand), "--enum", str(args.enum_w),
               "--mode", mode, *extra]
        if args.skip_exact_device:
            cmd.append("--skip-exact-device")
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=timeout)
        sys.stderr.write(r.stderr[-1500:] + "\n")
        if r.returncode != 0:
            sys.stderr.write(r.stdout[-1500:] + "\n")
            raise SystemExit(f"rehearsal stage {mode} failed")
        return json.loads([ln for ln in r.stdout.splitlines()
                           if ln.startswith("{")][-1])

    out = {"metric": f"rehearsal_sift1b_shape_n{args.n}_b{args.batch}",
           "unit": "queries/s", "n_db": args.n}
    out.update(run_tpu("train"))
    print("# trained", file=sys.stderr, flush=True)
    t0 = time.time()
    n_chunks = -(-args.n // args.chunk)
    for i in range(n_chunks):
        r = run_tpu("encode", ("--chunk-id", str(i)))
        print(f"# encoded chunk {i + 1}/{n_chunks} "
              f"({r['encode_s']}s)", file=sys.stderr, flush=True)
    out["build_encode_s"] = round(time.time() - t0, 1)
    out.update(run_stage(args, "merge", env_cpu=True))
    print("# merged", file=sys.stderr, flush=True)
    out.update(run_tpu("query"))
    print("# queried", file=sys.stderr, flush=True)
    out.update(run_stage(args, "recall", env_cpu=True, timeout=5400))
    print("# recall done; waiting for gt", file=sys.stderr, flush=True)
    gt_out, _ = gt_proc.communicate(timeout=5400)
    if gt_proc.returncode != 0:
        raise SystemExit("gt stage failed")
    out.update(json.loads([ln for ln in gt_out.splitlines()
                           if ln.startswith("{")][-1]))

    from pqt_tpu.utils.metrics import intersection_at, recall_at
    gt = np.load(os.path.join(WORK, "gt.npy"))
    ids_line = np.load(os.path.join(WORK, "ids_line.npy"))
    ids_exact = np.load(os.path.join(WORK, "ids_exact.npy"))
    rec = recall_at(ids_exact, gt, ks=(10, 100))
    out.update({
        "value": out.pop("exact_qps", None) or out["line_qps"],
        "recall_at_1": round(float((ids_exact[:, 0] == gt[:, 0]).mean()), 4),
        "nn_in_top10": round(rec["R@10"], 4),
        "nn_in_top100": round(rec["R@100"], 4),
        "top10_intersection": round(intersection_at(
            ids_exact, gt, ks=(10,))["top10_intersection"], 4),
        "line_recall_at_1": round(
            float((ids_line[:, 0] == gt[:, 0]).mean()), 4),
        "line_top10_intersection": round(intersection_at(
            ids_line, gt, ks=(10,))["top10_intersection"], 4),
        "probe_budget": f"{args.bins}/{args.cand}",
    })
    refine_path = os.path.join(WORK, "ids_refine.npy")
    if os.path.exists(refine_path):
        ids_refine = np.load(refine_path)
        out["refine_recall_at_1"] = round(
            float((ids_refine[:, 0] == gt[:, 0]).mean()), 4)
        out["refine_top10_intersection"] = round(intersection_at(
            ids_refine, gt, ks=(10,))["top10_intersection"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
