"""Stage-level profiling of the PAIR query pipeline on the current device.

Times each stage of query_core_pair in isolation (each jitted separately) at
the tuned operating point so we know where to spend Pallas effort.  Run:

    python benchmarks/profile_pair.py [n_db] [batch]
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
from pqt_tpu.models import query as Q
from pqt_tpu.models.db import unpack_payload_cfg
from pqt_tpu.models.tree import line_tables
from pqt_tpu.ops import binning
from pqt_tpu.ops.linecodes import reconstruct_dists_idx


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
    from bench import make_sift_like
    data, _ = make_sift_like(n, dim, rng)
    queries = jnp.asarray(np.clip(
        data[rng.integers(0, n, batch)] + rng.normal(0, 6, (batch, dim)),
        0, 255).round().astype(np.float32))

    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (n - 1).bit_length()))
    cfg = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000, hash_size=hash_size,
        max_bins=512, max_candidates=1024)
    from pqt_tpu.io import artifacts
    cache_dir = os.environ.get("PQT_PROFILE_CACHE", "/tmp/pqt_profile_cache")
    os.makedirs(cache_dir, exist_ok=True)
    tree_path = os.path.join(cache_dir, f"tree_n{n}")
    db_path = os.path.join(cache_dir, f"db_n{n}")
    t0 = time.time()
    tree = artifacts.load_or_build(
        tree_path, lambda p: artifacts.load_tree(p, cfg),
        lambda: P.train_tree(cfg, data[:200_000]),
        lambda p, t: artifacts.save_tree(p, cfg, t))
    jax.block_until_ready(tree.cb2)
    print(f"train {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    db = artifacts.load_or_build(
        db_path, lambda p: artifacts.load_database(p, cfg),
        lambda: P.build_database(cfg, tree, data, encode_chunk=1 << 17),
        lambda p, d: artifacts.save_database(p, cfg, d))
    print(f"build {time.time() - t0:.1f}s", flush=True)
    print(f"n={n} batch={batch} max_bins={cfg.max_bins} "
          f"max_cand={cfg.max_candidates} enum={cfg.effective_enum_width} "
          f"device={jax.devices()[0]}", flush=True)

    qf = queries.astype(jnp.float32)

    f_pair = jax.jit(lambda q: Q._pair_stage(cfg, tree, q, db.pair_occ)[:2])
    t, (d_pairs, h_pairs) = timeit(f_pair, qf)
    print(f"pair_stage             {t:8.2f} ms")

    exact = Q._part_hash_weights(cfg)[1]
    f_enum = jax.jit(lambda h: Q._enumerate_bins_pair(cfg, h, exact))
    t, bins = timeit(f_enum, h_pairs)
    print(f"enumerate_bins_pair    {t:8.2f} ms")

    f_probe = jax.jit(lambda b, p2: Q._probe_bins(cfg, b, p2))
    t, (start, cnt) = timeit(f_probe, bins, db.prefix2)
    print(f"probe_bins             {t:8.2f} ms")

    f_gather = jax.jit(lambda s, c: binning.gather_candidates(
        s, c, cfg.max_candidates, cfg.max_vec_per_bin))
    t, (positions, valid) = timeit(f_gather, start, cnt)
    print(f"gather_positions       {t:8.2f} ms")

    def payload(payload_arr, pos, v):
        safe = jnp.where(v, pos, 0)
        return unpack_payload_cfg(cfg, payload_arr[safe])
    f_payload = jax.jit(payload)   # payload as ARG: no 40MB HLO constant
    t, (cand_ids, a_idx, b_idx, lam, cand_t3) = timeit(
        f_payload, db.payload, positions, valid)
    print(f"payload_gather         {t:8.2f} ms")

    f_line = jax.jit(lambda q: line_tables(cfg, tree, q))
    t, q_line = timeit(f_line, qf)
    print(f"line_tables            {t:8.2f} ms")

    f_rerank = jax.jit(lambda a, b, l, ql, t3:
                       reconstruct_dists_idx(a, b, l, ql, t3))
    t, dists = timeit(f_rerank, a_idx, b_idx, lam, q_line, cand_t3)
    print(f"reconstruct_dists      {t:8.2f} ms")

    f_topk = jax.jit(lambda d: jax.lax.top_k(-d, 100))
    t, _ = timeit(f_topk, jnp.where(valid, dists, jnp.inf))
    print(f"top_k(100)             {t:8.2f} ms")

    def f_all(q):
        # direct call: query_knn is already jitted with tree/db as args
        return P.query_knn(cfg, tree, db, q, 100).indices
    t, _ = timeit(f_all, queries)
    print(f"TOTAL query_knn        {t:8.2f} ms   -> {batch / t * 1000:,.0f} QPS")

    # Optional jax.profiler device trace (SURVEY §5.1): view with
    # tensorboard / xprof.  Device-level tracing may be unsupported on
    # remote-tunnel backends; degrade to a note rather than failing.
    trace_dir = os.environ.get("PQT_TRACE_DIR")
    if trace_dir:
        try:
            with jax.profiler.trace(trace_dir):
                for _ in range(5):
                    out = f_all(queries)
                jax.block_until_ready(out)
            print(f"trace written to {trace_dir}")
        except Exception as e:  # noqa: BLE001
            print(f"trace unsupported on this backend: "
                  f"{type(e).__name__}: {e}")

    # ---- roofline: bytes / FLOPs vs device peak (VERDICT r2 weak #6) ----
    # v5e (TPU v5 lite): ~197 TFLOP/s bf16, ~49 TFLOP/s f32 (4x), ~819 GB/s
    # HBM.  The query is a gather/sort workload, so the honest normalizer is
    # BYTES MOVED vs peak BW plus a per-gather-index overhead (~10 ns/row
    # measured by micro_gather2 on this chip), not MFU: the MXU share of
    # this pipeline (pair-stage + enumeration matmuls) is tiny.
    B, E, K = batch, cfg.effective_enum_width, cfg.max_candidates
    L = cfg.k1_query * cfg.c2
    M = min(cfg.pair_top_m, L * L)
    row_b = db.payload.shape[1] * 4
    gathered = dict(
        pair_grids=B * 2 * L * L * 4 * 2,          # outer-sum grids + topk rd
        enum=B * 2 * M * 4 * 4,                    # one-hot matmul operands
        probe=B * E * 8,                           # prefix2 extent rows
        sorts=B * E * 4 * 3 * 2,                   # 3-operand sort rd+wr
        payload=B * K * row_b,                     # candidate row gather
        rerank=B * K * (4 + 4 * cfg.line_parts),   # unpacked lanes (fused)
    )
    total_bytes = sum(gathered.values())
    gather_idx = B * (K + E)                       # per-index fixed overhead
    flops = (B * 2 * L * L                         # pair sums
             + B * 2 * M * E * 2 * 2               # enumeration matmuls
             + B * K * cfg.line_parts * cfg.c1 * 4)  # c1-unrolled rerank
    bw_ms = total_bytes / 819e9 * 1e3
    idx_ms = gather_idx * 10e-9 * 1e3
    mxu_ms = flops / 49e12 * 1e3
    floor = max(bw_ms + idx_ms, mxu_ms)
    print(f"roofline: {total_bytes / 1e6:.1f} MB -> {bw_ms:.2f} ms @819GB/s"
          f" + {gather_idx / 1e3:.0f}k gather-idx -> {idx_ms:.2f} ms"
          f" | {flops / 1e9:.1f} GFLOP -> {mxu_ms:.2f} ms @49TF/s f32")
    print(f"roofline floor ~{floor:.2f} ms vs achieved {t:.2f} ms "
          f"({floor / t * 100:.0f}% of light-speed)")


if __name__ == "__main__":
    main()
