"""Settle the anisotropic-2D traversal question with data (VERDICT r2 #7).

The reference's BIG path orders each part-pair's 2D rank grid with a
precomputed ANISOTROPIC sequence family (10 slopes, key x^0.8 + s*y^0.8,
ProTree.cu:50-126) because sorting thousands of candidate sums per query
inside a CUDA block is expensive.  Our pair pipeline instead orders pairs
EXACTLY by distance sum (top_k over the outer-sum grid) — cheap on the MXU.

This harness compares the two stage-1 orderings at MATCHED probe budget on
the bench fixture, measuring how often the true NN's bin is among the first
`max_bins` probed (the only thing bin ordering can affect).  Exact ordering
is strictly better-ordered by construction; the question is by how much at
realistic budgets — if the margin is negligible the heuristic would be an
acceptable cheaper stage, if not the exact ordering earns its keep.

Run (CPU is fine; ordering quality is hardware-independent):
  JAX_PLATFORMS=cpu python benchmarks/aniso_vs_exact.py [n_db] [n_queries]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # The axon sitecustomize registers the TPU backend regardless of env;
    # force CPU explicitly so this analysis never contends for the chip.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import pqt_tpu as P
from pqt_tpu.models import query as Q
from pqt_tpu.models.db import encode_bins
from pqt_tpu.ops import binning, distseq
from pqt_tpu.ops.distance import brute_force_knn


def stage1_exact(cfg, flat_d2, codes, M):
    """Per pair: top-M (i, j) rank combos by TRUE sum (the pair pipeline)."""
    B, p, L = flat_d2.shape
    out = []
    for j in range(p // 2):
        s = (flat_d2[:, 2 * j, :, None] +
             flat_d2[:, 2 * j + 1, None, :]).reshape(B, L * L)
        idx = np.argsort(s, axis=-1, kind="stable")[:, :M]
        ca = np.take_along_axis(codes[:, 2 * j], idx // L, axis=-1)
        cb = np.take_along_axis(codes[:, 2 * j + 1], idx % L, axis=-1)
        out.append((ca, cb))
    return out


def stage1_aniso(cfg, flat_d2, codes, M):
    """Per pair: first M (i, j) of the anisotropic sequence whose slope
    matches the pair's distance growth (computeSlopeIdx semantics,
    PerturbationProTree.cu:2839-2870)."""
    B, p, L = flat_d2.shape
    seqs = distseq.aniso_2d_sequences(L)          # (n_dir, len, 2)
    out = []
    for j in range(p // 2):
        dx = flat_d2[:, 2 * j, :].mean(-1) - flat_d2[:, 2 * j, 0]
        dy = flat_d2[:, 2 * j + 1, :].mean(-1) - flat_d2[:, 2 * j + 1, 0]
        slope = np.asarray(distseq.slope_index(jnp.asarray(dx),
                                               jnp.asarray(dy)))
        ca = np.empty((B, M), np.int32)
        cb = np.empty((B, M), np.int32)
        for b in range(B):
            sq = seqs[slope[b], :M]
            ca[b] = codes[b, 2 * j, sq[:, 0]]
            cb[b] = codes[b, 2 * j + 1, sq[:, 1]]
        out.append((ca, cb))
    return out


def probed_rate(cfg, pairs, gt_codes, budgets, weights):
    """Fraction of queries whose true bin is among the first E enumerated.

    pairs: [(ca, cb) per part-pair] stage-1 lists; stage 2 enumerates the
    2D traversal over the two lists exactly as _enumerate_bins_pair.
    """
    (ca0, cb0), (ca1, cb1) = pairs
    B, M = ca0.shape
    seq = distseq.pair_sequence(M, max(budgets))
    h0 = (ca0.astype(np.uint64) * weights[0] + cb0.astype(np.uint64) *
          weights[1])
    h1 = (ca1.astype(np.uint64) * weights[2] + cb1.astype(np.uint64) *
          weights[3])
    gt_h = (gt_codes.astype(np.uint64) *
            np.asarray(weights, np.uint64)[None]).sum(-1)
    rates = {}
    for E in budgets:
        sq = seq[:E]
        hit = np.zeros((B,), bool)
        for b in range(B):
            bins = h0[b, sq[:, 0]] + h1[b, sq[:, 1]]
            hit[b] = (bins == gt_h[b]).any()
        rates[E] = float(hit.mean())
    return rates


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    from bench import make_queries, make_sift_like
    data, subcenters = make_sift_like(n, 128, rng)
    queries = make_queries(nq, subcenters, rng)

    cfg = P.SIFT1M_CONFIG.replace(
        kmeans_iters=8, train_subsample=100_000,
        hash_size=1 << max(18, (n - 1).bit_length()))
    tree = P.train_tree(cfg, data[:100_000])

    qd = jnp.asarray(queries)
    _, gt = brute_force_knn(qd, jnp.asarray(data, jnp.float32), 1,
                            batch=nq)
    gt_vec = data[np.asarray(gt)[:, 0]]
    from pqt_tpu.models.db import encode_part_codes
    gt_codes = np.asarray(encode_part_codes(
        cfg, tree, jnp.asarray(gt_vec, jnp.float32)))       # (B, p)

    # per-part sorted candidate lists (shared by both orderings)
    sorted_d2, sorted_codes = (np.asarray(x) for x in
                               Q._sorted_part_lists(cfg, tree, qd))
    # collision-free uint64 mixed-radix encoding for the bin-identity test
    # (ordering quality is independent of the engine's hash reduction)
    r = cfg.part_radix
    w = [r ** 3, r ** 2, r, 1]

    M = 256
    budgets = [128, 512, 2048, 8192]
    ex = stage1_exact(cfg, sorted_d2, sorted_codes, M)
    an = stage1_aniso(cfg, sorted_d2, sorted_codes, M)
    r_ex = probed_rate(cfg, ex, gt_codes, budgets, w)
    r_an = probed_rate(cfg, an, gt_codes, budgets, w)
    print(f"# n={n} nq={nq} M={M}  (fraction of queries whose true-NN bin "
          f"is among the first E enumerated)")
    print(f"{'E':>6} {'exact':>8} {'aniso':>8}")
    for E in budgets:
        print(f"{E:>6} {r_ex[E]:>8.4f} {r_an[E]:>8.4f}")


if __name__ == "__main__":
    main()
