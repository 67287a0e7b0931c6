"""Pair pipeline (cfg.pipeline="pair"): the TPU-tuned query path.

Covers:
  * hash composition: per-pair partial terms must reproduce
    binning.hashed_bin_ids / exact_bin_ids bit-for-bit for every enumerated
    combination (both the exact-radix and the mixing-hash regimes);
  * recall parity with the parts pipeline at a generous probe budget;
  * the compact payload layout round-trips (A, B, lambda, t3, id) and its
    reconstructed distances match the wide layout within the lambda-u8
    quantization error;
  * sharded (multi-chip) query with the pair core matches single-device.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pqt_tpu.config import PQTConfig
from pqt_tpu.models import query as Q
from pqt_tpu.models.db import (build_database, pack_payload_cfg,
                               payload_width, unpack_payload_cfg)
from pqt_tpu.models.query import query_knn
from pqt_tpu.models.tree import train_tree
from pqt_tpu.ops import binning

PAIR_CFG = PQTConfig(
    dim=32, p=4, c1=4, c2=4, line_parts=8, hash_size=1 << 16,
    k1_build=4, k1_query=4, max_bins=256, max_candidates=1024,
    max_vec_per_bin=256, kmeans_iters=10, pair_top_m=64)

HASHED_CFG = PAIR_CFG.replace(hash_size=1 << 10)   # radix**p = 65536 > 1024


@pytest.fixture(scope="module")
def built(clustered_data):
    db_vecs, queries = clustered_data
    tree = train_tree(PAIR_CFG, db_vecs)
    db = build_database(PAIR_CFG, tree, db_vecs, encode_chunk=2048)
    return tree, db, db_vecs, queries


@pytest.mark.parametrize("cfg_name", ["exact", "hashed"])
def test_hash_composition_matches_binning(built, cfg_name):
    """Enumerated bin ids == hashed_bin_ids of the underlying code tuples."""
    cfg = PAIR_CFG if cfg_name == "exact" else HASHED_CFG
    tree, _, _, queries = built
    q = jnp.asarray(queries[:8])
    d_pairs, h_pairs, exact = Q._pair_stage(cfg, tree, q)
    assert exact == (cfg_name == "exact")
    bins = np.asarray(Q._enumerate_bins_pair(cfg, h_pairs, exact))

    # Reference: recover each pair's code tuple by brute-force matching the
    # partial term over all (l1*c2+l2) x (l1*c2+l2) combinations.
    W, c2 = cfg.k1_query, cfg.c2
    from pqt_tpu.models.tree import level1_tables, level2_tables
    d1 = level1_tables(cfg, tree, q)
    d2 = level2_tables(cfg, tree, q)
    _, l1_idx = jax.lax.top_k(-d1, W)
    codes = np.asarray((l1_idx[..., None] * c2 +
                        jnp.arange(c2, dtype=jnp.int32)
                        ).reshape(q.shape[0], cfg.p, -1))
    weights, _ = Q._part_hash_weights(cfg)
    h_np = np.asarray(h_pairs)
    B, n_pairs, M = h_np.shape
    E = bins.shape[1]
    from pqt_tpu.ops import distseq
    seq = distseq.pair_sequence(M, E)
    for b in range(min(B, 3)):
        # per pair, map partial value -> any code pair producing it
        partials = []
        for j in range(2):
            pa = (codes[b, 2 * j][:, None].astype(np.uint32)
                  * weights[2 * j]
                  + codes[b, 2 * j + 1][None, :].astype(np.uint32)
                  * weights[2 * j + 1]).reshape(-1)
            partials.append(set(pa.tolist()))
        for e in range(0, E, max(E // 17, 1)):
            h0 = h_np[b, 0, seq[e, 0]]
            h1 = h_np[b, 1, seq[e, 1]]
            assert int(h0) in partials[0]
            assert int(h1) in partials[1]
            acc = np.uint32(h0) + np.uint32(h1)
            if cfg_name == "exact":
                expect = int(acc)
            else:
                expect = int((np.uint32(acc * np.uint32(2654435761)))
                             >> np.uint32(32 - int(np.log2(cfg.hash_size))))
            assert bins[b, e] == expect


def test_pair_recall_matches_parts(built):
    """At matched generous budgets the two pipelines find the same NNs."""
    tree, db, db_vecs, queries = built
    q = jnp.asarray(queries)
    res_pair = query_knn(PAIR_CFG, tree, db, q, 10)

    parts_cfg = PAIR_CFG.replace(pipeline="parts")
    res_parts = query_knn(parts_cfg, tree, db, q, 10)

    # Both should find the true NN for nearly every query (clustered data,
    # exact bin ids, generous budget).
    from pqt_tpu.ops.distance import brute_force_knn
    _, gt = brute_force_knn(q, jnp.asarray(db_vecs), 1)
    gt = np.asarray(gt)[:, 0]
    hit_pair = (np.asarray(res_pair.indices) == gt[:, None]).any(axis=1)
    hit_parts = (np.asarray(res_parts.indices) == gt[:, None]).any(axis=1)
    # the c1=4 line codes are crude, so absolute recall is modest for BOTH
    # paths; the contract is parity between enumerations.
    assert hit_pair.mean() >= hit_parts.mean() - 0.05
    # and with exact re-rank (isolating the probe stage) recall must be high
    db_v = build_database(PAIR_CFG, tree, db_vecs, encode_chunk=2048,
                          keep_vectors=True)
    res_ex = query_knn(PAIR_CFG, tree, db_v, q, 10, True)
    hit_ex = (np.asarray(res_ex.indices) == gt[:, None]).any(axis=1)
    assert hit_ex.mean() >= 0.95


def test_pair_filter_only_reorders(built):
    """Stage-1 pair filtering must not lose true results (exact ids)."""
    tree, db, db_vecs, queries = built
    q = jnp.asarray(queries)
    res_f = query_knn(PAIR_CFG, tree, db, q, 10)
    res_u = query_knn(PAIR_CFG, tree, db._replace(pair_occ=None), q, 10)
    f_ids = np.asarray(res_f.indices)
    assert (f_ids >= 0).any(axis=1).all()
    # the filter can only improve enumeration (dead pairs move to the tail),
    # so the top-1 hit rate must not degrade
    from pqt_tpu.ops.distance import brute_force_knn
    _, gt = brute_force_knn(q, jnp.asarray(db_vecs), 1)
    gt = np.asarray(gt)[:, 0]
    hit_f = (f_ids == gt[:, None]).any(axis=1).mean()
    hit_u = (np.asarray(res_u.indices) == gt[:, None]).any(axis=1).mean()
    assert hit_f >= hit_u - 1e-9


def test_compact_payload_roundtrip(rng):
    cfg = PAIR_CFG
    assert cfg.payload_is_compact
    n, lp = 64, cfg.line_parts
    ids = np.arange(100, 100 + n, dtype=np.int32)
    a = rng.integers(0, cfg.c1, (n, lp)).astype(np.uint32)
    b = rng.integers(0, cfg.c1, (n, lp)).astype(np.uint32)
    lam8 = rng.integers(0, 256, (n, lp)).astype(np.uint32)
    codes = a | (b << 8) | (lam8 << 24)       # wide layout, u8-grid lambda
    t3 = rng.normal(0, 1, n).astype(np.float32)
    rows = pack_payload_cfg(cfg, ids, codes, t3)
    assert rows.shape == (n, payload_width(cfg))
    got_ids, got_a, got_b, got_lam, got_t3 = (
        np.asarray(x) for x in unpack_payload_cfg(cfg, jnp.asarray(rows)))
    np.testing.assert_array_equal(got_ids, ids)
    np.testing.assert_array_equal(got_a, a.astype(np.int32))
    np.testing.assert_array_equal(got_b, b.astype(np.int32))
    np.testing.assert_array_equal(got_t3, t3)
    from pqt_tpu.ops import triangle
    want_lam = np.asarray(triangle.u8_to_lambda(jnp.asarray(lam8)))
    np.testing.assert_allclose(got_lam, want_lam, rtol=0, atol=0)


def test_compact_matches_wide_distances(clustered_data):
    """Line re-rank distances agree across layouts within lambda-u8 error."""
    db_vecs, queries = clustered_data
    cfg_c = PAIR_CFG
    cfg_w = PAIR_CFG.replace(payload_compact=False)
    tree = train_tree(cfg_c, db_vecs)
    db_c = build_database(cfg_c, tree, db_vecs, encode_chunk=2048)
    db_w = build_database(cfg_w, tree, db_vecs, encode_chunk=2048)
    q = jnp.asarray(queries)
    res_c = query_knn(cfg_c, tree, db_c, q, 10)
    res_w = query_knn(cfg_w, tree, db_w, q, 10)
    # same probe order, so candidate sets match; distances differ only by
    # the lambda quantization (u8 grid vs u16 grid)
    d_c = np.asarray(res_c.dists)
    d_w = np.asarray(res_w.dists)
    finite = np.isfinite(d_c) & np.isfinite(d_w)
    scale = np.abs(d_w[finite]).mean() + 1e-6
    assert np.abs(d_c[finite] - d_w[finite]).mean() / scale < 0.05
    hit = (np.asarray(res_c.indices)[:, 0] == np.asarray(res_w.indices)[:, 0])
    assert hit.mean() > 0.9


def test_sharded_pair_matches_single(built):
    from jax.sharding import Mesh
    from pqt_tpu.parallel import sharded

    tree, db, _, queries = built
    q = jnp.asarray(queries)
    want = query_knn(PAIR_CFG, tree, db, q, 10)

    devices = jax.devices()[:4]
    mesh = Mesh(np.array(devices), ("db",))
    sdb = sharded.place_sharded_db(
        sharded.shard_database(PAIR_CFG, db, 4), mesh)
    qfn = sharded.make_sharded_query_fn(PAIR_CFG, mesh, k=10)
    got = qfn(tree, sdb, q)

    # distances must match; ids can differ only on exact ties
    np.testing.assert_allclose(np.asarray(got.dists),
                               np.asarray(want.dists), rtol=1e-5)
    same = np.asarray(got.indices) == np.asarray(want.indices)
    assert same.mean() > 0.95
