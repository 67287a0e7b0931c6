"""Slab-mode candidate collection: correctness vs the per-row machinery."""

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import build_database
from pqt_tpu.models.query import query_knn
from pqt_tpu.models.tree import train_tree
from pqt_tpu.ops import binning
from pqt_tpu.ops.distance import brute_force_knn
from pqt_tpu.utils import metrics

CFG = PQTConfig(
    dim=32, p=4, c1=8, c2=4, line_parts=8, hash_size=1 << 16,
    k1_build=4, k1_query=4, max_bins=256, bin_enum_factor=4,
    max_candidates=1024, max_vec_per_bin=256, kmeans_iters=10)


def _slab_row_set(slab_starts, slab_valid, S):
    rows = set()
    for t in range(slab_starts.shape[0]):
        for i in range(int(slab_valid[t])):
            rows.add(int(slab_starts[t]) + i)
    return rows


def test_gather_slabs_covers_same_rows_as_row_machinery(rng):
    """With budgets sized to cover everything, slab windows must cover
    EXACTLY the rows the per-row path selects."""
    B, nb, S = 4, 16, 8
    counts = rng.integers(0, 20, (B, nb)).astype(np.int32)
    prefix = np.cumsum(np.concatenate(
        [np.zeros((B, 1), np.int64), counts[:, :-1]], axis=1),
        axis=1).astype(np.int32)
    cap = 64
    k_budget = int(counts.sum(1).max()) + S
    n_slabs = (k_budget + S - 1) // S + nb     # enough for every bin's tail
    s_starts, s_valid = binning.gather_slabs(
        jnp.asarray(prefix), jnp.asarray(counts), n_slabs, S, cap)
    positions, valid = binning.gather_candidates(
        jnp.asarray(prefix), jnp.asarray(counts), k_budget, cap)
    s_starts, s_valid = np.asarray(s_starts), np.asarray(s_valid)
    positions, valid = np.asarray(positions), np.asarray(valid)
    for b in range(B):
        want = set(positions[b][valid[b]].tolist())
        got = _slab_row_set(s_starts[b], s_valid[b], S)
        assert got == want, (b, sorted(got)[:10], sorted(want)[:10])


def test_fetch_slab_rows_end_of_payload(rng):
    """Slabs whose window would run past the payload end shift left and the
    validity window shifts with them (content equivalence)."""
    N, W, S = 20, 3, 8
    payload = rng.integers(0, 100, (N, W)).astype(np.int32)
    # one slab starting at 16 with 4 valid rows: window [12, 20) shifted
    starts = np.array([[16]], np.int32)
    valid_cnt = np.array([[4]], np.int32)
    rows, valid = binning.fetch_slab_rows(
        jnp.asarray(payload), jnp.asarray(starts), jnp.asarray(valid_cnt), S)
    rows, valid = np.asarray(rows)[0], np.asarray(valid)[0]
    got = rows[valid]
    np.testing.assert_array_equal(got, payload[16:20])


@pytest.fixture(scope="module")
def trained(clustered_data):
    db_vecs, queries = clustered_data
    tree = train_tree(CFG, db_vecs)
    db = build_database(CFG, tree, db_vecs, encode_chunk=2048)
    return tree, db, db_vecs, queries


def test_slab_mode_recall_matches_row_mode(trained):
    """End to end: slabs mode reads the same payload content, so recall
    must match rows mode (small tail-of-budget differences allowed)."""
    tree, db, db_vecs, queries = trained
    _, gt = brute_force_knn(jnp.asarray(queries), jnp.asarray(db_vecs), 10)
    r = {}
    for mode, S in (("rows", 32), ("slabs", 32), ("slabs", 8)):
        cfg = CFG.replace(gather_mode=mode, slab_size=S)
        res = query_knn(cfg, tree, db, jnp.asarray(queries), 10)
        r[(mode, S)] = metrics.recall_at(
            np.asarray(res.indices), np.asarray(gt), ks=(10,))["R@10"]
    assert r[("slabs", 32)] >= r[("rows", 32)] - 0.05, r
    assert r[("slabs", 8)] >= r[("rows", 32)] - 0.05, r
