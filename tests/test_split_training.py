"""Tests for sparse/dense split training (createTreeSplitSparse parity)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import build_database
from pqt_tpu.models.query import query_knn
from pqt_tpu.models.tree import (mark_dense_vectors, train_tree,
                                 train_tree_split, _train_level1)
from pqt_tpu.ops.distance import brute_force_knn
from pqt_tpu.utils import metrics

CFG = PQTConfig(dim=32, p=4, c1=8, c2=4, line_parts=8, hash_size=1 << 16,
                k1_build=4, k1_query=4, max_bins=256, max_candidates=1024,
                max_vec_per_bin=256, kmeans_iters=8)


def test_mark_dense_vectors_covers_percent(clustered_data):
    db_vecs, _ = clustered_data
    import jax
    data = jnp.asarray(db_vecs)
    _, assign1 = _train_level1(CFG, data, jax.random.PRNGKey(0))
    mask = np.asarray(mark_dense_vectors(CFG, assign1, 0.3))
    frac = mask.mean()
    # covers at least 30% (inclusive of the crossing bin) but not everything
    assert 0.3 <= frac < 0.95, frac


def test_split_training_two_trees(clustered_data):
    db_vecs, queries = clustered_data
    dense_tree, sparse_tree, dense_mask = train_tree_split(CFG, db_vecs)
    dm = np.asarray(dense_mask)
    # shared L1, different L2
    np.testing.assert_array_equal(np.asarray(dense_tree.cb1),
                                  np.asarray(sparse_tree.cb1))
    assert not np.array_equal(np.asarray(dense_tree.cb2),
                              np.asarray(sparse_tree.cb2))

    # two-database query: each population goes into its own DB (test1B
    # modes 5/6); union recall should be high
    dvecs = db_vecs[dm]
    svecs = db_vecs[~dm]
    d_ids = np.where(dm)[0]
    s_ids = np.where(~dm)[0]
    db_d = build_database(CFG, dense_tree, dvecs, encode_chunk=2048)
    db_s = build_database(CFG, sparse_tree, svecs, encode_chunk=2048)
    rd = query_knn(CFG, dense_tree, db_d, jnp.asarray(queries), 10)
    rs = query_knn(CFG, sparse_tree, db_s, jnp.asarray(queries), 10)
    # map shard-local ids back to global
    gd = np.where(np.asarray(rd.indices) >= 0,
                  d_ids[np.maximum(np.asarray(rd.indices), 0)], -1)
    gs = np.where(np.asarray(rs.indices) >= 0,
                  s_ids[np.maximum(np.asarray(rs.indices), 0)], -1)
    merged = np.concatenate([gd, gs], axis=1)
    _, gt = brute_force_knn(jnp.asarray(queries), jnp.asarray(db_vecs), 10)
    # R@20 over the union of both result lists (columns 0-9 dense, 10-19
    # sparse): the union of databases contains every vector, so the true NN
    # should usually appear in one of the two lists
    r = metrics.recall_at(merged, np.asarray(gt), ks=(20,))
    assert r["R@20"] >= 0.5, r
