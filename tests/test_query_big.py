"""Tests for the two-stage BIG query path."""

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import build_database
from pqt_tpu.models.query import query_knn
from pqt_tpu.models.query_big import query_big_knn, query_big_knn_perfect
from pqt_tpu.models.tree import train_tree
from pqt_tpu.ops.distance import brute_force_knn
from pqt_tpu.utils import metrics

CFG = PQTConfig(
    dim=32, p=4, c1=8, c2=4, line_parts=8, hash_size=1 << 16,
    k1_build=4, k1_query=4, max_bins=256, bin_enum_factor=4,
    max_candidates=1024, max_vec_per_bin=256, kmeans_iters=10)


@pytest.fixture(scope="module")
def built(clustered_data):
    db_vecs, queries = clustered_data
    tree = train_tree(CFG, db_vecs)
    db = build_database(CFG, tree, db_vecs, keep_vectors=True,
                        encode_chunk=2048)
    _, gt = brute_force_knn(jnp.asarray(queries), jnp.asarray(db_vecs), 10)
    return tree, db, db_vecs, queries, np.asarray(gt)


def test_big_query_recall_at_least_standard(built):
    tree, db, db_vecs, queries, gt = built
    big = query_big_knn(CFG, tree, db, jnp.asarray(queries), 10,
                        64)
    std = query_knn(CFG, tree, db, jnp.asarray(queries), 10)
    r_big = metrics.recall_at(np.asarray(big.indices), gt, ks=(10,))
    r_std = metrics.recall_at(np.asarray(std.indices), gt, ks=(10,))
    # exact two-stage ordering probes at least as good a bin set
    assert r_big["R@10"] >= r_std["R@10"] - 0.05, (r_big, r_std)


def test_big_perfect_rerank_high_recall(built):
    tree, db, db_vecs, queries, gt = built
    res = query_big_knn_perfect(CFG, tree, db, jnp.asarray(queries), 10,
                                16, 64)
    r = metrics.recall_at(np.asarray(res.indices), gt, ks=(1, 10))
    assert r["R@1"] >= 0.8, r


def test_big_results_sorted(built):
    tree, db, _, queries, _ = built
    res = query_big_knn(CFG, tree, db, jnp.asarray(queries), 10, 64)
    d = np.asarray(res.dists)
    fin = np.isfinite(d)
    for row, m in zip(d, fin):
        vals = row[m]
        assert (np.diff(vals) >= -1e-5).all()


def test_big_rejects_odd_parts(clustered_data):
    db_vecs, queries = clustered_data
    cfg = PQTConfig(dim=33, p=3, c1=8, c2=4, line_parts=3, hash_size=1 << 12,
                    k1_build=4, k1_query=4, max_bins=64, max_candidates=256,
                    max_vec_per_bin=64, kmeans_iters=3)
    data = np.concatenate([db_vecs, db_vecs[:, :1]], axis=1)[:512]
    tree = train_tree(cfg, data)
    db = build_database(cfg, tree, data, encode_chunk=512)
    with pytest.raises(AssertionError):
        query_big_knn(cfg, tree, db, jnp.asarray(data[:4]), 5, 16)
