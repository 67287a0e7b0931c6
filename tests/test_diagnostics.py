"""Diagnostics: gtBins cache, probe positions, quantization stats."""

import os

import numpy as np
import jax.numpy as jnp

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import build_database, encode_bins
from pqt_tpu.models.tree import train_tree
from pqt_tpu.ops.distance import brute_force_knn
from pqt_tpu.utils import diagnostics

CFG = PQTConfig(
    dim=32, p=4, c1=4, c2=4, line_parts=8, hash_size=1 << 16,
    k1_build=4, k1_query=4, max_bins=256, max_candidates=1024,
    max_vec_per_bin=256, kmeans_iters=10, pair_top_m=64)


def test_gt_bins_cache_roundtrip(clustered_data, tmp_path):
    db_vecs, queries = clustered_data
    tree = train_tree(CFG, db_vecs)
    path = str(tmp_path / "gt.npy")
    b1 = diagnostics.ground_truth_bins(CFG, tree, db_vecs[:128], path)
    assert os.path.exists(path)
    b2 = diagnostics.ground_truth_bins(CFG, tree, db_vecs[:128], path)
    np.testing.assert_array_equal(b1, b2)
    direct = np.asarray(encode_bins(CFG, tree, jnp.asarray(db_vecs[:128])))
    np.testing.assert_array_equal(b1, direct)


def test_gt_bin_probe_positions(clustered_data):
    db_vecs, queries = clustered_data
    tree = train_tree(CFG, db_vecs)
    _, gt = brute_force_knn(jnp.asarray(queries), jnp.asarray(db_vecs), 1)
    gt_vecs = db_vecs[np.asarray(gt)[:, 0]]
    gt_bins = diagnostics.ground_truth_bins(CFG, tree, gt_vecs)
    pos = diagnostics.gt_bin_probe_positions(CFG, tree, queries, gt_bins)
    assert pos.shape == (queries.shape[0],)
    found = pos >= 0
    # exact ids + generous budget: the vast majority of gt bins must be
    # enumerated, mostly early
    assert found.mean() > 0.8
    assert np.median(pos[found]) < CFG.max_bins


def test_quantization_stats(clustered_data):
    db_vecs, _ = clustered_data
    tree = train_tree(CFG, db_vecs)
    stats = diagnostics.quantization_stats(CFG, tree, db_vecs[:256])
    assert stats["n_sample"] == 256
    assert 0 <= stats["rel_err_min"] <= stats["rel_err_mean"] \
        <= stats["rel_err_max"]
    assert -4.0 <= stats["lambda_min"] <= stats["lambda_max"] <= 4.0
    # the line model should be a usable approximation on clustered data
    assert stats["rel_err_mean"] < 0.5
