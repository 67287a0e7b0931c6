"""Tests for the multi-database (groupParts) variant."""

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import build_database
from pqt_tpu.models.multidb import build_multi_database, query_multi_knn
from pqt_tpu.models.query import query_knn
from pqt_tpu.models.tree import train_tree
from pqt_tpu.ops.distance import brute_force_knn
from pqt_tpu.utils import metrics

CFG = PQTConfig(dim=32, p=4, c1=8, c2=4, line_parts=8, hash_size=1 << 16,
                k1_build=4, k1_query=4, max_bins=256, max_candidates=1024,
                max_vec_per_bin=256, kmeans_iters=10)


@pytest.fixture(scope="module")
def built(clustered_data):
    db_vecs, queries = clustered_data
    tree = train_tree(CFG, db_vecs)
    mdb = build_multi_database(CFG, tree, db_vecs, group_parts=2,
                               encode_chunk=2048)
    _, gt = brute_force_knn(jnp.asarray(queries), jnp.asarray(db_vecs), 10)
    return tree, mdb, db_vecs, queries, np.asarray(gt)


def test_multi_db_structure(built):
    tree, mdb, db_vecs, _, _ = built
    assert mdb.n_groups == 2
    n = db_vecs.shape[0]
    for db in mdb.databases:
        assert db.n_vectors == n
        assert int(np.asarray(db.counts).sum()) == n
        # 2-part bins are coarser than 4-part bins: fewer non-empty bins
        # than vectors
        assert (np.asarray(db.counts) > 0).sum() <= n


def test_multi_query_recall(built):
    tree, mdb, db_vecs, queries, gt = built
    res = query_multi_knn(CFG, tree, mdb, jnp.asarray(queries), 10)
    r = metrics.recall_at(np.asarray(res.indices), gt, ks=(10,))
    assert r["R@10"] >= 0.4, r


def test_multi_query_no_duplicates(built):
    tree, mdb, _, queries, _ = built
    res = query_multi_knn(CFG, tree, mdb, jnp.asarray(queries), 10)
    for row in np.asarray(res.indices):
        real = row[row >= 0]
        assert len(real) == len(np.unique(real))


def test_multi_occurrence_ranking_at_least_distance_only(built):
    """Occurrence-count ranking (reference dedup semantics,
    ProTree.cu:3243-3310) should not lose recall vs pure line-distance
    ranking: a candidate recalled by several subspace groups is likelier to
    be a true neighbor."""
    tree, mdb, db_vecs, queries, gt = built
    res_occ = query_multi_knn(CFG.replace(multidb_rank="occurrence"),
                              tree, mdb, jnp.asarray(queries), 10)
    res_dist = query_multi_knn(CFG.replace(multidb_rank="distance"),
                               tree, mdb, jnp.asarray(queries), 10)
    r_occ = metrics.recall_at(np.asarray(res_occ.indices), gt, ks=(1, 10))
    r_dist = metrics.recall_at(np.asarray(res_dist.indices), gt, ks=(1, 10))
    assert r_occ["R@10"] >= r_dist["R@10"] - 0.05, (r_occ, r_dist)
    # occurrence results still deduplicated and padded correctly
    for row in np.asarray(res_occ.indices):
        real = row[row >= 0]
        assert len(real) == len(np.unique(real))


def test_multi_candidate_union_at_least_single(built, clustered_data):
    """The multi-index union should recall at least as many true NNs in its
    candidate set as the single 4-part index at the same budgets."""
    tree, mdb, db_vecs, queries, gt = built
    db = build_database(CFG, tree, db_vecs, encode_chunk=2048)
    single = query_knn(CFG, tree, db, jnp.asarray(queries), 10)
    multi = query_multi_knn(CFG, tree, mdb, jnp.asarray(queries), 10)
    r_s = metrics.recall_at(np.asarray(single.indices), gt, ks=(10,))
    r_m = metrics.recall_at(np.asarray(multi.indices), gt, ks=(10,))
    # same rerank; allow small slack for budget-split differences
    assert r_m["R@10"] >= r_s["R@10"] - 0.1, (r_m, r_s)


@pytest.fixture(scope="module")
def built_vec(clustered_data):
    """Multi-DB with kept vectors (native dtype) + pair occupancy."""
    db_vecs, queries = clustered_data
    tree = train_tree(CFG, db_vecs)
    mdb = build_multi_database(CFG, tree, db_vecs, group_parts=2,
                               encode_chunk=2048, keep_vectors=True)
    _, gt = brute_force_knn(jnp.asarray(queries), jnp.asarray(db_vecs), 10)
    return tree, mdb, db_vecs, queries, np.asarray(gt)


def test_multi_exact_rerank_beats_line(built_vec):
    """Exact re-rank of the deduped union (VERDICT r4 weak #4): recall
    reaches the union candidate ceiling, above line-only ranking."""
    tree, mdb, db_vecs, queries, gt = built_vec
    assert mdb.vectors is not None
    line = query_multi_knn(CFG, tree, mdb, jnp.asarray(queries), 10)
    exact = query_multi_knn(CFG, tree, mdb, jnp.asarray(queries), 10, True)
    r_line = metrics.recall_at(np.asarray(line.indices), gt)["R@1"]
    r_exact = metrics.recall_at(np.asarray(exact.indices), gt)["R@1"]
    assert r_exact >= r_line - 1e-9, (r_exact, r_line)
    assert r_exact >= 0.6, r_exact


def test_multi_pair_filter_keeps_recall(built_vec):
    """Each group IS a pair, so the pair-occupancy filter is exact: it may
    only remove provably-empty bins and recall must not drop."""
    tree, mdb, db_vecs, queries, gt = built_vec
    assert mdb.pair_occ is not None and mdb.pair_occ.shape[0] == 2
    cfg_f = CFG.replace(pair_filter=True)
    res = query_multi_knn(cfg_f, tree, mdb, jnp.asarray(queries), 10, True)
    base = query_multi_knn(CFG, tree, mdb, jnp.asarray(queries), 10, True)
    r_f = metrics.recall_at(np.asarray(res.indices), gt, ks=(10,))["R@10"]
    r_b = metrics.recall_at(np.asarray(base.indices), gt, ks=(10,))["R@10"]
    assert r_f >= r_b - 1e-9, (r_f, r_b)


def test_multi_build_spill_payload(clustered_data, tmp_path):
    """spill_path: per-group payloads land in disk memmaps and match the
    in-RAM build exactly."""
    db_vecs, _ = clustered_data
    tree = train_tree(CFG, db_vecs)
    ram = build_multi_database(CFG, tree, db_vecs, group_parts=2,
                               encode_chunk=2048)
    sp = build_multi_database(CFG, tree, db_vecs, group_parts=2,
                              encode_chunk=2048,
                              spill_path=str(tmp_path / "mspill"))
    for a, b in zip(ram.databases, sp.databases):
        assert isinstance(b.payload, np.memmap)
        np.testing.assert_array_equal(np.asarray(a.payload),
                                      np.asarray(b.payload))
