"""Pair-occupancy bin prefilter: correctness vs the unfiltered path.

With an exact (unhashed) bin id space, a bin is non-empty iff its own code
tuple is present, so the pair filter (a necessary condition on the tuple)
must never change which bins are probed — query results must be IDENTICAL
with and without it.  With hashing it may additionally skip collision-only
bins, which is covered by the recall tests in test_engine.py (SMALL_CFG has
the filter enabled).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import build_database, encode_part_codes
from pqt_tpu.models.query import query_knn
from pqt_tpu.models.tree import train_tree

# radix = c1*c2 = 16, radix**4 = 65536 == hash_size -> exact bin ids.
EXACT_CFG = PQTConfig(
    dim=32, p=4, c1=4, c2=4, line_parts=8, hash_size=1 << 16,
    k1_build=4, k1_query=4, max_bins=256, bin_enum_factor=4,
    max_candidates=1024, max_vec_per_bin=256, kmeans_iters=10)


@pytest.fixture(scope="module")
def built(clustered_data):
    db_vecs, queries = clustered_data
    tree = train_tree(EXACT_CFG, db_vecs)
    db = build_database(EXACT_CFG, tree, db_vecs, encode_chunk=2048)
    return tree, db, db_vecs, queries


def test_pair_occ_built_and_correct(built):
    tree, db, db_vecs, _ = built
    assert EXACT_CFG.pair_filter_enabled
    assert db.pair_occ is not None
    r = EXACT_CFG.part_radix
    assert db.pair_occ.shape == (2, r * r)
    pc = np.asarray(encode_part_codes(EXACT_CFG, tree,
                                      jnp.asarray(db_vecs)))
    occ = np.asarray(db.pair_occ)
    for j in range(2):
        expect = np.zeros(r * r, np.uint8)
        expect[pc[:, 2 * j] * r + pc[:, 2 * j + 1]] = 1
        np.testing.assert_array_equal(occ[j], expect)


def test_filtered_matches_unfiltered_exact_ids(built):
    tree, db, _, queries = built
    q = jnp.asarray(queries)
    res_f = query_knn(EXACT_CFG, tree, db, q, 10)
    res_u = query_knn(EXACT_CFG, tree, db._replace(pair_occ=None), q, 10)
    np.testing.assert_array_equal(np.asarray(res_f.indices),
                                  np.asarray(res_u.indices))
    np.testing.assert_allclose(np.asarray(res_f.dists),
                               np.asarray(res_u.dists), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(res_f.n_candidates),
                                  np.asarray(res_u.n_candidates))


def test_pair_filter_can_be_disabled(clustered_data):
    db_vecs, _ = clustered_data
    cfg = EXACT_CFG.replace(pair_filter=False)
    assert not cfg.pair_filter_enabled
    tree = train_tree(cfg, db_vecs[:1024])
    db = build_database(cfg, tree, db_vecs[:1024], encode_chunk=1024)
    assert db.pair_occ is None


def test_pair_filter_gated_by_table_size():
    cfg = EXACT_CFG.replace(pair_filter_max_table=64)   # radix^2 = 256 > 64
    assert not cfg.pair_filter_enabled
