"""Pair-occupancy bin prefilter: correctness vs the unfiltered path.

With an exact (unhashed) bin id space, a bin is non-empty iff its own code
tuple is present, so every probed bin passes the pair filter (a necessary
condition on the tuple).  Two contracts follow (see
query._enumerate_bins):

  * when the stage-1 slack budget covers the full enumeration
    (slack*max_bins >= bin_enum_factor*max_bins), the filter never changes
    which bins are probed — results must be IDENTICAL;
  * at any slack, the filtered probe set is a prefix subset of the
    unfiltered one, so every filtered result id must appear in the
    unfiltered candidate superset and n_candidates can only shrink.

With hashing the filter may additionally skip collision-only bins, which
is covered by the recall tests in test_engine.py (SMALL_CFG has the filter
enabled).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import build_database, encode_part_codes
from pqt_tpu.models.query import query_knn
from pqt_tpu.models.tree import train_tree

# radix = c1*c2 = 16, radix**4 = 65536 == hash_size -> exact bin ids.
# pair_filter_slack=4.0 makes the stage-1 budget (slack*max_bins = 1024)
# cover the whole enumeration (bin_enum_factor*max_bins = 1024), which is
# the regime where filtered == unfiltered is guaranteed.
# pipeline="parts": this module tests the PARTS path's slack-budget filter
# contract specifically (the pair pipeline applies the filter at stage 1
# instead; its contract is covered by tests/test_pair_pipeline.py).
EXACT_CFG = PQTConfig(
    dim=32, p=4, c1=4, c2=4, line_parts=8, hash_size=1 << 16,
    k1_build=4, k1_query=4, max_bins=256, bin_enum_factor=4,
    pair_filter_slack=4.0, pipeline="parts",
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


def test_default_slack_is_prefix_subset(built):
    """At the default (truncating) slack, filtered results are a subset of
    the unfiltered candidate pool and the candidate count only shrinks."""
    tree, db, _, queries = built
    cfg = EXACT_CFG.replace(pair_filter_slack=1.5)
    q = jnp.asarray(queries)
    res_f = query_knn(cfg, tree, db, q, 10)
    res_u = query_knn(cfg, tree, db._replace(pair_occ=None), q, 10)
    assert np.all(np.asarray(res_f.n_candidates)
                  <= np.asarray(res_u.n_candidates))
    # Every filtered hit must be an unfiltered hit with the same distance.
    # Rank-or-better is hard to assert directly; subset of the top-k pool
    # with k = max_candidates captures the prefix-subset contract.
    res_u_all = query_knn(cfg, tree, db._replace(pair_occ=None), q,
                          cfg.max_candidates)
    u_ids = np.asarray(res_u_all.indices)
    f_ids = np.asarray(res_f.indices)
    # Guard against a vacuous pass: a regression that zeroed out the
    # filtered path would return no valid ids, and the empty set is a
    # subset of anything.
    assert (f_ids >= 0).any(axis=1).all()
    for b in range(f_ids.shape[0]):
        got = set(int(i) for i in f_ids[b] if i >= 0)
        sup = set(int(i) for i in u_ids[b] if i >= 0)
        assert got <= sup


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
