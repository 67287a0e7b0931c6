"""Tests for dataset IO and artifact checkpoints."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.config import PQTConfig
from pqt_tpu.io import artifacts, texmex
from pqt_tpu.models.db import build_database
from pqt_tpu.models.query import query_knn
from pqt_tpu.models.tree import train_tree


class TestTexmex:
    def test_fvecs_roundtrip(self, tmp_path, rng):
        data = rng.normal(size=(100, 16)).astype(np.float32)
        p = str(tmp_path / "x.fvecs")
        texmex.write_xvecs(p, data)
        assert texmex.xvecs_header(p) == (100, 16)
        np.testing.assert_array_equal(texmex.read_xvecs(p), data)
        # chunked read
        np.testing.assert_array_equal(texmex.read_xvecs(p, 10, 90),
                                      data[90:])

    def test_bvecs_roundtrip(self, tmp_path, rng):
        data = rng.integers(0, 256, (50, 8)).astype(np.uint8)
        p = str(tmp_path / "x.bvecs")
        texmex.write_xvecs(p, data)
        np.testing.assert_array_equal(texmex.read_xvecs(p), data)

    def test_ivecs_roundtrip(self, tmp_path, rng):
        data = rng.integers(0, 10000, (30, 5)).astype(np.int32)
        p = str(tmp_path / "gt.ivecs")
        texmex.write_xvecs(p, data)
        np.testing.assert_array_equal(texmex.read_xvecs(p), data)

    def test_umem_roundtrip(self, tmp_path, rng):
        data = rng.integers(0, 256, (60, 12)).astype(np.uint8)
        p = str(tmp_path / "x.umem")
        texmex.write_mem(p, data)
        assert texmex.mem_header(p) == (60, 12)
        np.testing.assert_array_equal(texmex.read_mem(p), data)
        np.testing.assert_array_equal(texmex.read_mem(p, 5, 50), data[50:55])

    def test_convert_xvecs_to_mem(self, tmp_path, rng):
        data = rng.integers(0, 256, (40, 8)).astype(np.uint8)
        src = str(tmp_path / "x.bvecs")
        dst = str(tmp_path / "x.umem")
        texmex.write_xvecs(src, data)
        num, dim = texmex.convert_xvecs_to_mem(src, dst, chunk=13)
        assert (num, dim) == (40, 8)
        np.testing.assert_array_equal(texmex.read_mem(dst), data)


CFG = PQTConfig(dim=32, p=4, c1=8, c2=4, line_parts=8, hash_size=1 << 14,
                k1_build=4, k1_query=4, max_bins=128, max_candidates=512,
                max_vec_per_bin=128, kmeans_iters=5)


class TestArtifacts:
    @pytest.fixture(scope="class")
    def built(self, clustered_data):
        db_vecs, queries = clustered_data
        tree = train_tree(CFG, db_vecs[:2048])
        db = build_database(CFG, tree, db_vecs[:2048], encode_chunk=1024)
        return tree, db, db_vecs[:2048], queries

    def test_tree_roundtrip(self, tmp_path, built):
        tree, _, _, _ = built
        p = str(tmp_path / "tree.npz")
        artifacts.save_tree(p, CFG, tree)
        loaded = artifacts.load_tree(p, CFG)
        np.testing.assert_array_equal(np.asarray(loaded.cb1),
                                      np.asarray(tree.cb1))
        np.testing.assert_array_equal(np.asarray(loaded.cb2),
                                      np.asarray(tree.cb2))
        np.testing.assert_allclose(np.asarray(loaded.pair_dists),
                                   np.asarray(tree.pair_dists), rtol=1e-6)

    def test_db_roundtrip_preserves_query_results(self, tmp_path, built):
        tree, db, db_vecs, queries = built
        p = str(tmp_path / "db.npz")
        artifacts.save_database(p, CFG, db)
        loaded = artifacts.load_database(p, CFG)
        r1 = query_knn(CFG, tree, db, jnp.asarray(queries), 10)
        r2 = query_knn(CFG, tree, loaded, jnp.asarray(queries), 10)
        np.testing.assert_array_equal(np.asarray(r1.indices),
                                      np.asarray(r2.indices))

    def test_mismatch_rejected(self, tmp_path, built):
        tree, _, _, _ = built
        p = str(tmp_path / "tree.npz")
        artifacts.save_tree(p, CFG, tree)
        wrong = CFG.replace(c2=8)
        with pytest.raises(artifacts.ArtifactMismatch):
            artifacts.load_tree(p, wrong)

    def test_load_or_build(self, tmp_path, built):
        tree, _, db_vecs, _ = built
        p = str(tmp_path / "t.npz")
        calls = []

        def builder():
            calls.append(1)
            return tree

        for _ in range(2):
            t = artifacts.load_or_build(
                p, lambda q: artifacts.load_tree(q, CFG), builder,
                lambda q, obj: artifacts.save_tree(q, CFG, obj))
        assert len(calls) == 1   # second call loaded from disk
        np.testing.assert_array_equal(np.asarray(t.cb1),
                                      np.asarray(tree.cb1))


def test_resave_spilled_database_same_path(tmp_path):
    """Re-saving a loaded spilled database to its own path must not
    truncate the live sidecar under its own mapping (r5 review finding:
    'wb' on the mapped file -> SIGBUS + data loss)."""
    import numpy as np
    import jax.numpy as jnp
    from pqt_tpu.config import PQTConfig
    from pqt_tpu.io import artifacts
    from pqt_tpu.models.db import PQTDatabase, payload_width
    cfg = PQTConfig(dim=32, p=4, c1=8, c2=4, line_parts=8,
                    hash_size=1 << 10, k1_build=4, k1_query=4)
    w = payload_width(cfg)
    n = 64
    pay = np.memmap(str(tmp_path / "p.bin"), np.int32, mode="w+",
                    shape=(n, w))
    pay[:] = np.arange(n * w, dtype=np.int32).reshape(n, w)
    prefix = np.zeros(cfg.hash_size, np.int32)
    counts = np.zeros(cfg.hash_size, np.int32)
    counts[0] = n
    prefix2 = np.stack([prefix, prefix + counts], axis=1)
    db = PQTDatabase(prefix=jnp.asarray(prefix), counts=jnp.asarray(counts),
                     payload=pay, pair_occ=None, vectors=None,
                     prefix2=jnp.asarray(prefix2))
    base = str(tmp_path / "db")
    artifacts.save_database(base, cfg, db)
    db1 = artifacts.load_database(base, cfg)
    assert isinstance(db1.payload, np.memmap)
    artifacts.save_database(base, cfg, db1)      # re-save to same path
    db2 = artifacts.load_database(base, cfg)
    np.testing.assert_array_equal(np.asarray(db2.payload),
                                  np.arange(n * w,
                                            dtype=np.int32).reshape(n, w))
