"""Unit tests for the device primitives (ops/) against the NumPy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.ops import binning, distance, distseq, linecodes, triangle

import oracle


class TestDistance:
    def test_pairwise_sqdist(self, rng):
        x = rng.normal(size=(37, 16)).astype(np.float32)
        c = rng.normal(size=(11, 16)).astype(np.float32)
        got = np.asarray(distance.pairwise_sqdist(jnp.asarray(x),
                                                  jnp.asarray(c)))
        want = oracle.sqdist(x, c)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_part_tables(self, rng):
        x = rng.normal(size=(23, 32)).astype(np.float32)
        cb = rng.normal(size=(4, 7, 8)).astype(np.float32)
        got = np.asarray(distance.part_sqdist_tables(jnp.asarray(x),
                                                     jnp.asarray(cb)))
        want = oracle.part_tables(x, cb)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_subpart_tables_consistent_with_part_tables(self, rng):
        """line_parts == p must reduce to the per-part table of the virtual
        full centroids."""
        x = rng.normal(size=(9, 32)).astype(np.float32)
        cents = rng.normal(size=(5, 32)).astype(np.float32)
        got = np.asarray(distance.subpart_sqdist_tables(
            jnp.asarray(x), jnp.asarray(cents), 4))
        # oracle: reshape centroids into per-part codebook
        cb = cents.reshape(5, 4, 8).transpose(1, 0, 2)
        want = oracle.part_tables(x, cb)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_centroid_pair_sqdist_symmetric(self, rng):
        cents = rng.normal(size=(6, 32)).astype(np.float32)
        got = np.asarray(distance.centroid_pair_sqdist(jnp.asarray(cents), 8))
        assert got.shape == (8, 6, 6)
        np.testing.assert_allclose(got, got.transpose(0, 2, 1), atol=1e-5)
        np.testing.assert_allclose(np.diagonal(got, axis1=1, axis2=2), 0,
                                   atol=1e-5)
        # sum over line parts = full pair distance
        np.testing.assert_allclose(got.sum(0), oracle.sqdist(cents, cents),
                                   rtol=1e-4, atol=1e-4)

    def test_brute_force_knn(self, rng):
        db = rng.normal(size=(200, 16)).astype(np.float32)
        q = rng.normal(size=(13, 16)).astype(np.float32)
        d, i = distance.brute_force_knn(jnp.asarray(q), jnp.asarray(db), 5)
        wd, wi = oracle.exact_knn(q, db, 5)
        np.testing.assert_array_equal(np.asarray(i), wi)


class TestTriangle:
    def test_lambda_codec_roundtrip(self):
        lams = np.linspace(-4.2, 4.2, 1001).astype(np.float32)
        enc = np.asarray(triangle.lambda_to_u16(jnp.asarray(lams)))
        want = oracle.lambda_to_u16(lams)
        np.testing.assert_array_equal(enc, want)
        dec = np.asarray(triangle.u16_to_lambda(jnp.asarray(enc)))
        inside = (lams > -4) & (lams < 4)
        np.testing.assert_allclose(dec[inside], lams[inside], atol=8 / 65536)

    def test_projection_geometry(self, rng):
        """Triangle algebra must reproduce real Euclidean geometry."""
        for _ in range(50):
            A, B, C = rng.normal(size=(3, 8))
            a2 = ((C - B) ** 2).sum()
            b2 = ((C - A) ** 2).sum()
            c2 = ((B - A) ** 2).sum()
            lam, resid = triangle.project_with_residual(a2, b2, c2)
            lam = float(lam)
            X = A + lam * (B - A)
            np.testing.assert_allclose(((C - X) ** 2).sum(), float(resid),
                                       rtol=1e-4, atol=1e-5)
            d2 = float(triangle.line_dist(a2, b2, c2, lam))
            np.testing.assert_allclose(d2, ((C - X) ** 2).sum(),
                                       rtol=1e-4, atol=1e-5)

    def test_line_dist_arbitrary_lambda(self, rng):
        A, B, C = rng.normal(size=(3, 6))
        a2 = ((C - B) ** 2).sum()
        b2 = ((C - A) ** 2).sum()
        c2 = ((B - A) ** 2).sum()
        for lam in (-0.5, 0.0, 0.3, 1.0, 1.7):
            X = A + lam * (B - A)
            np.testing.assert_allclose(
                float(triangle.line_dist(a2, b2, c2, lam)),
                ((C - X) ** 2).sum(), rtol=1e-4, atol=1e-5)


class TestDistSeq:
    def test_static_sequence_sorted(self):
        seq = distseq.static_sequence(4, 3, length=64)
        assert seq.shape == (64, 3)
        scores = np.sqrt(seq).sum(1)
        assert (np.diff(scores) >= -1e-9).all()
        assert (seq[0] == 0).all()
        # all 64 tuples distinct
        assert len({tuple(r) for r in seq}) == 64

    def test_static_sequence_clamped(self):
        seq = distseq.static_sequence(128, 2, length=100)
        assert seq.max() <= 15  # clamped to 16 (ProTree.cu:135)

    def test_aniso_family_shapes(self):
        fam = distseq.aniso_2d_sequences(8, length=64)
        assert fam.shape == (distseq.NUM_ANISO_DIR, 64, 2)
        mid = distseq.NUM_ANISO_DIR // 2
        # the middle slope (~1.08) is near-isotropic: first entry (0,0)
        assert tuple(fam[mid, 0]) == (0, 0)
        # steep slope prefers advancing x first, shallow prefers y
        assert fam[-1, 1, 0] >= fam[-1, 1, 1] or fam[0, 1, 1] >= fam[0, 1, 0]


class TestBinning:
    def test_exact_bin_ids(self):
        codes = jnp.asarray([[1, 2, 3], [0, 0, 1]], jnp.int32)
        got = np.asarray(binning.exact_bin_ids(codes, 10))
        np.testing.assert_array_equal(got, [123, 1])

    def test_hashed_ids_in_range_and_deterministic(self, rng):
        codes = jnp.asarray(
            rng.integers(0, 256, size=(1000, 4)), jnp.int32)
        h1 = np.asarray(binning.hashed_bin_ids(codes, 256, 1 << 16))
        h2 = np.asarray(binning.hashed_bin_ids(codes, 256, 1 << 16))
        np.testing.assert_array_equal(h1, h2)
        assert h1.min() >= 0 and h1.max() < (1 << 16)
        # decent spread: at least half the slots the birthday bound allows
        assert len(np.unique(h1)) > 700

    def test_csr_roundtrip(self, rng):
        hash_size = 64
        n = 500
        bins = rng.integers(0, hash_size, n).astype(np.int32)
        inv = binning.build_csr(jnp.asarray(bins), hash_size)
        prefix = np.asarray(inv.prefix)
        counts = np.asarray(inv.counts)
        ids = np.asarray(inv.ids)
        want_counts = np.bincount(bins, minlength=hash_size)
        np.testing.assert_array_equal(counts, want_counts)
        np.testing.assert_array_equal(prefix,
                                      np.concatenate([[0],
                                                      np.cumsum(want_counts)[:-1]]))
        for b in range(hash_size):
            members = ids[prefix[b]:prefix[b] + counts[b]]
            want = np.where(bins == b)[0]
            np.testing.assert_array_equal(np.sort(members), want)
            # stable: ascending original order within bin
            np.testing.assert_array_equal(members, want)

    def test_compact_nonempty(self):
        bins = jnp.asarray([[5, 3, 9, 1, 7, 2]], jnp.int32)
        counts = jnp.asarray([[0, 2, 0, 1, 3, 0]], jnp.int32)
        g_bins, g_counts = binning.compact_nonempty_bins(bins, counts, 4)
        np.testing.assert_array_equal(np.asarray(g_bins)[0, :3], [3, 1, 7])
        np.testing.assert_array_equal(np.asarray(g_counts)[0], [2, 1, 3, 0])

    def test_gather_candidates(self):
        # bins with prefix [0, 10, 20], counts [2, 3, 1], cap 2
        prefix = jnp.asarray([[0, 10, 20]], jnp.int32)
        counts = jnp.asarray([[2, 3, 1]], jnp.int32)
        pos, valid = binning.gather_candidates(prefix, counts, 8, 2)
        pos = np.asarray(pos)[0]
        valid = np.asarray(valid)[0]
        np.testing.assert_array_equal(valid, [1, 1, 1, 1, 1, 0, 0, 0])
        np.testing.assert_array_equal(pos[:5], [0, 1, 10, 11, 20])


class TestLineCodes:
    def test_pack_unpack(self, rng):
        a = jnp.asarray(rng.integers(0, 256, 100), jnp.int32)
        b = jnp.asarray(rng.integers(0, 256, 100), jnp.int32)
        lam = jnp.asarray(rng.uniform(-3.9, 3.9, 100).astype(np.float32))
        packed = linecodes.pack_codes(a, b, triangle.lambda_to_u16(lam))
        ua, ub, ulam = linecodes.unpack_codes(packed)
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(a))
        np.testing.assert_array_equal(np.asarray(ub), np.asarray(b))
        np.testing.assert_allclose(np.asarray(ulam), np.asarray(lam),
                                   atol=8 / 65536)

    def test_build_line_codes_matches_oracle(self, rng):
        n, lp, c1 = 5, 3, 6
        pd = rng.uniform(0.1, 4.0, (n, lp, c1)).astype(np.float32)
        # symmetric pair distances with zero diagonal
        m = rng.uniform(0.5, 2.0, (lp, c1, c1)).astype(np.float32)
        pair = (m + m.transpose(0, 2, 1)) / 2
        for l in range(lp):
            np.fill_diagonal(pair[l], 0.0)
        packed, t3 = linecodes.build_line_codes(
            jnp.asarray(pd), jnp.asarray(pair))
        # t3 must agree with its recomputation from the packed codes
        np.testing.assert_allclose(
            np.asarray(t3),
            np.asarray(linecodes.line_code_t3(packed, jnp.asarray(pair))),
            rtol=1e-4, atol=1e-4)
        packed = np.asarray(packed)
        for i in range(n):
            for l in range(lp):
                A, B, lam = oracle.best_line_code(pd[i, l], pair[l])
                got_a = packed[i, l] & 0xFF
                got_b = (packed[i, l] >> 8) & 0xFF
                got_lam = oracle.u16_to_lambda(
                    np.uint16(packed[i, l] >> 16))
                assert (got_a, got_b) == (A, B)
                np.testing.assert_allclose(got_lam, lam, atol=2e-4)

    def test_reconstruct_matches_geometry(self, rng):
        """End-to-end: build codes from real vectors, reconstruct distances,
        compare with true query-vector distances (should be approximately
        equal for well-spread centroids)."""
        dim, lp, c1 = 16, 4, 8
        from pqt_tpu.ops.distance import (centroid_pair_sqdist,
                                          subpart_sqdist_tables)
        cents = rng.normal(0, 1, (c1, dim)).astype(np.float32)
        db = rng.normal(0, 1, (50, dim)).astype(np.float32)
        q = rng.normal(0, 1, (7, dim)).astype(np.float32)
        pair = centroid_pair_sqdist(jnp.asarray(cents), lp)
        db_tables = subpart_sqdist_tables(jnp.asarray(db), jnp.asarray(cents),
                                          lp)
        codes, t3 = linecodes.build_line_codes(db_tables, pair)
        q_tables = subpart_sqdist_tables(jnp.asarray(q), jnp.asarray(cents),
                                         lp)
        # every query gets all 50 db vectors as "candidates"
        cand = jnp.broadcast_to(codes[None, :, :], (7, 50, lp))
        cand_t3 = jnp.broadcast_to(t3[None, :], (7, 50))
        approx = np.asarray(linecodes.reconstruct_dists(
            cand, q_tables, cand_t3))
        true = oracle.sqdist(q, db)
        # approximate: correlation must be high, errors bounded
        corr = np.corrcoef(approx.ravel(), true.ravel())[0, 1]
        assert corr > 0.8, corr
