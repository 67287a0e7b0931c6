"""Tests for the native (C++/OpenMP) host runtime vs its NumPy fallback."""

import numpy as np
import pytest

from pqt_tpu.io import native


def test_native_lib_builds():
    """The toolchain in this image must produce the library (the fallback
    exists for toolchain-less installs, but here we require the real thing)."""
    lib = native.get_lib()
    assert lib is not None
    assert lib.pqt_num_threads() >= 1


def test_build_csr_matches_numpy(rng):
    hash_size = 1 << 12
    bins = rng.integers(0, hash_size, 20000).astype(np.int32)
    counts, prefix, order = native.build_csr(bins, hash_size)
    want_counts = np.bincount(bins, minlength=hash_size)
    np.testing.assert_array_equal(counts, want_counts)
    np.testing.assert_array_equal(
        prefix, np.concatenate([[0], np.cumsum(want_counts)[:-1]]))
    np.testing.assert_array_equal(
        order, np.argsort(bins, kind="stable"))


def test_build_csr_rejects_out_of_range(rng):
    bins = np.array([0, 5, 1 << 12], np.int32)
    with pytest.raises(ValueError):
        native.build_csr(bins, 1 << 12)


def test_gather_rows_2d(rng):
    src = rng.integers(0, 2**31, (5000, 16)).astype(np.uint32)
    order = rng.permutation(5000).astype(np.int32)
    np.testing.assert_array_equal(native.gather_rows(src, order), src[order])


def test_gather_rows_1d(rng):
    src = rng.normal(size=10000).astype(np.float32)
    order = rng.permutation(10000).astype(np.int32)
    np.testing.assert_array_equal(native.gather_rows(src, order), src[order])


def test_strip_and_cast(rng):
    n, dim = 1000, 24
    data = rng.integers(0, 256, (n, dim)).astype(np.uint8)
    rows = np.concatenate(
        [np.full((n, 1), dim, np.int32).view(np.uint8).reshape(n, 4),
         data], axis=1)
    got = native.strip_xvecs(rows.ravel(), n, dim, np.uint8)
    np.testing.assert_array_equal(got, data)
    np.testing.assert_array_equal(native.u8_to_f32(data),
                                  data.astype(np.float32))


def test_place_positions_matches_fallback(rng):
    """Native streaming-merge placement == the NumPy stable-argsort
    formulation (positions AND cursor advance), across several chunks."""
    H = 256
    counts = np.zeros(H, np.int64)
    chunks = [rng.integers(0, H, 4000).astype(np.int32) for _ in range(3)]
    for c in chunks:
        counts += np.bincount(c, minlength=H)
    prefix = np.cumsum(counts) - counts
    cur_nat = prefix.copy()
    cur_ref = prefix.copy()
    lib = native.get_lib()
    for c in chunks:
        if lib is not None:
            pos_nat = np.empty(c.shape[0], np.int64)
            lib.pqt_place_positions(native._ptr(c), c.shape[0],
                                    native._ptr(cur_nat),
                                    native._ptr(pos_nat))
        else:
            pos_nat = native.place_positions(c, cur_nat)
        # reference: the pure-NumPy fallback formulation
        order = np.argsort(c, kind="stable")
        sb = c[order]
        starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
        run_id = np.cumsum(np.r_[False, sb[1:] != sb[:-1]])
        within = np.arange(sb.shape[0], dtype=np.int64) - starts[run_id]
        pos_ref = np.empty(c.shape[0], np.int64)
        pos_ref[order] = cur_ref[sb] + within
        np.add.at(cur_ref, sb[starts], np.diff(np.r_[starts, sb.shape[0]]))
        np.testing.assert_array_equal(pos_nat, pos_ref)
    np.testing.assert_array_equal(cur_nat, cur_ref)


def test_scatter_rows_roundtrip(rng):
    n, w = 5000, 10
    src = rng.integers(-2**31, 2**31 - 1, (n, w)).astype(np.int32)
    pos = rng.permutation(n).astype(np.int64)
    dst = np.zeros((n, w), np.int32)
    native.scatter_rows(src, pos, dst)
    np.testing.assert_array_equal(dst[pos], src)


def test_place_positions_empty_chunk():
    """A chunk contributing zero rows to a hash range must not crash the
    fallback path (r5 review finding)."""
    cursor = np.zeros(16, np.int64)
    pos = native.place_positions(np.empty(0, np.int32), cursor)
    assert pos.shape == (0,)
    np.testing.assert_array_equal(cursor, np.zeros(16, np.int64))
