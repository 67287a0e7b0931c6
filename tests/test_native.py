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
