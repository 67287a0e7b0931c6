"""Pallas device primitives vs jnp references (the run.cu self-test analog).

Runs in interpreter mode on CPU (the kernels compile for real on TPU; the
benchmark harness exercises that path).  Mirrors run.cu:9-122: sort/scan at
1024/2048/4096 with self-checks.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.ops.pallas import primitives as PP


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_bitonic_topk_matches_sort(rng, n):
    x = rng.normal(0, 1, (16, n)).astype(np.float32)
    vals, idxs = PP.bitonic_topk(jnp.asarray(x), 32, interpret=True)
    want = np.sort(x, axis=-1)[:, :32]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=0)
    # indices must point at the values they claim
    picked = np.take_along_axis(x, np.asarray(idxs), axis=-1)
    np.testing.assert_allclose(picked, want, rtol=0)


def test_bitonic_topk_with_duplicates(rng):
    x = rng.integers(0, 8, (8, 512)).astype(np.float32)
    vals, _ = PP.bitonic_topk(jnp.asarray(x), 16, interpret=True)
    want = np.sort(x, axis=-1)[:, :16]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=0)


@pytest.mark.parametrize("exclusive", [False, True])
def test_block_scan(rng, exclusive):
    x = rng.integers(0, 100, (8, 2048)).astype(np.int32)
    got = np.asarray(PP.block_scan(jnp.asarray(x), exclusive=exclusive,
                                   interpret=True))
    want = np.cumsum(x, axis=-1)
    if exclusive:
        want = want - x
    np.testing.assert_array_equal(got, want)


def test_segmented_reduce(rng):
    x = rng.normal(0, 1, (8, 128)).astype(np.float32)
    got = np.asarray(PP.segmented_reduce(jnp.asarray(x), 4, interpret=True))
    want = x.reshape(8, 4, 32).sum(axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
