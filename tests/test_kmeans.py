"""Tests for batched masked LBG k-means."""

import numpy as np
import jax
import jax.numpy as jnp

from pqt_tpu.models.kmeans import batched_masked_kmeans, lbg_kmeans

import oracle


def test_kmeans_separates_clear_clusters(rng):
    """Four well-separated blobs -> centroids land on the blob means."""
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    n_per = 100
    data = np.concatenate([
        c + rng.normal(0, 0.1, (n_per, 2)).astype(np.float32)
        for c in centers])
    cents, assign = lbg_kmeans(jnp.asarray(data), None, 4)
    cents = np.asarray(cents)
    # each true center must be within 0.1 of some learned centroid
    for c in centers:
        d = np.sqrt(((cents - c) ** 2).sum(1)).min()
        assert d < 0.1, (c, cents)
    # assignments partition the blobs consistently
    assign = np.asarray(assign)
    for b in range(4):
        blob = assign[b * n_per:(b + 1) * n_per]
        assert len(np.unique(blob)) == 1


def test_kmeans_quantization_error_competitive(rng):
    """On generic data, LBG error must be within 10% of plain Lloyd."""
    data = rng.normal(0, 1, (2000, 16)).astype(np.float32)
    cents, _ = lbg_kmeans(jnp.asarray(data), None, 16)
    ours = oracle.quantization_error(data, np.asarray(cents))
    ref = oracle.quantization_error(
        data, oracle.kmeans_lloyd(data, 16, iters=30))
    assert ours < ref * 1.10, (ours, ref)


def test_kmeans_masked_ignores_outside_population(rng):
    data = np.concatenate([
        rng.normal(0, 0.1, (300, 4)),
        rng.normal(100, 0.1, (300, 4)),   # masked out
    ]).astype(np.float32)
    mask = jnp.asarray(np.arange(600) < 300)
    cents, _ = lbg_kmeans(jnp.asarray(data), mask, 4)
    assert np.abs(np.asarray(cents)).max() < 1.0


def test_kmeans_non_power_of_two_k(rng):
    data = rng.normal(0, 1, (500, 8)).astype(np.float32)
    cents, assign = lbg_kmeans(jnp.asarray(data), None, 6)
    assert cents.shape == (6, 8)
    assert len(np.unique(np.asarray(assign))) >= 5


def test_kmeans_handles_tiny_population(rng):
    """Population smaller than k: must not produce NaNs."""
    data = rng.normal(0, 1, (64, 8)).astype(np.float32)
    mask = jnp.asarray(np.arange(64) < 3)
    cents, _ = lbg_kmeans(jnp.asarray(data), mask, 8)
    assert np.isfinite(np.asarray(cents)).all()


def test_batched_masked_kmeans(rng):
    data = rng.normal(0, 1, (400, 8)).astype(np.float32)
    data[:200] += 5.0
    masks = jnp.asarray(np.stack([np.arange(400) < 200,
                                  np.arange(400) >= 200]))
    cents = batched_masked_kmeans(jnp.asarray(data), masks, 4)
    assert cents.shape == (2, 4, 8)
    # problem 0's centroids near +5 mean, problem 1's near 0
    assert np.asarray(cents)[0].mean() > 3.0
    assert abs(np.asarray(cents)[1].mean()) < 1.0


def test_kmeans_large_magnitude_data_no_collapse():
    """SIFT-scale feature magnitudes (0..255) must still split clusters.

    Regression test: an absolute split epsilon collapses the codebook on
    un-normalized data (all points follow one child of every split).
    Deterministic seed: LBG remains draw-sensitive to local minima (as is
    the reference's), so this pins one known-good configuration."""
    rng = np.random.default_rng(123)
    centers = rng.uniform(0, 200, (8, 16)).astype(np.float32)
    data = (centers[rng.integers(0, 8, 2000)] +
            rng.normal(0, 5, (2000, 16))).astype(np.float32)
    cents, assign = lbg_kmeans(jnp.asarray(data), None, 8)
    assert len(np.unique(np.asarray(assign))) == 8
    err = oracle.quantization_error(data, np.asarray(cents))
    # within-cluster variance is 16 * 25; allow 3x slack
    assert err < 3 * 16 * 25, err
