"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends.
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and a
# sitecustomize imports jax at interpreter startup, so env vars are read
# before conftest runs.  jax.config.update still works post-import: force the
# CPU backend and a virtual 8-device mesh for all tests.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def clustered_data():
    """Synthetic clustered dataset: the fixture style the reference uses when
    no SIFT data is present (testPPQT.cpp:194-213 random fallback), but
    clustered so quantization is meaningful.

    Uses a PRIVATE generator (not the shared `rng` fixture): the shared
    generator's state depends on which tests ran first, so fixture data —
    and the recall thresholds calibrated against it — would change when
    running a subset of test files.

    Returns (db (4096, 32) f32, queries (64, 32) f32).
    """
    rng = np.random.default_rng(42)
    n_clusters, dim = 32, 32
    centers = rng.normal(0, 1.0, (n_clusters, dim)).astype(np.float32)
    n = 4096
    which = rng.integers(0, n_clusters, n)
    db = centers[which] + rng.normal(0, 0.4, (n, dim)).astype(np.float32)
    qwhich = rng.integers(0, n_clusters, 64)
    queries = centers[qwhich] + rng.normal(0, 0.4, (64, dim)).astype(
        np.float32)
    return db.astype(np.float32), queries.astype(np.float32)
