"""Pallas VMEM probe-kernel correctness vs the XLA gather (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pqt_tpu.ops.pallas.probe import fits_vmem, probe_extents_vmem


@pytest.mark.parametrize("H,B,E", [(1 << 14, 8, 256), (1 << 16, 16, 512)])
def test_probe_extents_matches_gather(rng, H, B, E):
    counts = rng.integers(0, 5, H).astype(np.int32)
    ends = np.cumsum(counts).astype(np.int32)
    prefix2 = np.stack([ends - counts, ends], 1)
    bins = rng.integers(0, H, (B, E)).astype(np.int32)
    s, c = probe_extents_vmem(jnp.asarray(prefix2), jnp.asarray(bins),
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(s), prefix2[bins, 0])
    np.testing.assert_array_equal(np.asarray(c), counts[bins])


def test_fits_vmem_budget():
    assert fits_vmem(1 << 20)          # 8 MB table: serving default
    assert not fits_vmem(1 << 22)      # 32 MB: falls back to XLA gather
    assert not fits_vmem((1 << 20) + 3)  # non-multiple of 128 lanes


def test_probe_kernel_gating():
    """auto never picks the Pallas kernel (Mosaic cannot lower the VMEM
    vector gather — see ops/pallas/probe.py); vmem is opt-in and validates
    its shape preconditions loudly."""
    from pqt_tpu.config import PQTConfig
    from pqt_tpu.models.query import _use_vmem_probe

    auto = PQTConfig()
    assert not _use_vmem_probe(auto, 1 << 20, 2048)
    xla = PQTConfig(probe_kernel="xla")
    assert not _use_vmem_probe(xla, 1 << 20, 2048)
    vmem = PQTConfig(probe_kernel="vmem")
    assert _use_vmem_probe(vmem, 1 << 20, 2048)
    with pytest.raises(ValueError):
        _use_vmem_probe(vmem, 1 << 22, 2048)   # table over budget
    with pytest.raises(ValueError):
        _use_vmem_probe(vmem, 1 << 20, 2000)   # enum width not /128
