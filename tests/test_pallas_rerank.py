"""Fused Pallas line re-rank vs the XLA reconstruct path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

import pqt_tpu as P
from pqt_tpu.models.db import pack_payload_compact, unpack_payload_cfg
from pqt_tpu.ops.linecodes import reconstruct_dists_idx
from pqt_tpu.ops.pallas.rerank import BLOCK, rerank_fused, supports


def _random_payload(rng, n, lp):
    """Random compact-format payload rows + matching wide codes."""
    a = rng.integers(0, 16, (n, lp)).astype(np.uint32)
    b = rng.integers(0, 16, (n, lp)).astype(np.uint32)
    lam8 = rng.integers(0, 256, (n, lp)).astype(np.uint32)
    # wide layout with lambda on the u8 grid: A | B<<8 | (lam8<<8)<<16
    codes = a | (b << 8) | ((lam8 << 8) << 16)
    ids = np.arange(n, dtype=np.int32)
    t3 = rng.normal(0, 1, n).astype(np.float32)
    return pack_payload_compact(ids, codes, t3)


@pytest.mark.parametrize("B,K,lp", [(4, BLOCK, 16), (2, 2 * BLOCK, 32)])
def test_rerank_fused_matches_xla(B, K, lp):
    # Own rng: consuming the session fixture would shift the calibrated
    # data of session-scoped fixtures in other modules (test order moves).
    rng = np.random.default_rng(7 * K + lp)
    cfg = P.PQTConfig(dim=128 if lp == 16 else 256, p=4, c1=16, c2=16,
                      line_parts=lp, max_candidates=K)
    assert supports(cfg)
    rows = np.stack([_random_payload(rng, K, lp) for _ in range(B)])
    q_line = rng.uniform(0.0, 50.0, (B, lp, 16)).astype(np.float32)

    ids, a_idx, b_idx, lam, t3 = unpack_payload_cfg(cfg, jnp.asarray(rows))
    want = np.asarray(reconstruct_dists_idx(a_idx, b_idx, lam,
                                            jnp.asarray(q_line), t3))

    rows_t = jnp.asarray(rows).transpose(0, 2, 1)           # (B, W, K)
    q_pad = jnp.pad(jnp.asarray(q_line), ((0, 0), (0, 0), (0, 128 - 16)))
    got = np.asarray(rerank_fused(rows_t, q_pad, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
