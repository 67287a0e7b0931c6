"""Line-projection (triangle) geometry and the 16-bit lambda codec.

Re-derivation of the all-squared-distance algebra the reference uses for
line-quantization re-ranking (reference: pqt/triangle.cuh:6-110,
cpu_version/helper.hpp:106-172).  Given a triangle with squared side lengths
a2 = |CB|^2, b2 = |CA|^2, c2 = |AB|^2, the projection X of C onto line AB
divides AB at fraction lambda, and |CX|^2 follows from the law of cosines
without any square roots.

All functions are elementwise jnp ops (VPU-friendly) and broadcast over any
leading batch shape.
"""

from __future__ import annotations

import jax.numpy as jnp

# lambda is clamped to [-4, 4) and stored in 16 bits (triangle.cuh:6-18).
_LAMBDA_LO = -4.0
_LAMBDA_RANGE = 8.0
_LAMBDA_SCALE = 65536.0 / _LAMBDA_RANGE


def lambda_to_u16(lam):
    """Encode lambda in [-4, 4) to uint16 (reference toUShort, triangle.cuh:6)."""
    f = (lam - _LAMBDA_LO) * _LAMBDA_SCALE
    f = jnp.where(lam >= 4.0, 65535.0, jnp.where(lam < -4.0, 0.0, f))
    return f.astype(jnp.uint16)


def u16_to_lambda(u):
    """Decode uint16 to lambda (reference toFloat, triangle.cuh:14)."""
    return u.astype(jnp.float32) * (1.0 / _LAMBDA_SCALE) + _LAMBDA_LO


def lambda_to_u8(lam):
    """Encode lambda to 8 bits (the compact-payload codec).

    Not in the reference (which always spends 16 bits, triangle.cuh:6);
    quantizes on the u16 grid (multiples of 256) so u8 and u16 decoders
    agree exactly on representable values.  Step = 8/256 = 0.03125, which is
    far below the line-quantization model error itself.
    """
    u16 = lambda_to_u16(lam).astype(jnp.int32)
    return jnp.minimum((u16 + 128) >> 8, 255).astype(jnp.uint8)


def u8_to_lambda(u):
    """Decode the 8-bit lambda code."""
    return (u.astype(jnp.float32) * 256.0) * (1.0 / _LAMBDA_SCALE) + _LAMBDA_LO


def project(a2, b2, c2, eps=1e-20):
    """Fraction lambda at which C projects onto AB (triangle.cuh:79-81).

    lambda = -0.5 * (a2 - b2 - c2) / c2
    """
    return -0.5 * (a2 - b2 - c2) / jnp.maximum(c2, eps)


def project_with_residual(a2, b2, c2, eps=1e-20):
    """(lambda, d2): projection fraction and squared distance C<->line
    (triangle.cuh:102-110).  d2 = b2 - lambda^2 * c2."""
    lam = project(a2, b2, c2, eps)
    d2 = b2 - lam * lam * jnp.maximum(c2, eps)
    return lam, d2


def line_dist(a2, b2, c2, lam):
    """Squared distance |CX|^2 where X divides AB at fraction lam
    (triangle.cuh:55-63, helper.hpp extractDistance:132-136).

    d2 = b2 + lam^2 * c2 + lam * (a2 - b2 - c2)
    """
    return b2 + lam * lam * c2 + lam * (a2 - b2 - c2)
