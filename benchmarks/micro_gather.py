"""Microbench: occupancy-gather strategies (XLA gather vs Pallas VMEM gather).

The multi-probe pipeline needs counts[bin_ids] for (B, E) ~4M random indices
into a hash-table-sized array.  XLA lowers this to a scalar-ish loop; this
bench measures its cost vs table size / index count and whether a Pallas
kernel with the table resident in VMEM beats it.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def pallas_gather(table, idx, tile=2048):
    """out[b, e] = table[idx[b, e]] with the whole table in VMEM."""
    B, E = idx.shape
    H = table.shape[0]
    table2d = table.reshape(H // 128, 128)

    ROWS = 8

    def kernel(tab_ref, idx_ref, out_ref):
        ids = idx_ref[:]                       # (ROWS, E)
        out_ref[:] = tab_ref[:].reshape(-1)[ids]

    return pl.pallas_call(
        kernel,
        grid=(B // ROWS,),
        in_specs=[
            pl.BlockSpec((H // 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, E), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, E), table.dtype),
    )(table2d, idx)


def main():
    B = 256
    rng = np.random.default_rng(0)
    for H_log in (14, 18, 22):
        H = 1 << H_log
        table = jnp.asarray(rng.integers(0, 3, H).astype(np.int32))
        for E in (4096, 8192, 16384):
            idx = jnp.asarray(rng.integers(0, H, (B, E)).astype(np.int32))
            t = timeit(jax.jit(lambda i, t_=table: t_[i]), idx)
            print(f"xla  H=2^{H_log:<2} E={E:<6} {t:8.2f} ms "
                  f"({t * 1e6 / (B * E):.2f} ns/elem)")

    # Pallas attempt (table fits VMEM only for small H).
    for H_log in (14, 18):
        H = 1 << H_log
        table = jnp.asarray(rng.integers(0, 3, H).astype(np.int32))
        E = 16384
        idx = jnp.asarray(rng.integers(0, H, (B, E)).astype(np.int32))
        try:
            f = jax.jit(lambda i, t_=table: pallas_gather(t_, i))
            ref = np.asarray(table)[np.asarray(idx)]
            got = np.asarray(f(idx))
            ok = (ref == got).all()
            t = timeit(f, idx)
            print(f"plls H=2^{H_log:<2} E={E:<6} {t:8.2f} ms "
                  f"({t * 1e6 / (B * E):.2f} ns/elem) correct={ok}")
        except Exception as e:
            print(f"plls H=2^{H_log:<2} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")


if __name__ == "__main__":
    main()
