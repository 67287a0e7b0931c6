"""Microbench round 2: gather strategies for the query pipeline's hot spots.

Measures, on the current device:
  A. Pallas VMEM table lookup variants for counts/prefix (table <= 4 MB);
  B. XLA row gather from the payload (N, W) with different widths/dtypes;
  C. XLA sliced gather (slab gather): S contiguous rows per index;
  D. Pallas per-query DMA gather with multiple in-flight row copies.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pqt_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


# --------------------------------------------------------------- A: VMEM LUT
def pallas_lut_2d(table, idx, rows_per_step=8):
    """out[b, e] = table[idx[b, e]]; table lives in VMEM as (H/128, 128).

    Uses a 2D gather: value = tab2d[idx // 128, idx % 128].
    """
    B, E = idx.shape
    H = table.shape[0]
    tab2d = table.reshape(H // 128, 128)

    def kernel(tab_ref, idx_ref, out_ref):
        ids = idx_ref[:]
        r = ids // 128
        c = ids % 128
        out_ref[:] = tab_ref[r, c]

    return pl.pallas_call(
        kernel,
        grid=(B // rows_per_step,),
        in_specs=[
            pl.BlockSpec((H // 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_step, E), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, E), table.dtype),
    )(tab2d, idx)


def pallas_lut_onehot(table, idx, rows_per_step=8):
    """LUT via take_along_axis inside the kernel (alternative lowering)."""
    B, E = idx.shape
    H = table.shape[0]
    tab2d = table.reshape(H // 128, 128)

    def kernel(tab_ref, idx_ref, out_ref):
        ids = idx_ref[:]                       # (R, E)
        flატ = None  # noqa
        out_ref[:] = jnp.take_along_axis(
            tab_ref[:].reshape(1, -1),
            ids.reshape(1, -1), axis=1).reshape(ids.shape)

    return pl.pallas_call(
        kernel,
        grid=(B // rows_per_step,),
        in_specs=[
            pl.BlockSpec((H // 128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per_step, E), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per_step, E), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, E), table.dtype),
    )(tab2d, idx)


def bench_lut():
    B = 256
    rng = np.random.default_rng(0)
    for H_log in (18, 20):
        H = 1 << H_log
        table = jnp.asarray(rng.integers(0, 1 << 30, H).astype(np.int32))
        for E in (4096, 16384):
            idx = jnp.asarray(rng.integers(0, H, (B, E)).astype(np.int32))
            ref = np.asarray(table)[np.asarray(idx)]
            t_x = timeit(jax.jit(lambda t_, i: t_[i]), table, idx)
            print(f"A xla    H=2^{H_log} E={E:<6} {t_x:8.2f} ms")
            for name, fn in (("2dgather", pallas_lut_2d),
                             ("takealong", pallas_lut_onehot)):
                try:
                    f = jax.jit(fn)
                    got = np.asarray(f(table, idx))
                    ok = (ref == got).all()
                    t = timeit(f, table, idx)
                    print(f"A plls-{name:<9} H=2^{H_log} E={E:<6} {t:8.2f} ms"
                          f" correct={ok}")
                except Exception as e:
                    print(f"A plls-{name:<9} H=2^{H_log} E={E} FAILED: "
                          f"{type(e).__name__}: {str(e)[:120]}")


# ----------------------------------------------------- B/C: payload gathers
def bench_payload():
    rng = np.random.default_rng(1)
    N = 1 << 20
    B, K = 256, 4096
    pos = jnp.asarray(rng.integers(0, N - 8, (B, K)).astype(np.int32))
    for W, dtype in ((18, np.int32), (8, np.int32), (4, np.int32),
                     (18, np.int16)):
        tab = jnp.asarray(rng.integers(0, 100, (N, W)).astype(dtype))
        t = timeit(jax.jit(lambda t_, p: t_[p]), tab, pos)
        ns = t * 1e6 / (B * K)
        print(f"B row    W={W:<3} {np.dtype(dtype).name:<6} {t:8.2f} ms "
              f"({ns:.1f} ns/row)")

    # C: sliced gather, S rows per index.
    tab = jnp.asarray(rng.integers(0, 100, (N, 18)).astype(np.int32))
    for S in (2, 4, 8):
        nb = K // S
        posb = pos[:, :nb]

        def sliced(t_, p, S=S):
            g = jax.lax.gather(
                t_, p.reshape(-1, 1),
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1, 2), collapsed_slice_dims=(),
                    start_index_map=(0,)),
                slice_sizes=(S, 18), mode="clip")
            return g.reshape(p.shape[0], p.shape[1], S, 18)

        f = jax.jit(functools.partial(sliced))
        got = np.asarray(f(tab, posb))
        want = np.stack([np.asarray(tab)[np.asarray(posb)[b, i]:
                                         np.asarray(posb)[b, i] + S]
                         for b in range(2) for i in range(3)])
        ok = np.array_equal(
            got[:2, :3].reshape(-1, S, 18)[:want.shape[0]], want)
        t = timeit(f, tab, posb)
        ns = t * 1e6 / (B * nb)
        print(f"C slab   S={S:<3} idx/q={nb:<5} {t:8.2f} ms "
              f"({ns:.1f} ns/slab, correct={ok})")


# ------------------------------------------------- D: Pallas DMA row gather
def pallas_dma_gather(tab, pos, inflight=16):
    """out[b, k] = tab[pos[b, k]] rows via per-row DMA, `inflight` queues."""
    B, K = pos.shape
    N, W = tab.shape

    def kernel(pos_ref, tab_ref, out_ref, scratch, sems):
        def get(slot, k):
            return pltpu.make_async_copy(
                tab_ref.at[pl.ds(pos_ref[0, k], 1), :],
                scratch.at[slot],
                sems.at[slot])

        for k in range(min(inflight, K)):
            get(k % inflight, k).start()

        def body(k, _):
            slot = k % inflight
            get(slot, k).wait()
            out_ref[0, k, :] = scratch[slot, 0, :]

            @pl.when(k + inflight < K)
            def _():
                get(slot, k + inflight).start()
            return 0

        jax.lax.fori_loop(0, K, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K), lambda b: (b, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, K, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((inflight, 1, W), tab.dtype),
            pltpu.SemaphoreType.DMA((inflight,)),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, K, W), tab.dtype),
    )(pos, tab)


def bench_dma():
    rng = np.random.default_rng(2)
    N, W = 1 << 20, 18
    B, K = 256, 4096
    tab = jnp.asarray(rng.integers(0, 100, (N, W)).astype(np.int32))
    pos = jnp.asarray(rng.integers(0, N, (B, K)).astype(np.int32))
    for inflight in (8, 32):
        try:
            f = jax.jit(functools.partial(pallas_dma_gather,
                                          inflight=inflight))
            got = np.asarray(f(tab, pos))
            ok = np.array_equal(got[0, :64], np.asarray(tab)[np.asarray(pos)[0, :64]])
            t = timeit(f, tab, pos, reps=5)
            ns = t * 1e6 / (B * K)
            print(f"D dma    inflight={inflight:<3} {t:8.2f} ms "
                  f"({ns:.1f} ns/row, correct={ok})")
        except Exception as e:
            print(f"D dma    inflight={inflight} FAILED: "
                  f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "lut"):
        bench_lut()
    if which in ("all", "payload"):
        bench_payload()
    if which in ("all", "dma"):
        bench_dma()
