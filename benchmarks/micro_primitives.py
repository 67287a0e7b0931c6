"""Microbenchmarks: scatter/gather vs sort-based alternatives on TPU.

Validates the primitive choices behind the query pipeline before committing
to a refactor.  Run: python benchmarks/micro_primitives.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000


def main():
    B, E, K, nb = 256, 16384, 4096, 4096
    H, N, LP = 1 << 18, 200_000, 16
    rng = np.random.default_rng(0)

    counts_tab = jnp.asarray(rng.integers(0, 3, H).astype(np.int32))
    packed_tab = jnp.asarray(
        np.stack([rng.integers(0, 3, H), rng.integers(0, N, H)], 1)
        .astype(np.int32))
    idx = jnp.asarray(rng.integers(0, H, (B, E)).astype(np.int32))

    # --- occupancy gather: narrow vs packed row ---------------------------
    t = timeit(jax.jit(lambda i: counts_tab[i]), idx)
    print(f"gather (B,E) width-1          {t:8.2f} ms")
    t = timeit(jax.jit(lambda i: packed_tab[i]), idx)
    print(f"gather (B,E) width-2 rows     {t:8.2f} ms")

    # --- payload gather: 3 narrow vs 1 wide -------------------------------
    pos = jnp.asarray(rng.integers(0, N, (B, K)).astype(np.int32))
    ids_t = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
    codes_t = jnp.asarray(rng.integers(0, 2**31, (N, LP)).astype(np.int32))
    t3_t = jnp.asarray(rng.normal(0, 1, N).astype(np.float32))
    wide_t = jnp.asarray(rng.integers(0, 2**31, (N, LP + 2)).astype(np.int32))

    t = timeit(jax.jit(lambda p: (ids_t[p], codes_t[p], t3_t[p])), pos)
    print(f"payload 3 gathers             {t:8.2f} ms")
    t = timeit(jax.jit(lambda p: wide_t[p]), pos)
    print(f"payload 1 wide gather         {t:8.2f} ms")

    # --- compaction: scatter vs sort --------------------------------------
    from pqt_tpu.ops.binning import compact_nonempty_bins
    bin_ids = idx
    bcounts = jnp.asarray((rng.random((B, E)) < 0.4).astype(np.int32) *
                          rng.integers(1, 50, (B, E)).astype(np.int32))

    t = timeit(jax.jit(lambda b, c: compact_nonempty_bins(b, c, nb)),
               bin_ids, bcounts)
    print(f"compact via scatter           {t:8.2f} ms")

    def compact_sort(bin_ids, counts, max_bins):
        Bq, Ee = counts.shape
        posn = jax.lax.broadcasted_iota(jnp.int32, (Bq, Ee), 1)
        key = jnp.where(counts > 0, posn, jnp.int32(2**30))
        _, b_s, c_s = jax.lax.sort((key, bin_ids, counts), dimension=-1,
                                   num_keys=1)
        out_b = b_s[:, :max_bins]
        out_c = jnp.where(key[:, :max_bins] < 2**30, 1, 1)  # placeholder
        return out_b, c_s[:, :max_bins]

    t = timeit(jax.jit(lambda b, c: compact_sort(b, c, nb)), bin_ids, bcounts)
    print(f"compact via 3-operand sort    {t:8.2f} ms")

    # --- interval expansion: scatter+scan vs sort-merge -------------------
    from pqt_tpu.ops.binning import gather_candidates
    pre_of_bins = jnp.asarray(rng.integers(0, N, (B, nb)).astype(np.int32))
    cnt_of_bins = jnp.asarray(
        rng.integers(0, 6, (B, nb)).astype(np.int32))

    t = timeit(jax.jit(lambda p, c: gather_candidates(p, c, K, 1024)),
               pre_of_bins, cnt_of_bins)
    print(f"positions via scatter+scan    {t:8.2f} ms")

    def gather_sortmerge(prefix_of_bins, counts_of_bins, K, cap):
        Bq, nbins = counts_of_bins.shape
        capped = jnp.minimum(counts_of_bins, cap)
        ends = jnp.cumsum(capped, axis=-1)
        starts = ends - capped
        delta = prefix_of_bins - starts
        # merge starts (seeds) with the slot grid by key; seeds win ties.
        grid = jax.lax.broadcasted_iota(jnp.int32, (Bq, K), 1)
        occupied = capped > 0
        seed_key = jnp.where(occupied, starts, jnp.int32(2**30))
        keys = jnp.concatenate([seed_key, grid], axis=-1)
        flags = jnp.concatenate(        # 0 = seed (ties first), 1 = slot
            [jnp.zeros((Bq, nbins), jnp.int32),
             jnp.ones((Bq, K), jnp.int32)], axis=-1)
        vals = jnp.concatenate([delta, jnp.zeros((Bq, K), jnp.int32)],
                               axis=-1)
        k_s, f_s, v_s = jax.lax.sort((keys, flags, vals), dimension=-1,
                                     num_keys=2)
        is_seed = f_s == 0

        def fill(l, r):
            lv, lf = l
            rv, rf = r
            return jnp.where(rf, rv, lv), lf | rf

        filled, _ = jax.lax.associative_scan(
            fill, (v_s, is_seed), axis=-1)
        # compact out the slot entries (they are already in slot order).
        slot_key = jnp.where(is_seed, jnp.int32(2**30), k_s)
        _, v_out = jax.lax.sort((slot_key, filled), dimension=-1, num_keys=1)
        positions = jax.lax.broadcasted_iota(jnp.int32, (Bq, K), 1) + \
            v_out[:, :K]
        total = ends[:, -1]
        valid = jax.lax.broadcasted_iota(jnp.int32, (Bq, K), 1) < \
            total[:, None]
        return positions, valid

    t = timeit(jax.jit(lambda p, c: gather_sortmerge(p, c, K, 1024)),
               pre_of_bins, cnt_of_bins)
    print(f"positions via sort-merge      {t:8.2f} ms")

    # correctness cross-check
    p1, v1 = jax.jit(lambda p, c: gather_candidates(p, c, K, 1024))(
        pre_of_bins, cnt_of_bins)
    p2, v2 = jax.jit(lambda p, c: gather_sortmerge(p, c, K, 1024))(
        pre_of_bins, cnt_of_bins)
    ok_v = bool(jnp.all(v1 == v2))
    ok_p = bool(jnp.all(jnp.where(v1, p1, 0) == jnp.where(v2, p2, 0)))
    print(f"sort-merge matches scatter+scan: valid={ok_v} pos={ok_p}")


if __name__ == "__main__":
    main()
