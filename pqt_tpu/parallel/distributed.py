"""Multi-HOST (multi-process) serving runtime.

The reference is strictly single-process / single-GPU: its only answer to
databases larger than device memory is zero-copy pinned host RAM
(tool_query.cpp:134-135, PerturbationProTree.cu:5353-5619) and sequential
host-side chunk merging (test1B.cpp:764-898).  The TPU-native answer is a
multi-process `jax.distributed` runtime: every host owns a hash-range shard
of the inverted file + codes in its chips' HBM, queries are replicated (or
batch-sharded), and the per-shard top-k lists merge over ICI/DCN with one
all_gather — the same program `parallel/sharded.py` runs single-process,
executed on a global multi-host mesh.

What this module adds on top of `parallel/sharded.py`:

  * `initialize()` — `jax.distributed.initialize` glue (coordinator
    bootstrap, env-var fallbacks);
  * `global_device_mesh()` — a Mesh over ALL processes' devices with the
    db axis laid out so consecutive hash ranges sit on consecutive devices
    (process-major order: each host owns a contiguous hash range, so its
    CSR slice is a contiguous file region — host-sharded loading);
  * `host_shard_range()` / `place_host_sharded_db()` — each process
    constructs ONLY its own shards host-side (bounded host RAM, the
    multi-host replacement for the reference's 64-128 GB pinned arrays)
    and the global sharded-DB arrays are assembled from process-local
    buffers without any cross-host data movement
    (`jax.make_array_from_single_device_arrays`);
  * `replicate()` — replicate small host values (tree, queries) across
    processes from process-local data.

The serving step itself is `sharded.make_sharded_query_fn(cfg, mesh, ...)`
— unchanged: under a global mesh, jit+shard_map compile a multi-host SPMD
program where the all_gather rides ICI within a host and DCN across hosts.

Tested by `tests/test_distributed.py`, which spawns two real OS processes
on the CPU backend (`--xla_force_host_platform_device_count`) and checks
the merged multi-host result against the single-process engine.
"""

from __future__ import annotations

import os
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pqt_tpu.config import PQTConfig
from pqt_tpu.parallel.sharded import ShardedDatabase


class PeerTimeoutError(RuntimeError):
    """A cross-host collective did not complete in time — a peer process
    is likely dead or unreachable.  The reference has no fault story at
    all (SURVEY §5.3); this is the minimum serving hygiene for the
    multi-host runtime: a typed, actionable error instead of an infinite
    all_gather hang."""


def _peer_timeout_s(default: float = 120.0) -> float:
    return float(os.environ.get("PQT_PEER_TIMEOUT_S", default))


def run_with_peer_timeout(fn, timeout_s: Optional[float] = None,
                          what: str = "cross-host collective"):
    """Run `fn()` (a blocking cross-host op) under a watchdog.

    JAX collectives block in native code with no timeout of their own; a
    dead peer hangs the whole serving step forever.  Running the op in a
    daemon thread and joining with a deadline converts that hang into a
    typed PeerTimeoutError carrying which process observed it.  (The stuck
    native call cannot be cancelled — the caller should treat the error
    as fatal for this process and re-launch, which is also what every
    collective runtime requires after a membership change.)
    """
    if timeout_s is None:
        timeout_s = _peer_timeout_s()
    out, err = [], []

    def run():
        try:
            out.append(fn())
        except Exception as e:            # re-raised in the caller below
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise PeerTimeoutError(
            f"{what} did not complete within {timeout_s:.0f}s "
            f"(process {jax.process_index()}/{jax.process_count()}); a "
            "peer process is likely dead or unreachable. Restart the "
            "serving job; set PQT_PEER_TIMEOUT_S to tune the deadline.")
    if err:
        raise err[0]
    return out[0]


def peer_barrier(timeout_s: Optional[float] = None,
                 name: str = "pqt_peer_barrier") -> None:
    """All-process barrier with a deadline — health probe for serving
    loops (raises PeerTimeoutError if any peer is gone)."""
    from jax.experimental import multihost_utils
    run_with_peer_timeout(
        lambda: multihost_utils.sync_global_devices(name),
        timeout_s, f"peer barrier '{name}'")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               initialization_timeout: Optional[int] = None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), so
    launchers can export env and call `initialize()` bare.  On managed TPU
    pods `jax.distributed.initialize()` autodetects everything.
    """
    if jax.distributed.is_initialized():
        return  # already initialized (process_count() is 1 both before any
        # init and after a single-process init, so it cannot gate this)
    kw = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
    npr = num_processes if num_processes is not None else \
        os.environ.get("JAX_NUM_PROCESSES")
    if npr is not None:
        kw["num_processes"] = int(npr)
    pid = process_id if process_id is not None else \
        os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    if initialization_timeout is not None:
        # bounded coordinator bootstrap: fail fast (typed) when a peer
        # never shows up instead of blocking the launcher indefinitely
        kw["initialization_timeout"] = int(initialization_timeout)
    jax.distributed.initialize(**kw)


def global_device_mesh(db_axis: str = "db",
                       batch_axis: Optional[str] = None,
                       devices_per_host_on_db: Optional[int] = None) -> Mesh:
    """A mesh over all processes' devices, process-major on the db axis.

    With D devices per process and H processes: db axis length = H*D (or
    H*devices_per_host_on_db with the rest on `batch_axis`).  Process-major
    ordering means shard s lives on process s // D — each host's hash
    range (and CSR file slice) is contiguous.
    """
    devs = np.array(jax.devices())  # global, process-major by construction
    if batch_axis is None:
        return Mesh(devs, (db_axis,))
    per = devices_per_host_on_db or (len(devs) // jax.process_count())
    n_db = jax.process_count() * per
    grid = devs.reshape(n_db, len(devs) // n_db)
    return Mesh(grid, (db_axis, batch_axis))


def host_shard_range(cfg: PQTConfig, n_shards: int,
                     shard_ids: Sequence[int]) -> tuple[int, int]:
    """Hash-bin range [lo, hi) covered by this host's shards — the bins
    (and, via the global CSR prefix, the payload rows) this process must
    load.  Shard s owns bins [s*span, (s+1)*span)."""
    span = cfg.hash_size // n_shards
    return min(shard_ids) * span, (max(shard_ids) + 1) * span


def local_shard_ids(mesh: Mesh, db_axis: str = "db") -> list[int]:
    """Which db-axis shard indices live on THIS process's devices."""
    axes = list(mesh.axis_names)
    i = axes.index(db_axis)
    ids = []
    arr = mesh.devices
    for s in range(arr.shape[i]):
        row = np.take(arr, [s], axis=i).ravel()
        if any(d.process_index == jax.process_index() for d in row):
            ids.append(s)
    return ids


def _assemble_global(mesh: Mesh, spec: P, local_np: np.ndarray,
                     global_shape: tuple, db_axis: str, shard_ids):
    """Build a global jax.Array for a db leaf from process-local shard data.

    `local_np` carries this process's shards stacked on axis 0 in shard_ids
    order.  Every device in mesh row s receives shard (s - shard_ids[0])
    from the local buffer; no cross-host transfer happens.
    """
    sharding = NamedSharding(mesh, spec)
    bufs = []
    for d, index in sharding.addressable_devices_indices_map(
            global_shape).items():
        sl = index[0]
        s = sl.start if sl.start is not None else 0
        block = local_np[s - shard_ids[0]:s - shard_ids[0] + 1]
        bufs.append(jax.device_put(block, d))
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, bufs)


def replicate(mesh: Mesh, tree_like):
    """Replicate a pytree of process-local host values across the mesh."""
    def put(x):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, P())
        bufs = [jax.device_put(x, d)
                for d in sharding.addressable_devices_indices_map(
                    x.shape).keys()]
        return jax.make_array_from_single_device_arrays(x.shape, sharding,
                                                        bufs)
    return jax.tree_util.tree_map(put, tree_like)


def build_local_shards(cfg: PQTConfig, n_shards: int,
                       shard_ids: Sequence[int],
                       prefix: np.ndarray, counts: np.ndarray,
                       payload: np.ndarray,
                       vectors_csr: Optional[np.ndarray] = None,
                       pad_to_multiple: int = 1024) -> ShardedDatabase:
    """Split THIS HOST's hash-range slice into its stacked local shards.

    Inputs are host NumPy covering bins [lo, hi) = `host_shard_range(...)`:
      prefix/counts: (hi-lo,) — prefix LOCAL-relative (prefix[0] == 0);
      payload:       (local_n, w) int32 CSR rows for those bins (ids may be
                     global — they are opaque to sharding);
      vectors_csr:   optional (local_n, dim) raw vectors already in CSR
                     order (aligned with payload rows).

    Same shard layout as `sharded.shard_database`, but built without ever
    materializing the other hosts' data — the bounded-host-RAM replacement
    for the reference's full pinned-host arrays (test1B.cpp:1121-1125).
    """
    span = cfg.hash_size // n_shards
    if prefix.shape[0] != span * len(shard_ids):
        raise ValueError(
            f"local slice covers {prefix.shape[0]} bins; shards "
            f"{list(shard_ids)} need {span * len(shard_ids)}")
    k = len(shard_ids)
    n = payload.shape[0]
    starts = [int(prefix[i * span]) for i in range(k)]
    ends = starts[1:] + [n]
    lens = [e - s for s, e in zip(starts, ends)]
    max_n = max(max(lens), 1)
    max_n = -(-max_n // pad_to_multiple) * pad_to_multiple

    sh_prefix = np.empty((k, span), np.int32)
    sh_counts = np.empty((k, span), np.int32)
    sh_prefix2 = np.empty((k, span, 2), np.int32)
    sh_payload = np.zeros((k, max_n, payload.shape[1]), np.int32)
    sh_payload[:, :, 0] = -1
    sh_vectors = None
    if vectors_csr is not None:
        sh_vectors = np.zeros((k, max_n, vectors_csr.shape[1]),
                              vectors_csr.dtype)
    for i in range(k):
        sh_prefix[i] = prefix[i * span:(i + 1) * span] - starts[i]
        sh_counts[i] = counts[i * span:(i + 1) * span]
        sh_prefix2[i, :, 0] = sh_prefix[i]
        sh_prefix2[i, :, 1] = sh_prefix[i] + sh_counts[i]
        sh_payload[i, :lens[i]] = payload[starts[i]:ends[i]]
        if sh_vectors is not None:
            sh_vectors[i, :lens[i]] = vectors_csr[starts[i]:ends[i]]
    return ShardedDatabase(
        prefix=sh_prefix, counts=sh_counts, prefix2=sh_prefix2,
        payload=sh_payload, n_per_shard=np.asarray(lens, np.int32),
        pair_occ=None, vectors=sh_vectors)


def place_host_sharded_db(cfg: PQTConfig, local_sdb: ShardedDatabase,
                          mesh: Mesh, db_axis: str = "db",
                          global_max_shard_n: Optional[int] = None,
                          pair_occ: Optional[np.ndarray] = None,
                          ) -> ShardedDatabase:
    """Assemble the GLOBAL ShardedDatabase from process-local shard data.

    `local_sdb` is this host's stacked shards (`build_local_shards`), as
    host NumPy.  All processes must agree on `global_max_shard_n`, the
    padded per-shard row budget.  When it is None (the default) and the
    runtime is multi-process, the max of the local budgets is exchanged
    here via `multihost_utils.process_allgather`, so hosts with unequal
    shard sizes assemble a consistent global shape without launcher help.
    No vector/payload bytes cross hosts: every device receives its shard
    from its own process's buffer.
    """
    n_shards = mesh.shape[db_axis]
    my_shards = local_shard_ids(mesh, db_axis)
    span = cfg.hash_size // n_shards
    if np.asarray(local_sdb.prefix).shape[0] != len(my_shards):
        raise ValueError(
            f"local_sdb has {np.asarray(local_sdb.prefix).shape[0]} "
            f"shards; this process's devices host {len(my_shards)}")

    if global_max_shard_n is None:
        local_max = int(local_sdb.payload.shape[1])
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            global_max_shard_n = int(np.max(run_with_peer_timeout(
                lambda: multihost_utils.process_allgather(
                    np.asarray(local_max, np.int64)),
                what="pad-budget process_allgather")))
        else:
            global_max_shard_n = local_max
    max_n = global_max_shard_n
    if local_sdb.payload.shape[1] > max_n:
        raise ValueError("global_max_shard_n smaller than a local shard")

    def pad_rows(x, fill=0):
        x = np.asarray(x)
        if x.shape[1] == max_n:
            return x
        out = np.full((x.shape[0], max_n) + x.shape[2:], fill, x.dtype)
        out[:, :x.shape[1]] = x
        return out

    payload = pad_rows(local_sdb.payload)
    payload[:, local_sdb.payload.shape[1]:, 0] = -1   # id column: padding

    S = n_shards
    leaves = {
        "prefix": (np.asarray(local_sdb.prefix), (S, span)),
        "counts": (np.asarray(local_sdb.counts), (S, span)),
        "prefix2": (np.asarray(local_sdb.prefix2), (S, span, 2)),
        "payload": (payload, (S, max_n, payload.shape[2])),
        "n_per_shard": (np.asarray(local_sdb.n_per_shard), (S,)),
    }
    out = {}
    for name, (local, gshape) in leaves.items():
        spec = P(db_axis, *([None] * (len(gshape) - 1)))
        out[name] = _assemble_global(mesh, spec, local, gshape, db_axis,
                                     my_shards)
    vectors = None
    if local_sdb.vectors is not None:
        vec = pad_rows(local_sdb.vectors)
        gshape = (S, max_n, vec.shape[2])
        vectors = _assemble_global(mesh, P(db_axis, None, None), vec,
                                   gshape, db_axis, my_shards)
    occ = replicate(mesh, pair_occ) if pair_occ is not None else None
    return ShardedDatabase(
        prefix=out["prefix"], counts=out["counts"], prefix2=out["prefix2"],
        payload=out["payload"], n_per_shard=out["n_per_shard"],
        pair_occ=occ, vectors=vectors)
