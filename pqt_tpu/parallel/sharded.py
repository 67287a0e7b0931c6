"""Multi-chip serving: hash-range-sharded database + merged top-k.

This is a NEW capability relative to the reference, which is single-GPU and
reaches beyond device memory only via zero-copy pinned host RAM
(tool_query.cpp:134-135, PerturbationProTree.cu:5353-5619).  On TPU the
database lives sharded across the HBM of a device mesh:

  * the hash table (counts/prefix) is split by hash range — each device owns
    a contiguous range of bins, and because the CSR payload is sorted by bin
    id, each device's ids/codes are contiguous slices too;
  * codebooks and queries are replicated (codebooks are tiny);
  * every device runs the full probe pipeline against its local shard (bins
    outside its range are simply empty), produces a local top-k, and the
    per-shard lists are merged with an all_gather + re-top-k over ICI;
  * the query batch can additionally be split over a second mesh axis for
    data parallelism.

Built on shard_map so the per-device program is explicit, with the collective
(one all_gather of (k,)-lists) the only cross-chip traffic per batch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import PQTDatabase
from pqt_tpu.models.query import (QueryResult, query_core,
                                  query_core_exact, query_core_pair)
from pqt_tpu.models.query_big import query_big_core
from pqt_tpu.models.tree import PQTree


class ShardedDatabase(NamedTuple):
    """Database split into S hash-range shards, stacked on a leading axis.

    Leaves have a leading shard axis so a single NamedSharding over the mesh's
    'db' axis places each shard on its device row.
    """
    prefix: jax.Array       # (S, hash_size/S) int32, rebased to local payload
    counts: jax.Array       # (S, hash_size/S) int32
    prefix2: jax.Array      # (S, hash_size/S, 2) int32 rebased (start, end)
                            # CSR extents (the pair pipeline's probe table)
    payload: jax.Array      # (S, max_shard_n, 2+lp) int32, zero padded
    n_per_shard: jax.Array  # (S,) int32 true payload lengths
    pair_occ: Optional[jax.Array]  # (p//2, radix^2) uint8, REPLICATED —
                                   # global pair occupancy, a conservative
                                   # prefilter for every shard
    vectors: Optional[jax.Array] = None  # (S, max_shard_n, dim) raw vectors
                                         # in CSR ORDER (same layout as
                                         # payload) for sharded EXACT
                                         # re-rank; original dtype (uint8
                                         # for SIFT — 4x cheaper gathers)

    @property
    def n_shards(self) -> int:
        return self.prefix.shape[0]


def shard_database(cfg: PQTConfig, db: PQTDatabase, n_shards: int,
                   pad_to_multiple: int = 1024) -> ShardedDatabase:
    """Split a built database into hash-range shards (host-side, NumPy).

    hash_size must divide evenly by n_shards.  The CSR payload slice of shard
    s is [global_prefix[s*span], global_prefix[(s+1)*span]) — contiguous by
    construction; each shard's prefix is rebased to its own slice.
    """
    assert cfg.hash_size % n_shards == 0
    span = cfg.hash_size // n_shards
    prefix = np.asarray(db.prefix)
    counts = np.asarray(db.counts)
    payload = np.asarray(db.payload)
    n = payload.shape[0]

    starts = [int(prefix[s * span]) for s in range(n_shards)]
    ends = starts[1:] + [n]
    lens = [e - s for s, e in zip(starts, ends)]
    max_n = max(max(lens), 1)
    max_n = -(-max_n // pad_to_multiple) * pad_to_multiple

    sh_prefix = np.empty((n_shards, span), np.int32)
    sh_counts = np.empty((n_shards, span), np.int32)
    sh_prefix2 = np.empty((n_shards, span, 2), np.int32)
    sh_payload = np.zeros((n_shards, max_n, payload.shape[1]), np.int32)
    sh_payload[:, :, 0] = -1          # id column: -1 marks padding
    vectors_csr = None
    sh_vectors = None
    if db.vectors_csr is not None:
        # Out-of-core builds already spilled vectors in CSR order.
        vectors_csr = np.asarray(db.vectors_csr)
    elif db.vectors is not None:
        # Re-lay raw vectors in CSR order so each shard's slice is
        # contiguous and position-indexed, like the payload (the sharded
        # exact re-rank reads vectors_csr[position]).
        vec = np.asarray(db.vectors)
        vectors_csr = vec[np.asarray(db.ids)]
    if vectors_csr is not None:
        sh_vectors = np.zeros((n_shards, max_n, vectors_csr.shape[1]),
                              vectors_csr.dtype)
    for s in range(n_shards):
        sh_prefix[s] = prefix[s * span:(s + 1) * span] - starts[s]
        sh_counts[s] = counts[s * span:(s + 1) * span]
        sh_prefix2[s, :, 0] = sh_prefix[s]
        sh_prefix2[s, :, 1] = sh_prefix[s] + sh_counts[s]
        sh_payload[s, :lens[s]] = payload[starts[s]:ends[s]]
        if sh_vectors is not None:
            sh_vectors[s, :lens[s]] = vectors_csr[starts[s]:ends[s]]
    return ShardedDatabase(
        prefix=jnp.asarray(sh_prefix), counts=jnp.asarray(sh_counts),
        prefix2=jnp.asarray(sh_prefix2),
        payload=jnp.asarray(sh_payload),
        n_per_shard=jnp.asarray(lens, jnp.int32),
        pair_occ=db.pair_occ,
        vectors=(jnp.asarray(sh_vectors) if sh_vectors is not None
                 else None))


def place_sharded_db(sdb: ShardedDatabase, mesh: Mesh,
                     axis: str = "db") -> ShardedDatabase:
    """Put each shard on its mesh row (leading axis sharded over `axis`);
    the pair-occupancy table is replicated."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    placed = {f: put(getattr(sdb, f))
              for f in ("prefix", "counts", "prefix2", "payload",
                        "n_per_shard")}
    pair_occ = sdb.pair_occ
    if pair_occ is not None:
        pair_occ = jax.device_put(pair_occ, NamedSharding(mesh, P()))
    vectors = sdb.vectors
    if vectors is not None:
        vectors = put(vectors)
    return ShardedDatabase(pair_occ=pair_occ, vectors=vectors, **placed)


def make_sharded_query_fn(cfg: PQTConfig, mesh: Mesh, k: int,
                          db_axis: str = "db",
                          batch_axis: Optional[str] = None,
                          mode: str = "line",
                          n_intermediate: int = 256):
    """Build the jitted multi-chip query step.

    Returns fn(tree, sharded_db, queries) -> QueryResult with replicated
    outputs.  queries: (B, dim); if `batch_axis` names a second mesh axis the
    batch is additionally split across it (B must divide evenly).

    mode:
      "line"  — line-code re-rank (queryKNN analog), the serving default;
      "exact" — every gathered candidate ranked by TRUE distance from the
                shard's CSR-ordered raw vector slice (rerankBIGKernelPerfect
                analog, PerturbationProTree.cu:5532-5619); needs
                sdb.vectors.  Per-shard top-k by exact distance merges to
                the same global top-k a single device would produce;
      "big"   — the BIG two-stage enumeration (getBIGBins2D analog) with
                line re-rank, for large per-shard probe budgets.
    """
    span = cfg.hash_size // mesh.shape[db_axis]
    if mode not in ("line", "exact", "big"):
        raise ValueError(f"unknown mode {mode!r}")

    q_spec = P(batch_axis) if batch_axis else P()
    out_spec = (P(batch_axis) if batch_axis else P(),) * 3

    def make_db_specs(has_pair_occ: bool, has_vectors: bool):
        return ShardedDatabase(
            prefix=P(db_axis, None), counts=P(db_axis, None),
            prefix2=P(db_axis, None, None),
            payload=P(db_axis, None, None), n_per_shard=P(db_axis),
            pair_occ=P() if has_pair_occ else None,
            vectors=P(db_axis, None, None) if has_vectors else None)

    def shard_fn(tree, sdb, queries):
        # Inside shard_map every leaf has its local block shape; the leading
        # shard axis of the db leaves is size 1 here.
        shard_idx = jax.lax.axis_index(db_axis)
        bin_offset = shard_idx.astype(jnp.int32) * span
        if mode == "exact":
            ids, dists, ncand = query_core_exact(
                cfg, tree, sdb.prefix2[0], sdb.payload[0], sdb.vectors[0],
                queries, k, bin_offset=bin_offset, pair_occ=sdb.pair_occ)
        elif mode == "big":
            ids, dists, ncand = query_big_core(
                cfg, tree, sdb.prefix[0], sdb.counts[0], sdb.payload[0],
                queries, k, n_intermediate, bin_offset=bin_offset)
        elif cfg.pair_pipeline_enabled:
            ids, dists, ncand = query_core_pair(
                cfg, tree, sdb.prefix2[0], sdb.payload[0],
                queries, k, bin_offset=bin_offset, pair_occ=sdb.pair_occ)
        else:
            ids, dists, ncand = query_core(
                cfg, tree, sdb.prefix[0], sdb.counts[0], sdb.payload[0],
                queries, k, bin_offset=bin_offset, pair_occ=sdb.pair_occ)
        # Merge the per-shard top-k lists over the db axis.
        all_ids = jax.lax.all_gather(ids, db_axis)        # (S, B, k)
        all_dists = jax.lax.all_gather(dists, db_axis)
        S = all_ids.shape[0]
        B = ids.shape[0]
        flat_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(B, S * ids.shape[1])
        flat_dists = jnp.transpose(all_dists, (1, 0, 2)).reshape(B, -1)
        neg_top, sel = jax.lax.top_k(-flat_dists, k)
        merged_ids = jnp.take_along_axis(flat_ids, sel, axis=-1)
        merged_ids = jnp.where(jnp.isfinite(-neg_top), merged_ids, -1)
        total_cand = jax.lax.psum(ncand, db_axis)
        return merged_ids, -neg_top, total_cand

    mapped_cache = {}

    def get_mapped(has_pair_occ: bool, has_vectors: bool):
        key = (has_pair_occ, has_vectors)
        if key not in mapped_cache:
            mapped = jax.shard_map(
                shard_fn, mesh=mesh,
                in_specs=(P(), make_db_specs(has_pair_occ, has_vectors),
                          q_spec),
                out_specs=out_spec,
                check_vma=False)

            @jax.jit
            def query_fn(tree, sdb, queries):
                ids, dists, ncand = mapped(tree, sdb, queries)
                return QueryResult(indices=ids, dists=dists,
                                   n_candidates=ncand)

            mapped_cache[key] = query_fn
        return mapped_cache[key]

    def query_fn(tree, sdb, queries):
        if mode == "exact" and sdb.vectors is None:
            raise ValueError("mode='exact' needs a ShardedDatabase built "
                             "from a db with keep_vectors=True")
        return get_mapped(sdb.pair_occ is not None,
                          sdb.vectors is not None)(tree, sdb, queries)

    return query_fn


# ---------------------------------------------------------------------------
# Data-parallel building blocks (encode / k-means) — GSPMD handles the
# collectives when inputs carry shardings; these wrappers pin the layouts.
# ---------------------------------------------------------------------------

def make_dp_encode_fn(cfg: PQTConfig, mesh: Mesh, axis: str = "dp"):
    """Data-parallel database encoding: rows split over `axis`, codebooks
    replicated.  The multi-host analog of the reference's chunked build loop
    (test1B.cpp:783-871): every host encodes its own rows, no merge needed
    until CSR assembly."""
    from pqt_tpu.models.db import encode_bins, encode_line_codes

    data_sharding = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, out_shardings=(
        NamedSharding(mesh, P(axis)),
        NamedSharding(mesh, P(axis, None)),
        NamedSharding(mesh, P(axis))))
    def encode_fn(tree, data):
        codes, t3 = encode_line_codes(cfg, tree, data)
        return encode_bins(cfg, tree, data), codes, t3

    def wrapped(tree, data):
        data = jax.device_put(data, data_sharding)
        tree = jax.device_put(tree, repl)
        return encode_fn(tree, data)

    return wrapped


def make_dp_kmeans_step(mesh: Mesh, axis: str = "dp"):
    """One data-parallel Lloyd E+M step: data rows sharded, centroids
    replicated; the M-step reduction crosses the mesh via psum (inserted by
    GSPMD from the shardings)."""
    from pqt_tpu.ops.distance import pairwise_sqdist

    data_sharding = NamedSharding(mesh, P(axis, None))
    repl = NamedSharding(mesh, P())

    @functools.partial(jax.jit, out_shardings=repl)
    def step(data, centroids):
        dist = pairwise_sqdist(data, centroids)
        assign = jnp.argmin(dist, axis=-1)
        onehot = (assign[:, None] == jnp.arange(centroids.shape[0])[None, :]
                  ).astype(jnp.float32)
        sums = jax.lax.dot_general(
            onehot, data.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        return jnp.where(counts[:, None] > 0,
                         sums / jnp.maximum(counts, 1.0)[:, None], centroids)

    def wrapped(data, centroids):
        data = jax.device_put(data, data_sharding)
        centroids = jax.device_put(centroids, repl)
        return step(data, centroids)

    return wrapped
