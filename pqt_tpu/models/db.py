"""Database build: encoding, inverted file, line codes, chunked assembly.

Pipeline (reference buildKBestDB, PerturbationProTree.cu:1231-1315 + lineDist
:7663-7737; chunked host merge test/test1B.cpp:764-898):

  1. per part, the best (l1, l2) over the k1 best L1 candidates x all c2
     refinements -> per-part code l1*c2 + l2;
  2. mixed-radix bin id reduced into the hash table;
  3. CSR inverted file (sort-based here: deterministic, no atomics);
  4. per (vector, line-part) packed line code for re-ranking.

The payloads (ids, line codes, optionally raw vectors) are stored in CSR
order so query-time gathers are position-indexed — replacing the reference's
zero-copy pinned-host reads with HBM-resident, shardable tensors.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.tree import (PQTree, level1_tables, level2_tables,
                                 line_tables)
from pqt_tpu.ops import binning
from pqt_tpu.ops.linecodes import build_line_codes


class ChunkFormatError(RuntimeError):
    """An encoded chunk file lacks the arrays the requested merge needs."""


class PQTDatabase(NamedTuple):
    """Built database; all leaves jax arrays, shardable by hash range / rows.

    The per-vector payload (id, t3, line codes) lives in ONE packed int32
    row per vector, in CSR order: column 0 = original id, column 1 = the f32
    t3 term bit-cast to int32, columns 2.. = the line codes.  Query-time
    candidate collection then needs a single row gather instead of three
    narrow ones — and XLA row gathers on TPU cost ~10ns per index plus
    ~0.3ns per BYTE, so the row is kept as narrow as the config allows
    (replaces the reference's separate .dbIdx/.lines reads,
    tool_query.cpp:118-144).  Two layouts (models/db.py payload helpers):

      wide    (2 + lp columns): one uint32 per line part, the reference's
              code_t bit layout (p1 | p2<<8 | lambda_u16<<16);
      compact (2 + ceil(lp/2) columns, when c1 <= 16): 16 bits per line part
              (A | B<<4 | lambda_u8<<8), two parts per int32 — 40-byte rows
              at lp=16 instead of 72.
    """
    prefix: jax.Array       # (hash_size,) int32
    counts: jax.Array       # (hash_size,) int32
    payload: jax.Array      # (n, payload_width(cfg)) int32, CSR order
    pair_occ: Optional[jax.Array]  # (p//2, part_radix**2) uint8: 1 iff some
                                   # DB vector carries that (part 2j, part
                                   # 2j+1) code pair.  Lets the query prune
                                   # provably-empty bins before the per-bin
                                   # occupancy lookup (see query._enumerate_bins)
    vectors: Optional[jax.Array]  # (n, dim) raw vectors in ORIGINAL id order
                                  # (only for exact re-rank), or None
    prefix2: Optional[jax.Array] = None  # (hash_size, 2) int32 (start, end)
                                         # CSR extents: ONE row gather yields
                                         # both the offset and the count of a
                                         # probed bin (the query path's probe
                                         # table; see query._probe_bins)
    vectors_csr: Optional[jax.Array] = None  # (n, dim) raw vectors in CSR
                                         # ORDER (position-aligned with
                                         # payload).  The out-of-core
                                         # builder spills vectors this way
                                         # (bounded host RAM + contiguous
                                         # shard slices); query_knn's exact
                                         # path uses whichever of
                                         # vectors/vectors_csr is present.

    @property
    def n_vectors(self) -> int:
        return self.payload.shape[0]

    @property
    def ids(self) -> jax.Array:
        """(n,) int32 original vector id at each CSR position."""
        return self.payload[:, 0]

    @property
    def t3(self) -> jax.Array:
        """(n,) float32 query-independent line-code term, CSR order."""
        return jax.lax.bitcast_convert_type(self.payload[:, 1], jnp.float32)


def payload_width(cfg: PQTConfig) -> int:
    """Number of int32 columns in a payload row under `cfg`'s layout."""
    lp = cfg.line_parts
    return 2 + ((lp + 1) // 2 if cfg.payload_is_compact else lp)


def pack_payload(ids: np.ndarray, codes: np.ndarray,
                 t3: np.ndarray) -> np.ndarray:
    """Host-side packing of (ids, u32 line codes, t3) into WIDE payload rows."""
    n = ids.shape[0]
    out = np.empty((n, 2 + codes.shape[1]), np.int32)
    out[:, 0] = ids
    out[:, 1] = np.ascontiguousarray(t3, np.float32).view(np.int32)
    out[:, 2:] = np.ascontiguousarray(codes, np.uint32).view(np.int32)
    return out


def pack_payload_compact(ids: np.ndarray, codes: np.ndarray,
                         t3: np.ndarray) -> np.ndarray:
    """Compact layout: 16 bits per line part (A | B<<4 | lambda_u8<<8).

    codes: (n, lp) uint32 in the wide bit layout with lambda already
    quantized to the u8 grid (build_line_codes(lambda_bits=8)).
    """
    n, lp = codes.shape
    a = codes & np.uint32(0xF)                    # c1 <= 16 → 4 bits
    b = (codes >> 8) & np.uint32(0xF)
    lam8 = (codes >> 24) & np.uint32(0xFF)        # high byte of lambda_u16
    part16 = (a | (b << 4) | (lam8 << 8)).astype(np.uint32)
    if lp % 2:
        part16 = np.concatenate(
            [part16, np.zeros((n, 1), np.uint32)], axis=1)
    merged = (part16[:, 0::2] | (part16[:, 1::2] << 16)).astype(np.uint32)
    out = np.empty((n, 2 + merged.shape[1]), np.int32)
    out[:, 0] = ids
    out[:, 1] = np.ascontiguousarray(t3, np.float32).view(np.int32)
    out[:, 2:] = merged.view(np.int32)
    return out


def pack_payload_cfg(cfg: PQTConfig, ids: np.ndarray, codes: np.ndarray,
                     t3: np.ndarray) -> np.ndarray:
    if cfg.payload_is_compact:
        return pack_payload_compact(ids, codes, t3)
    return pack_payload(ids, codes, t3)


def unpack_payload(rows: jax.Array):
    """WIDE (..., 2+lp) int32 payload rows -> (ids (...,),
    codes (..., lp) uint32, t3 (...,) float32)."""
    ids = rows[..., 0]
    t3 = jax.lax.bitcast_convert_type(rows[..., 1], jnp.float32)
    codes = jax.lax.bitcast_convert_type(rows[..., 2:], jnp.uint32)
    return ids, codes, t3


def unpack_payload_cfg(cfg: PQTConfig, rows: jax.Array):
    """Payload rows -> (ids, a_idx, b_idx, lam, t3) under either layout.

    a_idx/b_idx: (..., lp) int32 centroid indices; lam: (..., lp) float32.
    """
    from pqt_tpu.ops import triangle
    from pqt_tpu.ops.linecodes import unpack_codes

    ids = rows[..., 0]
    t3 = jax.lax.bitcast_convert_type(rows[..., 1], jnp.float32)
    if not cfg.payload_is_compact:
        codes = jax.lax.bitcast_convert_type(rows[..., 2:], jnp.uint32)
        a, b, lam = unpack_codes(codes)
        return ids, a, b, lam, t3
    merged = jax.lax.bitcast_convert_type(rows[..., 2:], jnp.uint32)
    lo = merged & jnp.uint32(0xFFFF)
    hi = merged >> jnp.uint32(16)
    part16 = jnp.stack([lo, hi], axis=-1).reshape(
        rows.shape[:-1] + (-1,))[..., :cfg.line_parts]
    a = (part16 & jnp.uint32(0xF)).astype(jnp.int32)
    b = ((part16 >> jnp.uint32(4)) & jnp.uint32(0xF)).astype(jnp.int32)
    lam = triangle.u8_to_lambda((part16 >> jnp.uint32(8)) & jnp.uint32(0xFF))
    return ids, a, b, lam, t3


@functools.partial(jax.jit, static_argnums=(0,))
def encode_part_codes(cfg: PQTConfig, tree: PQTree, x: jax.Array) -> jax.Array:
    """Per-part codes l1*c2+l2 for each vector (build-time assignment).

    Per part: minimize the level-2 distance over the k1_build best L1 cells
    and all c2 refinements (assignPerturbationBestBinKernel2 semantics:
    the selection metric is the L2-level distance only).
    """
    d1 = level1_tables(cfg, tree, x)                     # (n, p, c1)
    d2 = level2_tables(cfg, tree, x)                     # (n, p, c1, c2)
    if cfg.k1_build >= cfg.c1:
        cand = d2
        l1_of_cand = jnp.broadcast_to(
            jnp.arange(cfg.c1, dtype=jnp.int32)[None, None, :],
            d2.shape[:3])
    else:
        _, l1_idx = jax.lax.top_k(-d1, cfg.k1_build)     # (n, p, k1)
        cand = jnp.take_along_axis(d2, l1_idx[..., None], axis=2)
        l1_of_cand = l1_idx
    n, p = cand.shape[:2]
    flat = cand.reshape(n, p, -1)
    best = jnp.argmin(flat, axis=-1).astype(jnp.int32)   # (n, p)
    best_l1 = jnp.take_along_axis(
        l1_of_cand, (best // cfg.c2)[..., None], axis=-1)[..., 0]
    best_l2 = best % cfg.c2
    return best_l1 * cfg.c2 + best_l2                    # (n, p)


@functools.partial(jax.jit, static_argnums=(0,))
def encode_bins(cfg: PQTConfig, tree: PQTree, x: jax.Array) -> jax.Array:
    """Hashed bin id for each vector (build-time assignment)."""
    part_codes = encode_part_codes(cfg, tree, x)
    return binning.hashed_bin_ids(part_codes, cfg.part_radix, cfg.hash_size)


@functools.partial(jax.jit, static_argnums=(0,))
def encode_line_codes(cfg: PQTConfig, tree: PQTree, x: jax.Array):
    """((n, line_parts) packed uint32 codes, (n,) f32 t3 term)
    (lineDist equivalent).  Lambda is quantized to the configured codec
    width so t3 agrees with the stored payload."""
    ld = line_tables(cfg, tree, x)                       # (n, lp, c1)
    return build_line_codes(ld, tree.pair_dists,
                            lambda_bits=cfg.effective_lambda_bits)


@functools.partial(jax.jit, static_argnums=(0,))
def pack_payload_device(cfg: PQTConfig, ids: jax.Array, codes: jax.Array,
                        t3: jax.Array) -> jax.Array:
    """Device-side payload packing (jnp twin of pack_payload_cfg).

    ids: (n,) int32; codes: (n, lp) uint32 wide-layout line codes; t3: (n,)
    float32.  Returns (n, payload_width(cfg)) int32 rows.
    """
    t3_bits = jax.lax.bitcast_convert_type(t3, jnp.int32)
    if not cfg.payload_is_compact:
        cols = jax.lax.bitcast_convert_type(codes, jnp.int32)
        return jnp.concatenate([ids[:, None], t3_bits[:, None], cols], axis=1)
    n, lp = codes.shape
    a = codes & jnp.uint32(0xF)
    b = (codes >> jnp.uint32(8)) & jnp.uint32(0xF)
    lam8 = (codes >> jnp.uint32(24)) & jnp.uint32(0xFF)
    part16 = a | (b << jnp.uint32(4)) | (lam8 << jnp.uint32(8))
    if lp % 2:
        part16 = jnp.concatenate(
            [part16, jnp.zeros((n, 1), jnp.uint32)], axis=1)
    merged = part16[:, 0::2] | (part16[:, 1::2] << jnp.uint32(16))
    cols = jax.lax.bitcast_convert_type(merged, jnp.int32)
    return jnp.concatenate([ids[:, None], t3_bits[:, None], cols], axis=1)


@functools.partial(jax.jit, static_argnums=(0,))
def _encode_chunk(cfg: PQTConfig, tree: PQTree, chunk: jax.Array,
                  id_offset: jax.Array):
    """One fused on-device encode step: bins, part codes, packed payload.

    chunk may be uint8 (uploaded raw; 4x less host->device traffic than
    float32) — the cast happens on device.  Returns (bins (C,), part_codes
    (C, p), payload rows (C, payload_width)).
    """
    chunk = chunk.astype(jnp.float32)
    pc = encode_part_codes(cfg, tree, chunk)
    bins = binning.hashed_bin_ids(pc, cfg.part_radix, cfg.hash_size)
    codes, t3 = encode_line_codes(cfg, tree, chunk)
    ids = id_offset + jnp.arange(chunk.shape[0], dtype=jnp.int32)
    return bins, pc, pack_payload_device(cfg, ids, codes, t3)


@functools.partial(jax.jit, static_argnums=(0,))
def _assemble_device(cfg: PQTConfig, bins: jax.Array, packed: jax.Array):
    """On-device CSR assembly: histogram + prefix + stable sort + row gather.

    Replaces the host counting-sort path for fits-in-HBM builds: no D2H of
    the encoded arrays, no H2D of the packed payload — the reference's
    host-side merge (test1B.cpp:804-871) only earns its keep out-of-core.
    Returns (prefix, counts, prefix2, payload).
    """
    counts = jnp.zeros((cfg.hash_size,), jnp.int32).at[bins].add(
        1, mode="drop")
    ends = jnp.cumsum(counts, dtype=jnp.int32)
    prefix = ends - counts
    order = jnp.argsort(bins, stable=True).astype(jnp.int32)
    payload = packed[order]
    prefix2 = jnp.stack([prefix, ends], axis=1)
    return prefix, counts, prefix2, payload


@functools.partial(jax.jit, static_argnums=(0,))
def _pair_occ_device(cfg: PQTConfig, part_codes: jax.Array,
                     pair_occ: jax.Array) -> jax.Array:
    """Scatter this chunk's (part 2j, 2j+1) code pairs into the occupancy
    bitmap (device twin of _update_pair_occ)."""
    r = cfg.part_radix
    for j in range(cfg.p // 2):
        idx = part_codes[:, 2 * j] * r + part_codes[:, 2 * j + 1]
        pair_occ = pair_occ.at[j, idx].max(jnp.uint8(1))
    return pair_occ


def _new_pair_occ(cfg: PQTConfig) -> Optional[np.ndarray]:
    if not cfg.pair_filter_enabled:
        return None
    return np.zeros((cfg.p // 2, cfg.part_radix ** 2), np.uint8)


def _update_pair_occ(cfg: PQTConfig, pair_occ: Optional[np.ndarray],
                     part_codes: np.ndarray) -> None:
    """Mark the (part 2j, part 2j+1) code pairs present in this chunk."""
    if pair_occ is None:
        return
    r = cfg.part_radix
    for j in range(cfg.p // 2):
        pair_occ[j][part_codes[:, 2 * j] * r + part_codes[:, 2 * j + 1]] = 1


def build_database(cfg: PQTConfig, tree: PQTree, data,
                   keep_vectors: bool = False,
                   encode_chunk: int = 65536) -> PQTDatabase:
    """Single-shot database build (fits-in-HBM path), fully on-device.

    data: (n, dim) array-like; uint8 input is uploaded raw (4x less transfer)
    and cast on device.  Encoding runs in jitted fixed-shape chunks; the CSR
    build is one jitted histogram + stable sort + row gather.  Host<->device
    traffic is exactly one upload of `data` and zero downloads — the r2
    host-merge path pulled every encoded array back per chunk, which
    dominated build time on remote-dispatch backends (BENCH_r02 regression).
    """
    data = np.asarray(data)
    if data.dtype not in (np.uint8, np.float32):
        data = data.astype(np.float32)
    n = data.shape[0]
    pair_occ = (jnp.zeros((cfg.p // 2, cfg.part_radix ** 2), jnp.uint8)
                if cfg.pair_filter_enabled else None)
    bins_l, packed_l = [], []
    for s in range(0, n, encode_chunk):
        e = min(n, s + encode_chunk)
        chunk = _pad_chunk(data[s:e], encode_chunk)
        bins_c, pc_c, packed_c = _encode_chunk(
            cfg, tree, chunk, jnp.int32(s))
        if e - s < encode_chunk:
            bins_c, pc_c, packed_c = (bins_c[: e - s], pc_c[: e - s],
                                      packed_c[: e - s])
        if pair_occ is not None:
            pair_occ = _pair_occ_device(cfg, pc_c, pair_occ)
        bins_l.append(bins_c)
        packed_l.append(packed_c)
    bins = jnp.concatenate(bins_l) if len(bins_l) > 1 else bins_l[0]
    packed = jnp.concatenate(packed_l) if len(packed_l) > 1 else packed_l[0]
    prefix, counts, prefix2, payload = _assemble_device(cfg, bins, packed)
    return PQTDatabase(
        prefix=prefix, counts=counts, payload=payload, pair_occ=pair_occ,
        vectors=jnp.asarray(data) if keep_vectors else None,
        prefix2=prefix2)


def _pad_chunk(x: np.ndarray, size: int) -> jnp.ndarray:
    """Pad the trailing chunk to a fixed size to avoid jit recompilation."""
    if x.shape[0] == size:
        return jnp.asarray(x)
    pad = size - x.shape[0]
    return jnp.asarray(
        np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)]))


def assemble_database(cfg: PQTConfig, bin_ids: np.ndarray,
                      codes: np.ndarray, t3: np.ndarray,
                      vectors: Optional[np.ndarray] = None,
                      id_offset: int = 0,
                      pair_occ: Optional[np.ndarray] = None) -> PQTDatabase:
    """Host-side CSR assembly from encoded chunks.

    The host-side twin of the device CSR build; also the merge step for
    chunked out-of-core builds (test1B.cpp:804-871's interleave-merge becomes
    a single global stable counting sort over all chunks' bin ids).  Runs on
    the native OpenMP runtime when available (pqt_tpu/cpp/pqt_host.cpp).
    """
    from pqt_tpu.io import native
    counts, prefix, order = native.build_csr(bin_ids, cfg.hash_size)
    # Pack in input order, then ONE wide native row-gather into CSR order.
    packed = pack_payload_cfg(
        cfg,
        np.arange(id_offset, id_offset + bin_ids.shape[0], dtype=np.int32),
        codes, t3)
    prefix2 = np.stack([prefix, prefix + counts], axis=1)
    return PQTDatabase(
        prefix=jnp.asarray(prefix),
        counts=jnp.asarray(counts),
        payload=jnp.asarray(native.gather_rows(packed, order)),
        pair_occ=jnp.asarray(pair_occ) if pair_occ is not None else None,
        vectors=jnp.asarray(vectors) if vectors is not None else None,
        prefix2=jnp.asarray(prefix2),
    )


class ChunkedDBBuilder:
    """Out-of-core database builder (test1B.cpp:764-898 equivalent).

    Feed arbitrarily large chunks (the reference uses 10M); each chunk is
    encoded on-device in fixed-shape jitted sub-chunks and only the COMPACT
    results (bin id + packed payload row per vector) come back to the host.
    A global bin histogram accumulates as chunks arrive, so `finalize()` is
    a single streaming counting-sort pass: per chunk, rows are placed
    directly at their final CSR positions — host RAM is bounded by
    (largest chunk) + (hash table cursors) + the output buffer, and the
    output buffer can live on disk (`spill_path`) for builds larger than
    RAM.  This replaces the r2 implementation that concatenated every
    chunk's arrays in RAM before one global sort (VERDICT r2 missing #2).

    The reference's host merge (test1B.cpp:804-871) re-reads and interleaves
    every per-chunk CSR sequentially; here the running histogram makes final
    positions computable without materializing per-chunk CSRs at all.
    """

    def __init__(self, cfg: PQTConfig, tree: PQTree,
                 keep_vectors: bool = False, encode_chunk: int = 65536,
                 spill_path: Optional[str] = None):
        self.cfg = cfg
        self.tree = tree
        self.keep_vectors = keep_vectors
        self.encode_chunk = encode_chunk
        self.spill_path = spill_path
        self._bins = []        # per-chunk (n,) int32
        self._packed = []      # per-chunk (n, w) int32 payload rows
        self._vecs = []
        self._hist = np.zeros((cfg.hash_size,), np.int64)
        self._n = 0
        self._pair_occ = (jnp.zeros((cfg.p // 2, cfg.part_radix ** 2),
                                    jnp.uint8)
                          if cfg.pair_filter_enabled else None)

    def add_chunk(self, data: np.ndarray):
        import jax
        data = np.asarray(data)
        if data.dtype not in (np.uint8, np.float32):
            data = data.astype(np.float32)
        n = data.shape[0]
        bins = np.empty((n,), np.int32)
        packed = np.empty((n, payload_width(self.cfg)), np.int32)
        for s in range(0, n, self.encode_chunk):
            e = min(n, s + self.encode_chunk)
            chunk = _pad_chunk(data[s:e], self.encode_chunk)
            bins_c, pc_c, packed_c = _encode_chunk(
                self.cfg, self.tree, chunk, jnp.int32(self._n + s))
            if self._pair_occ is not None:
                self._pair_occ = _pair_occ_device(
                    self.cfg, pc_c[: e - s], self._pair_occ)
            bins[s:e] = np.asarray(bins_c)[: e - s]
            packed[s:e] = np.asarray(packed_c)[: e - s]
        self._hist += np.bincount(bins, minlength=self.cfg.hash_size)
        if self.spill_path:
            # bounded RAM: encoded chunks (and raw vectors, when kept) go to
            # disk, reread once at finalize
            path = f"{self.spill_path}.chunk{len(self._bins)}.npz"
            if self.keep_vectors:
                np.savez(path, bins=bins, packed=packed, vecs=data)
            else:
                np.savez(path, bins=bins, packed=packed)
            self._bins.append(path)
            self._packed.append(path)
        else:
            self._bins.append(bins)
            self._packed.append(packed)
            if self.keep_vectors:
                self._vecs.append(data)
        if self.keep_vectors:
            self._vec_dtype = data.dtype
            self._dim = data.shape[1]
        self._n += n

    def finalize(self, to_device: bool = True) -> PQTDatabase:
        cfg = self.cfg
        n, w = self._n, payload_width(cfg)
        if self._hist.sum() != n:
            raise ValueError("bin histogram out of sync with row count")
        ends = np.cumsum(self._hist)
        prefix = (ends - self._hist).astype(np.int64)
        if n > np.iinfo(np.int32).max:
            raise NotImplementedError(
                "CSR positions exceed int32; shard the build")
        vec_mm = None
        if self.spill_path:
            payload = np.memmap(self.spill_path, np.int32, mode="w+",
                                shape=(n, w))
            if self.keep_vectors:
                # Raw vectors spill too, in CSR ORDER — bounded host RAM
                # for the billion path (the reference pins them all in host
                # DRAM instead, test1B.cpp:1121-1125), and a hash-range
                # shard's vector slice stays contiguous for
                # parallel/sharded.shard_database.
                vec_mm = np.memmap(f"{self.spill_path}.vecs",
                                   self._vec_dtype, mode="w+",
                                   shape=(n, self._dim))
        else:
            payload = np.empty((n, w), np.int32)
        # Streaming counting sort: chunks arrive in ascending id order and
        # are placed in INPUT order against per-bin cursors, so within
        # every bin ids stay ascending (same determinism as
        # build_database).  The placement + scatter run natively (one
        # linear cursor pass + OpenMP row scatter) with a NumPy stable-
        # argsort fallback — at 50M+ rows this loop IS the merge.
        from pqt_tpu.io import native
        cursor = prefix.copy()
        for bins, rows in zip(self._bins, self._packed):
            vecs_chunk = None
            if isinstance(bins, str):               # spilled chunk
                with np.load(bins) as z:
                    bins, rows = z["bins"], z["packed"]
                    if vec_mm is not None:
                        vecs_chunk = z["vecs"]
            pos = native.place_positions(bins, cursor)
            native.scatter_rows(np.ascontiguousarray(rows), pos, payload)
            if vecs_chunk is not None:
                native.scatter_rows(np.ascontiguousarray(vecs_chunk), pos,
                                    vec_mm)
        prefix32 = prefix.astype(np.int32)
        counts32 = self._hist.astype(np.int32)
        prefix2 = np.stack([prefix32, ends.astype(np.int32)], axis=1)
        vecs = np.concatenate(self._vecs) if self._vecs else None
        put = jnp.asarray if to_device else (lambda x: x)
        return PQTDatabase(
            prefix=put(prefix32),
            counts=put(counts32),
            payload=put(payload),
            pair_occ=(put(np.asarray(self._pair_occ))
                      if self._pair_occ is not None else None),
            vectors=put(vecs) if vecs is not None else None,
            prefix2=put(prefix2),
            vectors_csr=(put(vec_mm) if vec_mm is not None else None))


def encode_chunk_to_file(cfg: PQTConfig, tree: PQTree, data, id_offset: int,
                         path: str, encode_chunk: int = 65536,
                         keep_vectors: bool = False) -> int:
    """Encode ONE out-of-core chunk and write it to `path` (npz).

    The worker half of the multi-process build: each worker process (or
    each HOST in a multi-host build — every host encodes its own rows,
    SURVEY §2.4) encodes its slice against the shared tree and exits;
    `merge_chunk_files` assembles the CSR afterwards without any device.
    Returns the row count.  (Also the practical shape for this dev
    backend, whose relay breaks D2H in long encode sessions.)
    """
    import jax
    data = np.asarray(data)
    if data.dtype not in (np.uint8, np.float32):
        data = data.astype(np.float32)
    n = data.shape[0]
    bins = np.empty((n,), np.int32)
    packed = np.empty((n, payload_width(cfg)), np.int32)
    pair_occ = (jnp.zeros((cfg.p // 2, cfg.part_radix ** 2), jnp.uint8)
                if cfg.pair_filter_enabled else None)
    for s in range(0, n, encode_chunk):
        e = min(n, s + encode_chunk)
        chunk = _pad_chunk(data[s:e], encode_chunk)
        bins_c, pc_c, packed_c = _encode_chunk(
            cfg, tree, chunk, jnp.int32(id_offset + s))
        if pair_occ is not None:
            pair_occ = _pair_occ_device(cfg, pc_c[: e - s], pair_occ)
        bins[s:e] = np.asarray(bins_c)[: e - s]
        packed[s:e] = np.asarray(packed_c)[: e - s]
    arrays = dict(bins=bins, packed=packed)
    if keep_vectors:
        arrays["vecs"] = data
    if pair_occ is not None:
        arrays["pair_occ"] = np.asarray(pair_occ)
    np.savez(path, **arrays)
    return n


def merge_chunk_files_range(cfg: PQTConfig, paths, lo: int, hi: int,
                            keep_vectors: bool = False):
    """Merge encoded chunk files keeping ONLY hash bins [lo, hi).

    The per-HOST half of the multi-host out-of-core build: every host
    scans the shared chunk files (sequential reads) but allocates and
    fills only its own hash-range slice of the CSR — bounded host RAM at
    1/n_hosts of the database, the sharded replacement for the reference's
    full pinned-host merge (test1B.cpp:804-898, 1121-1125).  The output
    feeds `parallel.distributed.build_local_shards` directly.

    Returns (prefix (hi-lo,) int32 rebased to the slice, counts (hi-lo,)
    int32, payload (n_local, w) int32, vectors_csr or None, pair_occ or
    None — the OR of the chunks' code-pair occupancy, replicated across
    hosts so the sharded pair filter matches the single-process engine's)
    — same within-bin ascending-id determinism as the global merge.
    """
    span = hi - lo
    hist = np.zeros((span,), np.int64)
    vec_dtype = vec_dim = None
    pair_occ = None
    for p in paths:
        with np.load(p) as z:
            if keep_vectors and "vecs" not in z.files:
                raise ChunkFormatError(
                    f"chunk {p} has no raw vectors but keep_vectors=True "
                    "was requested")
            b = z["bins"]
            m = (b >= lo) & (b < hi)
            hist += np.bincount(b[m] - lo, minlength=span)
            if "pair_occ" in z.files:
                pair_occ = (z["pair_occ"] if pair_occ is None
                            else pair_occ | z["pair_occ"])
            if keep_vectors and vec_dtype is None:
                vec_dtype = z["vecs"].dtype
                vec_dim = int(z["vecs"].shape[1])
    ends = np.cumsum(hist)
    prefix = ends - hist
    n_local = int(ends[-1]) if span else 0
    payload = np.empty((n_local, payload_width(cfg)), np.int32)
    vecs = (np.empty((n_local, vec_dim), vec_dtype)
            if keep_vectors else None)
    from pqt_tpu.io import native
    cursor = prefix.copy()
    for p in paths:
        with np.load(p) as z:
            b, rows = z["bins"], z["packed"]
            vc = z["vecs"] if keep_vectors else None
        m = (b >= lo) & (b < hi)
        b = b[m] - lo
        rows = rows[m]
        pos = native.place_positions(b, cursor)
        native.scatter_rows(np.ascontiguousarray(rows), pos, payload)
        if vc is not None:
            native.scatter_rows(np.ascontiguousarray(vc[m]), pos, vecs)
    return (prefix.astype(np.int32), hist.astype(np.int32), payload, vecs,
            pair_occ)


def merge_chunk_files(cfg: PQTConfig, tree: PQTree, paths,
                      keep_vectors: bool = False,
                      spill_path: Optional[str] = None,
                      to_device: bool = True) -> PQTDatabase:
    """Assemble the global CSR database from `encode_chunk_to_file` chunks.

    Host-only (no device work): streaming counting sort with bounded RAM,
    exactly like ChunkedDBBuilder.finalize.  `keep_vectors=True` requires
    `spill_path` (vectors land in a CSR-ordered memmap).  With
    `to_device=False` the leaves stay host NumPy — the layout a sharded /
    multi-host loader slices before uploading shards.
    """
    if keep_vectors and not spill_path:
        raise ValueError("merge_chunk_files(keep_vectors=True) needs "
                         "spill_path (vectors merge into a CSR memmap)")
    b = ChunkedDBBuilder(cfg, tree, keep_vectors=keep_vectors,
                         spill_path=spill_path)
    b._pair_occ = None
    occ = None
    need_vec_meta = keep_vectors
    for p in paths:
        with np.load(p) as z:
            if keep_vectors and "vecs" not in z.files:
                raise ChunkFormatError(
                    f"chunk {p} has no raw vectors but "
                    "merge_chunk_files(keep_vectors=True) was requested; "
                    "re-encode it with encode_chunk_to_file("
                    "keep_vectors=True) or merge with keep_vectors=False")
            bins = z["bins"]
            b._hist += np.bincount(bins, minlength=cfg.hash_size)
            b._n += int(bins.shape[0])
            if need_vec_meta:
                # dtype/dim from the FIRST chunk only — NpzFile indexing
                # decompresses the whole member, so probing every chunk
                # would double the vector I/O of the merge (ADVICE r4)
                b._vec_dtype = z["vecs"].dtype
                b._dim = int(z["vecs"].shape[1])
                need_vec_meta = False
            if "pair_occ" in z:
                occ = z["pair_occ"] if occ is None else (occ | z["pair_occ"])
        b._bins.append(p)
        b._packed.append(p)
    if occ is not None:
        b._pair_occ = occ
    return b.finalize(to_device=to_device)
