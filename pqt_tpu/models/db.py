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
    """Single-shot database build (fits-in-HBM path).

    data: (n, dim) array-like.  Encoding runs in jitted chunks; the CSR
    build is one sort + scatter-add.
    """
    data = np.asarray(data, np.float32)
    n = data.shape[0]
    bins = np.empty((n,), np.int32)
    codes = np.empty((n, cfg.line_parts), np.uint32)
    t3 = np.empty((n,), np.float32)
    pair_occ = _new_pair_occ(cfg)
    for s in range(0, n, encode_chunk):
        e = min(n, s + encode_chunk)
        chunk = _pad_chunk(data[s:e], encode_chunk)
        pc_dev = encode_part_codes(cfg, tree, chunk)
        bins[s:e] = np.asarray(binning.hashed_bin_ids(
            pc_dev, cfg.part_radix, cfg.hash_size))[: e - s]
        _update_pair_occ(cfg, pair_occ, np.asarray(pc_dev)[: e - s])
        c_chunk, t_chunk = encode_line_codes(cfg, tree, chunk)
        codes[s:e] = np.asarray(c_chunk)[: e - s]
        t3[s:e] = np.asarray(t_chunk)[: e - s]
    return assemble_database(cfg, bins, codes, t3,
                             vectors=data if keep_vectors else None,
                             pair_occ=pair_occ)


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

    Feed 10M-vector chunks; encoded bin ids + line codes accumulate on host;
    `finalize()` performs the global CSR merge.
    """

    def __init__(self, cfg: PQTConfig, tree: PQTree,
                 keep_vectors: bool = False, encode_chunk: int = 65536):
        self.cfg = cfg
        self.tree = tree
        self.keep_vectors = keep_vectors
        self.encode_chunk = encode_chunk
        self._bins = []
        self._codes = []
        self._t3 = []
        self._vecs = []
        self._pair_occ = _new_pair_occ(cfg)

    def add_chunk(self, data: np.ndarray):
        data = np.asarray(data, np.float32)
        n = data.shape[0]
        bins = np.empty((n,), np.int32)
        codes = np.empty((n, self.cfg.line_parts), np.uint32)
        t3 = np.empty((n,), np.float32)
        for s in range(0, n, self.encode_chunk):
            e = min(n, s + self.encode_chunk)
            chunk = _pad_chunk(data[s:e], self.encode_chunk)
            pc_dev = encode_part_codes(self.cfg, self.tree, chunk)
            bins[s:e] = np.asarray(binning.hashed_bin_ids(
                pc_dev, self.cfg.part_radix, self.cfg.hash_size))[: e - s]
            _update_pair_occ(self.cfg, self._pair_occ,
                             np.asarray(pc_dev)[: e - s])
            c_chunk, t_chunk = encode_line_codes(self.cfg, self.tree, chunk)
            codes[s:e] = np.asarray(c_chunk)[: e - s]
            t3[s:e] = np.asarray(t_chunk)[: e - s]
        self._bins.append(bins)
        self._codes.append(codes)
        self._t3.append(t3)
        if self.keep_vectors:
            self._vecs.append(data)

    def finalize(self) -> PQTDatabase:
        bins = np.concatenate(self._bins)
        codes = np.concatenate(self._codes)
        t3 = np.concatenate(self._t3)
        vecs = np.concatenate(self._vecs) if self._vecs else None
        return assemble_database(self.cfg, bins, codes, t3, vectors=vecs,
                                 pair_occ=self._pair_occ)
