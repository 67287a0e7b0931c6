"""Artifact (checkpoint) save/load for trees and databases.

The reference persists custom binary artifacts — tree `.ppqt`
(PerturbationProTree.cu:60-220), codebook `.pq` (ProQuantization.cu:36-95),
DB triplet `.prefix/.count/.dbIdx` + `.lines` (tool_createdb.cpp:116-138) —
and every tool does "load if exists else compute+save"
(testPPQT.cpp:283-290).  Loads validate the stored parameters against the
template/CLI config (treequantizer.hpp:802-806).

Here both artifacts are single .npz files carrying the config JSON; loads
re-validate it the same way.  `load_or_build` reproduces the compute-or-load
idiom.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import PQTDatabase
from pqt_tpu.models.tree import PQTree

_FORMAT_VERSION = 2


class ArtifactMismatch(RuntimeError):
    """Stored artifact parameters disagree with the requested config."""


def _npz_path(path: str) -> str:
    """np.savez appends .npz to suffix-less paths; normalize once here so
    save/load/load_or_build all agree on the on-disk name."""
    return path if path.endswith(".npz") else path + ".npz"


def _check_config(stored_json: str, cfg: PQTConfig, fields):
    stored = json.loads(stored_json)
    mine = json.loads(cfg.to_json())
    for f in fields:
        if stored.get(f) != mine.get(f):
            raise ArtifactMismatch(
                f"artifact {f} mismatch: stored={stored.get(f)!r} "
                f"requested={mine.get(f)!r}")


# Fields that determine tree geometry (D/C1/C2/P/W-equivalents).
_TREE_FIELDS = ("dim", "p", "c1", "c2", "line_parts")
_DB_FIELDS = _TREE_FIELDS + ("hash_size",)


def save_tree(path: str, cfg: PQTConfig, tree: PQTree) -> None:
    np.savez_compressed(
        _npz_path(path), __version__=_FORMAT_VERSION, config=cfg.to_json(),
        cb1=np.asarray(tree.cb1), cb2=np.asarray(tree.cb2))


def load_tree(path: str, cfg: PQTConfig) -> PQTree:
    with np.load(_npz_path(path), allow_pickle=False) as z:
        _check_config(str(z["config"]), cfg, _TREE_FIELDS)
        cb1 = jnp.asarray(z["cb1"])
        cb2 = jnp.asarray(z["cb2"])
    if cb1.shape != (cfg.p, cfg.c1, cfg.vl):
        raise ArtifactMismatch(f"cb1 shape {cb1.shape} != expected")
    if cb2.shape != (cfg.p, cfg.c1, cfg.c2, cfg.vl):
        raise ArtifactMismatch(f"cb2 shape {cb2.shape} != expected")
    return PQTree.from_codebooks(cfg, cb1, cb2)


def _stream_to_raw(arr, out_path: str, rows_per_block: int = 1 << 20):
    """Copy an array (possibly a disk memmap) to a raw file in bounded-RAM
    row blocks — never materializes the whole array."""
    with open(out_path, "wb") as f:
        for s in range(0, arr.shape[0], rows_per_block):
            f.write(np.ascontiguousarray(arr[s:s + rows_per_block])
                    .tobytes())


def save_database(path: str, cfg: PQTConfig, db: PQTDatabase,
                 adopt_memmaps: bool = False) -> None:
    """Persist a database artifact.

    In-RAM leaves go into one compressed npz.  Out-of-core leaves
    (np.memmap — the billion-path CSR payload / vector spill) are instead
    stream-copied to raw sidecar files `<path>.<leaf>.bin` with their
    shape/dtype recorded in the npz, so saving a spilled DB never
    materializes it in host RAM and loading maps it back lazily.

    adopt_memmaps=True RENAMES each memmap's backing file into place
    instead of copying (no extra I/O or disk for multi-GB spills) — only
    safe when the caller is done with `db` (the open memmaps go stale)."""
    base = _npz_path(path)
    arrays = dict(__version__=_FORMAT_VERSION, config=cfg.to_json(),
                  prefix=np.asarray(db.prefix), counts=np.asarray(db.counts))
    maybe = dict(payload=db.payload, pair_occ=db.pair_occ,
                 vectors=db.vectors, vectors_csr=db.vectors_csr)
    for name, leaf in maybe.items():
        if leaf is None:
            continue
        if isinstance(leaf, np.memmap):
            side = base + f".{name}.bin"
            src = getattr(leaf, "filename", None)
            same_file = src and os.path.exists(src) and \
                os.path.abspath(src) == os.path.abspath(side)
            if adopt_memmaps and src and os.path.exists(src):
                if not same_file:
                    os.replace(src, side)
            elif same_file:
                pass  # re-saving a loaded spilled DB to its own path: the
                # sidecar already IS the data; streaming would open it
                # 'wb' (truncate) under its own live mapping -> SIGBUS
            else:
                _stream_to_raw(leaf, side)
            arrays[name + "__shape"] = np.asarray(leaf.shape, np.int64)
            arrays[name + "__dtype"] = np.str_(np.dtype(leaf.dtype).str)
        else:
            arrays[name] = np.asarray(leaf)
    np.savez_compressed(base, **arrays)


def load_database(path: str, cfg: PQTConfig) -> PQTDatabase:
    from pqt_tpu.models.db import pack_payload, payload_width

    base = _npz_path(path)
    with np.load(base, allow_pickle=False) as z:
        _check_config(str(z["config"]), cfg, _DB_FIELDS)

        def leaf(name, device=True):
            """Inline npz leaf (→ device array) or raw sidecar (→ lazy host
            memmap — out-of-core leaves stay out of core on load)."""
            if name in z:
                return jnp.asarray(z[name]) if device else z[name]
            if name + "__shape" in z:
                return np.memmap(base + f".{name}.bin",
                                 np.dtype(str(z[name + "__dtype"])),
                                 mode="r",
                                 shape=tuple(z[name + "__shape"]))
            return None

        vectors = leaf("vectors")
        vectors_csr = leaf("vectors_csr")
        payload = leaf("payload", device=False)
        if payload is None:   # format v1 stored ids/codes/t3 separately
            payload = pack_payload(z["ids"], z["codes"], z["t3"])
        if not isinstance(payload, np.memmap):
            payload = jnp.asarray(payload)
        pair_occ = leaf("pair_occ")
        prefix = np.asarray(z["prefix"])
        counts = np.asarray(z["counts"])
        prefix2 = np.stack([prefix, prefix + counts], axis=1)
        db = PQTDatabase(
            prefix=jnp.asarray(prefix), counts=jnp.asarray(counts),
            payload=payload, pair_occ=pair_occ, vectors=vectors,
            prefix2=jnp.asarray(prefix2), vectors_csr=vectors_csr)
    if db.prefix.shape[0] != cfg.hash_size:
        raise ArtifactMismatch("hash table size mismatch")
    if db.payload.shape[1] != payload_width(cfg):
        raise ArtifactMismatch(
            f"payload width {db.payload.shape[1]} != {payload_width(cfg)} "
            "(line_parts / payload_compact mismatch)")
    return db


def load_or_build(path: str, loader: Callable, builder: Callable,
                  saver: Callable):
    """The reference's compute-or-load idiom (testPPQT.cpp:283-290)."""
    if os.path.exists(path) or os.path.exists(_npz_path(path)):
        return loader(path)
    obj = builder()
    saver(path, obj)
    return obj
