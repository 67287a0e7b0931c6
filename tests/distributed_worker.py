"""Worker process for tests/test_distributed.py — NOT a pytest file.

Each of two OS processes runs this script on the CPU backend with 2 local
virtual devices (4 global).  Both build the same tiny fixture
deterministically, but each keeps only ITS OWN hash-range slice host-side
(the multi-host bounded-RAM loading story), assembles the global sharded
database from process-local buffers, runs the multi-host serving step
(shard_map all_gather merge over the 2x2-device mesh), and checks the
merged result against the single-device engine on the full database.

Env: COORD=localhost:<port>, PROC_ID={0,1}, JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=2
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize force-registers the TPU plugin and sets
# jax_platforms="axon,cpu" regardless of env; override BEFORE any backend
# or distributed-runtime use (same trick as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

jax.distributed.initialize(coordinator_address=os.environ["COORD"],
                           num_processes=2,
                           process_id=int(os.environ["PROC_ID"]))

import numpy as np  # noqa: E402

from pqt_tpu.config import PQTConfig  # noqa: E402
from pqt_tpu.models.db import build_database  # noqa: E402
from pqt_tpu.models.query import query_knn  # noqa: E402
from pqt_tpu.models.tree import train_tree  # noqa: E402
from pqt_tpu.parallel import distributed as D  # noqa: E402
from pqt_tpu.parallel.sharded import make_sharded_query_fn  # noqa: E402

CFG = PQTConfig(
    dim=32, p=4, c1=8, c2=4, line_parts=8, hash_size=1 << 12,
    k1_build=4, k1_query=4, max_bins=128, bin_enum_factor=4,
    max_candidates=512, max_vec_per_bin=128, kmeans_iters=6)

N_SHARDS = 4
PAD = 128


def main():
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    rng = np.random.default_rng(42)
    centers = rng.normal(0, 1.0, (32, CFG.dim)).astype(np.float32)
    which = rng.integers(0, 32, 2048)
    db_vecs = (centers[which] +
               rng.normal(0, 0.4, (2048, CFG.dim))).astype(np.float32)
    queries = (centers[rng.integers(0, 32, 16)] +
               rng.normal(0, 0.4, (16, CFG.dim))).astype(np.float32)

    # Deterministic: both processes derive the identical tree/db from the
    # same input on the same backend.  A real deployment broadcasts the tree
    # artifact; each host genuinely encodes/loads only its own rows.
    tree = train_tree(CFG, db_vecs)
    db = build_database(CFG, tree, db_vecs, keep_vectors=True)

    prefix = np.asarray(db.prefix)
    counts = np.asarray(db.counts)
    payload = np.asarray(db.payload)
    vectors = np.asarray(db.vectors)
    n = payload.shape[0]

    mesh = D.global_device_mesh()
    assert mesh.shape["db"] == N_SHARDS
    my = D.local_shard_ids(mesh)
    assert len(my) == 2 and my == sorted(my)
    lo, hi = D.host_shard_range(CFG, N_SHARDS, my)

    # This host's CSR slice (in production: read straight from the artifact
    # file region — contiguous by construction).
    start = int(prefix[lo])
    end = int(prefix[hi]) if hi < CFG.hash_size else n
    local_prefix = prefix[lo:hi] - start
    local_counts = counts[lo:hi]
    local_payload = payload[start:end]
    local_vec_csr = vectors[payload[start:end, 0]]

    local_sdb = D.build_local_shards(
        CFG, N_SHARDS, my, local_prefix, local_counts, local_payload,
        vectors_csr=local_vec_csr, pad_to_multiple=PAD)

    # Global per-shard pad budget: computable from the global prefix here;
    # real launchers process_allgather the local max.
    span = CFG.hash_size // N_SHARDS
    starts = [int(prefix[s * span]) for s in range(N_SHARDS)]
    lens = [e - s for s, e in zip(starts, starts[1:] + [n])]
    max_n = -(-max(max(lens), 1) // PAD) * PAD

    sdb = D.place_host_sharded_db(CFG, local_sdb, mesh,
                                  global_max_shard_n=max_n)
    tree_g = D.replicate(mesh, tree)
    queries_g = D.replicate(mesh, queries)

    qfn = make_sharded_query_fn(CFG, mesh, k=10, mode="exact")
    res = qfn(tree_g, sdb, queries_g)
    got_ids = np.asarray(res.indices.addressable_data(0))
    got_d = np.asarray(res.dists.addressable_data(0))

    # Versus the single-device engine on the full database.  Sharding
    # probes max_bins PER SHARD, so the merged candidate set is a superset
    # in expectation: recall must match or beat, and both rank by true
    # distance (same invariant as tests/test_parallel.py).
    from pqt_tpu.ops.distance import brute_force_knn
    from pqt_tpu.utils.metrics import recall_at
    _, gt = brute_force_knn(jax.numpy.asarray(queries),
                            jax.numpy.asarray(db_vecs), 10)
    gt = np.asarray(gt)
    ref = query_knn(CFG, tree, db, jax.numpy.asarray(queries), 10, True)
    r_dist = recall_at(got_ids, gt, ks=(10,))["R@10"]
    r_single = recall_at(np.asarray(ref.indices), gt, ks=(10,))["R@10"]
    assert r_dist >= r_single - 1e-9, (r_dist, r_single)
    assert r_dist > 0.8, r_dist
    # merged lists are sorted by true distance
    assert (np.diff(got_d, axis=1)[np.isfinite(got_d[:, 1:])] >= -1e-5).all()
    print(f"DIST_OK proc={jax.process_index()} "
          f"devices={len(jax.devices())}", flush=True)


if __name__ == "__main__":
    main()
