"""Multi-HOST serving test: two real OS processes, CPU backend.

The harness plays the OFFLINE build: train a tree, save the artifact, and
encode the dataset into chunk files with `encode_chunk_to_file` — exactly
the shape a real multi-host build writes (one file per worker/host).  It
then spawns tests/distributed_worker.py twice with `jax.distributed`
pointed at a local coordinator; each process merges ONLY its hash-range
slice from the chunk files on disk (`merge_chunk_files_range`, bounded
host RAM), assembles the global sharded DB from process-local buffers
(pad budget exchanged via process_allgather), and the merged serving
result must match or beat the single-device engine (SURVEY §5.8 — the
capability the reference lacks entirely; its scale answer is zero-copy
pinned host RAM, tool_query.cpp:134-135; chunk merge test1B.cpp:804-898).
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _prepare_artifacts(work: str):
    """Offline build: tree artifact + encoded chunk files + gt/reference."""
    import jax.numpy as jnp
    from pqt_tpu.io import artifacts
    from pqt_tpu.models.db import build_database, encode_chunk_to_file
    from pqt_tpu.models.query import query_knn
    from pqt_tpu.models.tree import train_tree
    from pqt_tpu.ops.distance import brute_force_knn
    from pqt_tpu.utils.metrics import recall_at
    # config must match distributed_worker.CFG
    from distributed_worker import CFG

    rng = np.random.default_rng(42)
    centers = rng.normal(0, 1.0, (32, CFG.dim)).astype(np.float32)
    which = rng.integers(0, 32, 2048)
    db_vecs = (centers[which] +
               rng.normal(0, 0.4, (2048, CFG.dim))).astype(np.float32)
    queries = (centers[rng.integers(0, 32, 16)] +
               rng.normal(0, 0.4, (16, CFG.dim))).astype(np.float32)

    tree = train_tree(CFG, db_vecs)
    artifacts.save_tree(os.path.join(work, "tree"), CFG, tree)
    off = 0
    for i, s in enumerate(range(0, db_vecs.shape[0], 700)):
        off += encode_chunk_to_file(
            CFG, tree, db_vecs[s:s + 700], off,
            os.path.join(work, f"chunk{i}.npz"), encode_chunk=512,
            keep_vectors=True)
    np.save(os.path.join(work, "queries.npy"), queries)
    _, gt = brute_force_knn(jnp.asarray(queries), jnp.asarray(db_vecs), 10)
    np.save(os.path.join(work, "gt.npy"), np.asarray(gt))
    db = build_database(CFG, tree, db_vecs, keep_vectors=True)
    ref = query_knn(CFG, tree, db, jnp.asarray(queries), 10, True)
    r10 = recall_at(np.asarray(ref.indices), np.asarray(gt),
                    ks=(10,))["R@10"]
    np.save(os.path.join(work, "ref_r10.npy"), np.asarray(r10))


def test_two_process_serving_matches_single_device(tmp_path):
    sys.path.insert(0, os.path.dirname(WORKER))
    _prepare_artifacts(str(tmp_path))
    port = _free_port()
    # Strip the axon TPU plugin env entirely: PALLAS_AXON_POOL_IPS triggers
    # sitecustomize's register(), which would have every worker open a TPU
    # session (and contend with any real benchmark running on the chip).
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS")}
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "COORD": f"localhost:{port}",
        "DIST_DIR": str(tmp_path),
        # keep BLAS etc. from oversubscribing the CI box
        "OMP_NUM_THREADS": "2",
    })
    procs = []
    for pid in (0, 1):
        e = dict(env, PROC_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=os.path.dirname(os.path.dirname(WORKER))))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        assert "DIST_OK" in out, f"proc {pid} no DIST_OK:\n{out[-4000:]}"
        # each process materialized only its own slice (~half the rows)
        import re
        m = re.search(r"local_rows=(\d+)", out)
        assert m and int(m.group(1)) < 2048, out
