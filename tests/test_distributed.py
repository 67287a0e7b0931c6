"""Multi-HOST serving test: two real OS processes, CPU backend.

Spawns tests/distributed_worker.py twice with `jax.distributed` pointed at
a local coordinator; each process owns half the hash-range shards and the
merged multi-process result must equal the single-device engine (SURVEY
§5.8 — the capability the reference lacks entirely; its scale answer is
zero-copy pinned host RAM, tool_query.cpp:134-135).
"""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_serving_matches_single_device():
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
