"""Projected multi-chip scaling curve from per-shard probe budgets.

VERDICT r4 next #7: real multi-chip hardware is unavailable here, so the
honest substitute for a measured 1->N scaling curve is the dominant term
of the sharded design measured directly: in the hash-range-sharded
serving step (parallel/sharded.py) every chip probes max_bins/S bins and
gathers max_candidates/S rows of its OWN shard for the full query batch
(queries replicated), then one small all_gather merges (B, k) tops.  The
per-chip step time is therefore the single-chip time AT THE PER-SHARD
BUDGET — measured here for S = 1, 2, 4, 8 in clean sessions (BASELINE.md
r4 protocol) — plus the ICI all_gather of S*(B, 2k) floats, which at
B=256, k=100 is ~0.8 MB: <40 us at v5e all_gather bandwidth, <2% of a
0.25 ms step, so the projection below is tight.

Scaling efficiency at S chips (same GLOBAL probe budget, same recall
ceiling) = QPS(budget/S) / (S * QPS(budget)).

Prints one JSON line per S and writes SCALING_BUDGET.json.
Usage: python benchmarks/scaling_budget.py  (after bench.py's prepare/gt
have populated the artifact cache, or standalone — it prepares itself).
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHARDS = (1, 2, 4, 8)
BASE_BINS, BASE_CAND = 512, 1024


def stage_measure(s_val):
    import jax
    import jax.numpy as jnp
    import pqt_tpu as P
    from bench import _config, _fixture_paths, _knobs, _load_fixture
    from pqt_tpu.io import artifacts
    from pqt_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    k = _knobs()
    paths = _fixture_paths(k)
    data, queries = _load_fixture(paths)
    cfg = _config(k)
    tree = artifacts.load_tree(paths["tree"], cfg)
    db = artifacts.load_database(paths["db"], cfg)
    db = db._replace(vectors=jnp.asarray(np.asarray(data)))
    cfg = cfg.replace(max_bins=max(BASE_BINS // s_val, 16),
                      max_candidates=max(BASE_CAND // s_val, 32),
                      enum_width=max(BASE_BINS // s_val, 16),
                      pair_top_m=max(128 // s_val, 16))
    qd = jnp.asarray(queries)
    B, nq = k["batch"], k["n_queries"]
    nb = nq // B

    def fn(x):
        return P.query_knn(cfg, tree, db, x, 100, True).indices

    jax.block_until_ready(fn(qd[:B]))
    qps = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(qd[s * B:(s + 1) * B]) for s in range(nb)]
        jax.block_until_ready(outs)
        qps.append(nq / (time.perf_counter() - t0))
    print(json.dumps({"s": s_val, "qps": round(float(np.max(qps)), 1),
                      "qps_med": round(float(np.median(qps)), 1)}))


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--measure":
        return stage_measure(int(sys.argv[2]))

    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        env = dict(os.environ)
        env["PQT_AXON_STASH"] = env.pop("PALLAS_AXON_POOL_IPS")
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
                  env)
    stash = os.environ.pop("PQT_AXON_STASH", None)

    from bench import _ensure_fixture, _fixture_paths, _knobs, _run_stage
    k = _knobs()
    paths = _fixture_paths(k)
    _ensure_fixture(k, paths)
    if stash:
        os.environ["PQT_AXON_STASH"] = stash
    _run_stage("prepare")

    results = {}
    n_sessions = int(os.environ.get("PQT_SCALING_SESSIONS", 2))
    for s_val in SHARDS:
        best = None
        for _ in range(n_sessions):
            env = dict(os.environ)
            env.pop("PQT_AXON_STASH", None)
            if stash:
                env["PALLAS_AXON_POOL_IPS"] = stash
            got = None
            for attempt in range(3):
                try:
                    pr = subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--measure", str(s_val)],
                        env=env, capture_output=True, text=True,
                        timeout=900)
                except subprocess.TimeoutExpired:
                    continue
                if pr.returncode == 0:
                    got = json.loads(
                        [ln for ln in pr.stdout.splitlines()
                         if ln.startswith("{")][-1])
                    break
                sys.stderr.write(f"# S={s_val} attempt {attempt} rc="
                                 f"{pr.returncode}\n{pr.stderr[-1200:]}\n")
            if got is None:
                raise SystemExit(f"S={s_val} measurement failed")
            if best is None or got["qps"] > best["qps"]:
                best = got
        results[s_val] = best
        print(f"# S={s_val}: {best['qps']:.0f} QPS", file=sys.stderr,
              flush=True)

    base = results[1]["qps"]
    out = []
    for s_val in SHARDS:
        q = results[s_val]["qps"]
        out.append({
            "shards": s_val,
            "per_shard_budget": f"{max(BASE_BINS // s_val, 16)}/"
                                f"{max(BASE_CAND // s_val, 32)}",
            "single_chip_qps_at_budget": q,
            "single_chip_qps_med": results[s_val]["qps_med"],
            "speedup_vs_full_budget": round(q / base, 3),
            # same global budget spread over S chips: efficiency vs linear
            "projected_scaling_efficiency": round(q / base / s_val, 3)
            if s_val > 1 else 1.0,
            # throughput-mode alternative: batch-shard queries instead
            # (each chip full budget, 1/S of the batch) is exactly linear
            # minus the merge, so min(efficiency) bounds BOTH modes.
        })
        print(json.dumps(out[-1]))
    with open("SCALING_BUDGET.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
