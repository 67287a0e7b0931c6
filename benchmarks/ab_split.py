"""Split-tree vs single-tree recall A/B on the 1M bench fixture.

VERDICT r4 missing #3 "done" criterion: the first-class split API
(models/split.py) measured against the plain single-tree database at the
same code size and probe budget.  The split design retrains refinement
codebooks on the densest 30% of the L1 population (createTreeSplitSparse,
ProTree.cu:641-706; test1B modes 5/6), trading a second database's probe
work for tighter cells where occupancy is worst — this harness reports
recall, candidate counts, and the occupancy balance of both member
databases so the trade is visible.

Usage: python benchmarks/ab_split.py     (stages in clean sessions)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cfg(k):
    from bench import _config
    return _config(k)


def stage_split():
    import jax
    import jax.numpy as jnp
    import pqt_tpu as P
    from bench import _fixture_paths, _knobs, _load_fixture
    from pqt_tpu.utils.cache import enable_persistent_cache
    from pqt_tpu.utils.metrics import occupancy_histogram
    enable_persistent_cache()
    k = _knobs()
    paths = _fixture_paths(k)
    data, queries = _load_fixture(paths)
    cfg = _cfg(k)
    t0 = time.time()
    sdb = P.build_split_database(cfg, np.asarray(data), keep_vectors=False,
                                 encode_chunk=1 << 17,
                                 train_data=np.asarray(data[:200_000]))
    build_s = time.time() - t0
    qd = jnp.asarray(queries)
    B = k["batch"]
    ids, ncand = [], []
    for s in range(0, qd.shape[0], B):
        r = P.query_knn_split(cfg, sdb, qd[s:s + B], 100)
        ids.append(np.asarray(r.indices))
        ncand.append(np.asarray(r.n_candidates))
    np.save(os.path.join(k["cache"], "absplit_ids.npy"),
            np.concatenate(ids))
    occ_d = occupancy_histogram(np.asarray(sdb.dense_db.counts))
    occ_s = occupancy_histogram(np.asarray(sdb.sparse_db.counts))
    print(json.dumps({
        "build_s": round(build_s, 1),
        "n_dense": int(sdb.dense_ids.shape[0]),
        "n_sparse": int(sdb.sparse_ids.shape[0]),
        "mean_cand": round(float(np.concatenate(ncand).mean()), 1),
        "dense_max_bin": occ_d["max_bin"],
        "dense_mean_nonempty": round(occ_d["mean_nonempty"], 1),
        "sparse_max_bin": occ_s["max_bin"],
        "sparse_mean_nonempty": round(occ_s["mean_nonempty"], 1),
    }))


def stage_single():
    import jax
    import jax.numpy as jnp
    import pqt_tpu as P
    from bench import _fixture_paths, _knobs, _load_fixture
    from pqt_tpu.io import artifacts
    from pqt_tpu.utils.cache import enable_persistent_cache
    from pqt_tpu.utils.metrics import occupancy_histogram
    enable_persistent_cache()
    k = _knobs()
    paths = _fixture_paths(k)
    data, queries = _load_fixture(paths)
    cfg = _cfg(k)
    tree = artifacts.load_tree(paths["tree"], cfg)
    db = artifacts.load_database(paths["db"], cfg)
    qd = jnp.asarray(queries)
    B = k["batch"]
    ids, ncand = [], []
    for s in range(0, qd.shape[0], B):
        r = P.query_knn(cfg, tree, db, qd[s:s + B], 100)
        ids.append(np.asarray(r.indices))
        ncand.append(np.asarray(r.n_candidates))
    np.save(os.path.join(k["cache"], "absplit_single_ids.npy"),
            np.concatenate(ids))
    occ = occupancy_histogram(np.asarray(db.counts))
    print(json.dumps({"single_max_bin": occ["max_bin"],
                      "single_mean_nonempty": round(occ["mean_nonempty"],
                                                    1),
                      "single_mean_cand": round(
                          float(np.concatenate(ncand).mean()), 1)}))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--stage":
        return {"split": stage_split, "single": stage_single}[sys.argv[2]]()

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
    _run_stage("gt")

    out = {"metric": "ab_split_vs_single_line_path", "n_db": k["n"]}
    for stage in ("split", "single"):
        env = dict(os.environ)
        env.pop("PQT_AXON_STASH", None)
        if stash:
            env["PALLAS_AXON_POOL_IPS"] = stash
        got = None
        for attempt in range(3):
            try:
                pr = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--stage", stage],
                    env=env, capture_output=True, text=True, timeout=2400)
            except subprocess.TimeoutExpired:
                continue
            if pr.returncode == 0:
                got = json.loads([ln for ln in pr.stdout.splitlines()
                                  if ln.startswith("{")][-1])
                break
            sys.stderr.write(f"# {stage} attempt {attempt} rc="
                             f"{pr.returncode}\n{pr.stderr[-1500:]}\n")
        if got is None:
            raise SystemExit(f"stage {stage} failed")
        out.update(got)
        print(f"# {stage} done", file=sys.stderr, flush=True)

    from pqt_tpu.utils.metrics import intersection_at
    with np.load(paths["gt"]) as z:
        gt = z["gt"]
    for name, f in (("split", "absplit_ids.npy"),
                    ("single", "absplit_single_ids.npy")):
        ids = np.load(os.path.join(k["cache"], f))
        nq = min(ids.shape[0], gt.shape[0])
        out[f"{name}_recall_at_1"] = round(
            float((ids[:nq, 0] == gt[:nq, 0]).mean()), 4)
        out[f"{name}_top10_intersection"] = round(intersection_at(
            ids[:nq], gt[:nq], ks=(10,))["top10_intersection"], 4)
    print(json.dumps(out))
    with open("AB_SPLIT.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
