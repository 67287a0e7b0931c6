"""Line-code quality audit: payload codec width vs line-only recall.

VERDICT r4 weak #1: line-code-only recall is low on the held-out fixture,
but nothing separated the LINE MODEL's loss from the CODEC WIDTH's loss —
the compact payload halves the reference codec (4-bit A/B + 8-bit lambda
vs uint8 A/B + u16 lambda, helper.hpp:39-90).  This audit measures
line-only R@1 / top-10 intersection on the 1M bench fixture across:

  lp16-compact   c1=16, lp=16, lambda u8   (bench default payload)
  lp16-wide      c1=16, lp=16, lambda u16  (reference code_t width)
  lp32-compact   c1=16, lp=32, lambda u8
  lp32-wide      c1=16, lp=32, lambda u16  (SIFT1B reference shape)
  lp32-c32-wide  c1=32, lp=32, lambda u16  (wide codebook: A/B precision up)

plus diagnostics.quantization_stats' per-codec model-error rows
(rel_err_model / rel_err_codec16 / rel_err_codec8) on a 4k sample, so the
table attributes the line R@1 gap to model vs codec vs fixture.

Usage:  python benchmarks/ab_linecodes.py            # all variants
        python benchmarks/ab_linecodes.py --variant lp16-wide   # one (stage)

Each variant runs in its own subprocess/session (clean-session protocol,
BASELINE.md r4); recall only — no timing, so session state is irrelevant,
but D2H limits still apply (downloads happen early, buffers stay small).
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = {
    # name: (c1, lp, payload_compact, lambda_bits)
    "lp16-compact": (16, 16, True, 8),
    "lp16-wide": (16, 16, False, 16),
    "lp32-compact": (16, 32, True, 8),
    "lp32-wide": (16, 32, False, 16),
    "lp32-c32-wide": (32, 32, False, 16),
}


def _cfg(k, name):
    import pqt_tpu as P
    c1, lp, compact, lbits = VARIANTS[name]
    hash_size = min(P.SIFT1M_CONFIG.hash_size,
                    max(1 << 18, 1 << (k["n"] - 1).bit_length()))
    return P.SIFT1M_CONFIG.replace(
        c1=c1, c2=16, line_parts=lp, payload_compact=compact,
        lambda_bits=lbits, kmeans_iters=8, train_subsample=100_000,
        hash_size=hash_size, max_bins=512, max_candidates=1024,
        pair_top_m=128, enum_width=512,
        k1_build=min(16, c1), k1_query=min(8, c1))


def stage_variant(name):
    import jax
    import jax.numpy as jnp
    import pqt_tpu as P
    from bench import _fixture_paths, _knobs, _load_fixture
    from pqt_tpu.io import artifacts
    from pqt_tpu.utils.cache import enable_persistent_cache
    from pqt_tpu.utils.diagnostics import quantization_stats
    enable_persistent_cache()
    k = _knobs()
    paths = _fixture_paths(k)
    data, queries = _load_fixture(paths)
    cfg = _cfg(k, name)
    tree_path = os.path.join(k["cache"], f"ablc_tree_{cfg.c1}_{cfg.line_parts}")
    t0 = time.time()
    tree = artifacts.load_or_build(
        tree_path,
        lambda p: artifacts.load_tree(p, cfg),
        lambda: P.train_tree(cfg, np.asarray(data[:200_000])),
        lambda p, t: artifacts.save_tree(p, cfg, t))
    jax.block_until_ready(tree.cb2)
    train_s = time.time() - t0
    t0 = time.time()
    # the line-code residual grid is (chunk, lp, c1, c1): scale the encode
    # chunk with 1/c1^2 so device memory stays constant across variants
    chunk = max(1 << 13, (1 << 17) // ((cfg.c1 // 16) ** 2))
    db = P.build_database(cfg, tree, np.asarray(data), encode_chunk=chunk)
    jax.block_until_ready(db.payload)
    build_s = time.time() - t0
    qd = jnp.asarray(queries)
    B = 256
    ids = []
    for s in range(0, qd.shape[0], B):
        ids.append(np.asarray(
            P.query_knn(cfg, tree, db, qd[s:s + B], 100).indices))
    ids = np.concatenate(ids)
    np.save(os.path.join(k["cache"], f"ablc_ids_{name}.npy"), ids)
    qs = quantization_stats(cfg, tree, np.asarray(data[:4096]))
    row = {"variant": name, "train_s": round(train_s, 1),
           "build_s": round(build_s, 1),
           "payload_bytes_per_row": 4 * db.payload.shape[1],
           **{kk: round(vv, 5) for kk, vv in qs.items()}}
    with open(os.path.join(k["cache"], f"ablc_row_{name}.json"), "w") as f:
        json.dump(row, f)
    print(json.dumps(row))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None)
    args = ap.parse_args()
    if args.variant:
        return stage_variant(args.variant)

    # orchestrator: strip the TPU plugin from THIS process (BASELINE.md r4)
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
        os.environ["PQT_AXON_STASH"] = stash     # _run_stage restores it
    _run_stage("gt")

    rows = []
    for name in VARIANTS:
        row_path = os.path.join(k["cache"], f"ablc_row_{name}.json")
        ids_path = os.path.join(k["cache"], f"ablc_ids_{name}.npy")
        if os.path.exists(row_path) and os.path.exists(ids_path):
            with open(row_path) as f:
                rows.append(json.load(f))
            print(f"# {name} cached", file=sys.stderr, flush=True)
            continue
        env = dict(os.environ)
        env.pop("PQT_AXON_STASH", None)
        if stash:
            env["PALLAS_AXON_POOL_IPS"] = stash
        r = None
        for attempt in range(3):
            try:
                pr = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--variant", name],
                    env=env, capture_output=True, text=True, timeout=1800)
            except subprocess.TimeoutExpired:
                sys.stderr.write(f"# {name} attempt {attempt} timeout\n")
                continue
            if pr.returncode == 0:
                r = json.loads([ln for ln in pr.stdout.splitlines()
                                if ln.startswith("{")][-1])
                break
            sys.stderr.write(f"# {name} attempt {attempt} rc="
                             f"{pr.returncode}\n{pr.stderr[-1500:]}\n")
        if r is None:
            raise SystemExit(f"variant {name} failed")
        rows.append(r)
        print(f"# {name} done", file=sys.stderr, flush=True)

    with np.load(paths["gt"]) as z:
        gt = z["gt"]
    from pqt_tpu.utils.metrics import intersection_at
    out = []
    for r in rows:
        ids = np.load(os.path.join(k["cache"],
                                   f"ablc_ids_{r['variant']}.npy"))
        nq = min(ids.shape[0], gt.shape[0])
        r["line_recall_at_1"] = round(
            float((ids[:nq, 0] == gt[:nq, 0]).mean()), 4)
        r["line_top10_intersection"] = round(intersection_at(
            ids[:nq], gt[:nq], ks=(10,))["top10_intersection"], 4)
        out.append(r)
        print(json.dumps(r))
    with open("AB_LINECODES.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
