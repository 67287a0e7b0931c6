"""CLI: train a PQ tree and build a database from a dataset file.

Equivalent of the reference's tool_createdb (tool_createdb.cpp:26-148):
read vectors, train (or load) the tree, encode the database, dump artifacts.
Artifact naming follows the reference's `basename_dim_p_c1_c2` scheme
(tool_createdb.cpp:57-77).

Usage:
  python -m pqt_tpu.tools.create_db --dataset sift_base.fvecs \
      --basename out/sift1m --p 4 --c1 16 --c2 16 [--chunksize 10000000]
"""

from __future__ import annotations

import argparse
import os
import time


def artifact_paths(basename: str, cfg) -> dict:
    stem = f"{basename}_{cfg.dim}_{cfg.p}_{cfg.c1}_{cfg.c2}"
    return {"tree": stem + ".tree.npz", "db": stem + ".db.npz"}


def read_dataset(path: str, count: int = -1, offset: int = 0):
    from pqt_tpu.io import texmex
    if path.endswith((".fvecs", ".bvecs", ".ivecs")):
        return texmex.read_xvecs(path, count, offset)
    if path.endswith((".umem", ".imem", ".fmem")):
        return texmex.read_mem(path, count, offset)
    raise ValueError(f"unknown dataset format: {path}")


def dataset_header(path: str):
    from pqt_tpu.io import texmex
    if path.endswith((".fvecs", ".bvecs", ".ivecs")):
        return texmex.xvecs_header(path)
    return texmex.mem_header(path)


def read_train_sample(path: str, num: int, n_train: int,
                      n_blocks: int = 64):
    """Training subsample spread ACROSS the dataset file.

    The reference trains on vectors subsampled across the whole file
    (test/test1B.cpp:703-724's strided reads); taking the FIRST n_train rows
    skews codebooks on ordered datasets (e.g. bvecs shards).  Reads
    `n_blocks` contiguous blocks at evenly spaced offsets — contiguous IO,
    file-wide coverage.
    """
    import numpy as np
    if n_train >= num:
        return read_dataset(path, num)
    n_blocks = min(n_blocks, max(1, n_train // 1024))
    per = n_train // n_blocks
    stride = num // n_blocks
    parts = [read_dataset(path, per, i * stride) for i in range(n_blocks)]
    return np.concatenate(parts, axis=0)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", required=True,
                    help=".fvecs/.bvecs/.umem database vectors")
    ap.add_argument("--basename", required=True, help="artifact path stem")
    ap.add_argument("--p", type=int, default=4)
    ap.add_argument("--c1", type=int, default=16)
    ap.add_argument("--c2", type=int, default=16)
    ap.add_argument("--lineparts", type=int, default=16)
    ap.add_argument("--hashsize", type=int, default=1 << 22,
                    help="inverted-file slots (power of two)")
    ap.add_argument("--chunksize", type=int, default=10_000_000,
                    help="vectors per build chunk (test1B.cpp chunking)")
    ap.add_argument("--train-size", type=int, default=2_000_000,
                    help="training subsample (test1B.cpp:703 uses 2M)")
    ap.add_argument("--keep-vectors", action="store_true",
                    help="store raw vectors for exact re-rank")
    ap.add_argument("--kmeans-iters", type=int, default=25)
    ap.add_argument("--spill", default=None, metavar="PATH",
                    help="out-of-core build: stream encoded chunks through "
                         "disk and finalize into memmaps at PATH (bounded "
                         "host RAM — the billion-scale mode, "
                         "test1B.cpp:764-898)")
    ap.add_argument("--mode", choices=("full", "encode", "merge"),
                    default="full",
                    help="'encode' writes ONE chunk file (give --chunk-id) "
                         "and exits — run one worker per chunk/host; "
                         "'merge' assembles all chunk files into the final "
                         "database without touching a device")
    ap.add_argument("--chunk-id", type=int, default=-1,
                    help="which chunk to encode in --mode encode")
    args = ap.parse_args(argv)

    import numpy as np
    from pqt_tpu.config import PQTConfig
    from pqt_tpu.io import artifacts
    from pqt_tpu.models.db import ChunkedDBBuilder
    from pqt_tpu.models.tree import train_tree
    from pqt_tpu.utils.metrics import occupancy_histogram

    num, dim = dataset_header(args.dataset)
    cfg = PQTConfig(dim=dim, p=args.p, c1=args.c1, c2=args.c2,
                    line_parts=args.lineparts, hash_size=args.hashsize,
                    kmeans_iters=args.kmeans_iters,
                    k1_build=min(16, args.c1), k1_query=min(8, args.c1))
    paths = artifact_paths(args.basename, cfg)
    os.makedirs(os.path.dirname(paths["tree"]) or ".", exist_ok=True)

    # --- tree: load-or-train (testPPQT.cpp:283-290 idiom) ----------------
    if os.path.exists(paths["tree"]):
        print(f"loading tree from {paths['tree']}")
        tree = artifacts.load_tree(paths["tree"], cfg)
    else:
        n_train = min(num, args.train_size)
        print(f"training tree on {n_train} vectors "
              f"(sampled across the file) ...")
        t0 = time.time()
        tree = train_tree(cfg, read_train_sample(args.dataset, num, n_train))
        print(f"trained in {time.time() - t0:.1f}s")
        artifacts.save_tree(paths["tree"], cfg, tree)

    stem = paths["db"][:-len(".db.npz")] if paths["db"].endswith(".db.npz") \
        else paths["db"]

    # --- worker mode: encode ONE chunk file and exit ---------------------
    # (the multi-process / multi-host build half; each worker — or each
    # host — encodes its slice against the shared tree, then a single
    # host-only merge assembles the CSR.  test1B.cpp:764-898 analog.)
    if args.mode == "encode":
        from pqt_tpu.models.db import encode_chunk_to_file
        i = args.chunk_id
        n_chunks = -(-num // args.chunksize)
        if not 0 <= i < n_chunks:
            raise SystemExit(f"--chunk-id must be in [0, {n_chunks})")
        off = i * args.chunksize
        n_chunk = min(args.chunksize, num - off)
        t0 = time.time()
        out = f"{stem}.chunk{i}.npz"
        encode_chunk_to_file(cfg, tree, read_dataset(args.dataset, n_chunk,
                                                     off),
                             off, out, keep_vectors=args.keep_vectors)
        print(f"encoded chunk {i}/{n_chunks} ({n_chunk} vectors) -> {out} "
              f"in {time.time() - t0:.1f}s")
        return

    # --- merge mode: assemble chunk files, no device work ----------------
    if args.mode == "merge":
        from pqt_tpu.models.db import merge_chunk_files
        n_chunks = -(-num // args.chunksize)
        chunk_paths = [f"{stem}.chunk{i}.npz" for i in range(n_chunks)]
        missing = [p for p in chunk_paths if not os.path.exists(p)]
        if missing:
            raise SystemExit(f"missing chunk files: {missing[:3]}"
                             f"{'...' if len(missing) > 3 else ''}")
        spill = args.spill or (stem + ".spill")
        t0 = time.time()
        db = merge_chunk_files(cfg, tree, chunk_paths,
                               keep_vectors=args.keep_vectors,
                               spill_path=spill, to_device=False)
        print(f"merged {n_chunks} chunks / {db.n_vectors} vectors "
              f"in {time.time() - t0:.1f}s")
        print("occupancy:", occupancy_histogram(np.asarray(db.counts)))
        artifacts.save_database(paths["db"], cfg, db, adopt_memmaps=True)
        print(f"saved {paths['tree']} and {paths['db']}")
        return

    # --- database: chunked build (single process) ------------------------
    t0 = time.time()
    builder = ChunkedDBBuilder(cfg, tree, keep_vectors=args.keep_vectors,
                               spill_path=args.spill)
    for off in range(0, num, args.chunksize):
        n_chunk = min(args.chunksize, num - off)
        print(f"encoding chunk @{off} ({n_chunk} vectors)")
        builder.add_chunk(read_dataset(args.dataset, n_chunk, off))
    db = builder.finalize(to_device=not args.spill)
    print(f"built database of {db.n_vectors} vectors "
          f"in {time.time() - t0:.1f}s")
    print("occupancy:", occupancy_histogram(np.asarray(db.counts)))
    artifacts.save_database(paths["db"], cfg, db,
                            adopt_memmaps=bool(args.spill))
    if args.spill:
        import glob
        for p in glob.glob(args.spill + ".chunk*.npz"):
            os.remove(p)            # builder's temp chunk spills
    print(f"saved {paths['tree']} and {paths['db']}")


if __name__ == "__main__":
    main()
