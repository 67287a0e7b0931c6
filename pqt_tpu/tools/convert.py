"""CLI: convert TexMex .fvecs/.bvecs/.ivecs datasets to .fmem/.umem/.imem.

Equivalent of the reference's convert_* tools (convert/convert_fvecs.cpp etc.,
README.md:54-58), streaming so billion-scale files convert in bounded memory.

Usage:
  python -m pqt_tpu.tools.convert --src sift_base.bvecs --dst sift_base.umem
"""

from __future__ import annotations

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src", required=True, help="input .fvecs/.bvecs/.ivecs")
    ap.add_argument("--dst", required=True, help="output .fmem/.umem/.imem")
    ap.add_argument("--chunk", type=int, default=1_000_000)
    ap.add_argument("--verify", action="store_true",
                    help="re-read both files and compare (convert tools' "
                         "round-trip check)")
    args = ap.parse_args(argv)

    from pqt_tpu.io import texmex

    num, dim = texmex.convert_xvecs_to_mem(args.src, args.dst, args.chunk)
    print(f"converted {num} vectors of dim {dim} -> {args.dst}")

    if args.verify:
        import numpy as np
        a = texmex.read_xvecs(args.src, min(num, 10000))
        b = texmex.read_mem(args.dst, min(num, 10000))
        assert np.array_equal(np.asarray(a, b.dtype), b), "round-trip mismatch"
        print("verified OK")


if __name__ == "__main__":
    main()
