"""End-to-end CLI integration test (VERDICT r3 weak #7).

Generates a tiny clustered `.fvecs` dataset on disk, runs the actual
`tools/create_db.py` main (train + chunked build + artifact dump) and the
actual `tools/query.py` main (load artifacts + batch query + recall
report), and checks the reported recall against brute force — the
reference workflow tool_createdb.cpp:57-148 -> tool_query.cpp:92-166.
"""

import numpy as np
import pytest

from pqt_tpu.io import texmex
from pqt_tpu.tools import create_db, query as query_tool


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(7)
    dim, n = 32, 4096
    centers = rng.normal(0, 1.0, (32, dim)).astype(np.float32)
    base = (centers[rng.integers(0, 32, n)] +
            rng.normal(0, 0.4, (n, dim))).astype(np.float32)
    queries = (centers[rng.integers(0, 32, 64)] +
               rng.normal(0, 0.4, (64, dim))).astype(np.float32)
    # exact ground truth (top-10 ids) as .ivecs, the TexMex convention
    d2 = ((queries ** 2).sum(1)[:, None] + (base ** 2).sum(1)[None, :]
          - 2.0 * queries @ base.T)
    gt = np.argsort(d2, axis=1)[:, :10].astype(np.int32)
    texmex.write_xvecs(str(d / "base.fvecs"), base)
    texmex.write_xvecs(str(d / "query.fvecs"), queries)
    texmex.write_xvecs(str(d / "gt.ivecs"), gt)
    return d, base, queries, gt


def test_create_db_and_query_mains(dataset, capsys):
    d, base, queries, gt = dataset
    common = ["--p", "4", "--c1", "8", "--c2", "4", "--lineparts", "8",
              "--hashsize", str(1 << 14)]
    create_db.main([
        "--dataset", str(d / "base.fvecs"),
        "--basename", str(d / "out"),
        "--chunksize", "1500",        # force several uneven chunks
        "--train-size", "4096", "--kmeans-iters", "8",
        "--keep-vectors"] + common)
    out = capsys.readouterr().out
    assert "built database of 4096 vectors" in out
    assert "saved" in out

    query_tool.main([
        "--basename", str(d / "out"),
        "--queries", str(d / "query.fvecs"),
        "--groundtruth", str(d / "gt.ivecs"),
        "--dim", "32", "--k", "10", "--k1", "4",
        "--maxbins", "256", "--candidates", "1024", "--batch", "64",
        "--exact-rerank"] + common)
    out = capsys.readouterr().out
    assert "queries in" in out and "recall" in out
    # parse the reported R@1 from the printed dict
    import re
    m = re.search(r"'R@1': ([0-9.]+)", out)
    assert m, out
    assert float(m.group(1)) >= 0.9, out


def test_cli_out_of_core_spill_build_and_refine_query(dataset, capsys):
    """--spill: the CLI build streams chunks through disk, finalizes into
    memmaps, and save adopts them as raw sidecars (VERDICT r4 missing #5);
    the loaded database is lazily mapped and serves the refine path."""
    import numpy as np
    from pqt_tpu.io import artifacts
    from pqt_tpu.config import PQTConfig
    d, base, queries, gt = dataset
    common = ["--p", "4", "--c1", "8", "--c2", "4", "--lineparts", "8",
              "--hashsize", str(1 << 14)]
    create_db.main([
        "--dataset", str(d / "base.fvecs"),
        "--basename", str(d / "ooc"),
        "--chunksize", "1500", "--train-size", "4096", "--kmeans-iters",
        "8", "--keep-vectors", "--spill", str(d / "ooc_spill")] + common)
    out = capsys.readouterr().out
    assert "built database of 4096 vectors" in out
    # spilled leaves live as raw sidecars next to the npz, mapped lazily
    cfg = PQTConfig(dim=32, p=4, c1=8, c2=4, line_parts=8,
                    hash_size=1 << 14, k1_build=8, k1_query=8)
    stem = str(d / "ooc") + "_32_4_8_4.db.npz"
    assert (d / "ooc_32_4_8_4.db.npz.payload.bin").exists()
    assert (d / "ooc_32_4_8_4.db.npz.vectors_csr.bin").exists()
    db = artifacts.load_database(stem, cfg)
    assert isinstance(db.payload, np.memmap)
    assert isinstance(db.vectors_csr, np.memmap)
    assert db.vectors is None

    query_tool.main([
        "--basename", str(d / "ooc"),
        "--queries", str(d / "query.fvecs"),
        "--groundtruth", str(d / "gt.ivecs"),
        "--dim", "32", "--k", "10", "--k1", "4",
        "--maxbins", "256", "--candidates", "1024", "--batch", "64",
        "--refine"] + common)
    out = capsys.readouterr().out
    import re
    m = re.search(r"'R@1': ([0-9.]+)", out)
    assert m and float(m.group(1)) >= 0.85, out


def test_cli_worker_encode_merge_and_sharded_query(dataset, capsys):
    """--mode encode (one worker per chunk) + --mode merge (host-only CSR
    assembly) reproduce the full build; --sharded N serves the result from
    a hash-range-sharded mesh (VERDICT r4 missing #5)."""
    d, base, queries, gt = dataset
    common = ["--p", "4", "--c1", "8", "--c2", "4", "--lineparts", "8",
              "--hashsize", str(1 << 14)]
    args = ["--dataset", str(d / "base.fvecs"),
            "--basename", str(d / "wrk"),
            "--chunksize", "1500", "--train-size", "4096",
            "--kmeans-iters", "8", "--keep-vectors"] + common
    for i in range(3):                 # 4096 rows / 1500 -> 3 chunks
        create_db.main(args + ["--mode", "encode", "--chunk-id", str(i)])
    out = capsys.readouterr().out
    assert out.count("encoded chunk") == 3
    create_db.main(args + ["--mode", "merge"])
    out = capsys.readouterr().out
    assert "merged 3 chunks / 4096 vectors" in out

    query_tool.main([
        "--basename", str(d / "wrk"),
        "--queries", str(d / "query.fvecs"),
        "--groundtruth", str(d / "gt.ivecs"),
        "--dim", "32", "--k", "10", "--k1", "4",
        "--maxbins", "256", "--candidates", "1024", "--batch", "64",
        "--exact-rerank", "--sharded", "4"] + common)
    out = capsys.readouterr().out
    import re
    m = re.search(r"'R@1': ([0-9.]+)", out)
    assert m and float(m.group(1)) >= 0.9, out


def test_query_main_second_run_loads_artifacts(dataset, capsys):
    """Re-running create_db must LOAD the tree (load-or-train idiom,
    testPPQT.cpp:283-290) instead of retraining."""
    d, *_ = dataset
    common = ["--p", "4", "--c1", "8", "--c2", "4", "--lineparts", "8",
              "--hashsize", str(1 << 14)]
    create_db.main([
        "--dataset", str(d / "base.fvecs"),
        "--basename", str(d / "out"),
        "--chunksize", "4096", "--train-size", "4096",
        "--kmeans-iters", "8"] + common)
    out = capsys.readouterr().out
    assert "loading tree from" in out


def test_query_refine_sharded_conflict_errors(dataset):
    """--refine with --sharded must fail loudly, not silently serve a
    different mode (r5 review finding)."""
    d, *_ = dataset
    common = ["--p", "4", "--c1", "8", "--c2", "4", "--lineparts", "8",
              "--hashsize", str(1 << 14)]
    with pytest.raises(SystemExit, match="refine"):
        query_tool.main([
            "--basename", str(d / "out"),
            "--queries", str(d / "query.fvecs"),
            "--dim", "32", "--refine", "--sharded", "2"] + common)
