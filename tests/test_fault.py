"""Negative-path serving/build hygiene tests (VERDICT r4 weak #8).

The reference's failure story is checkCudaErrors + exit(1) (SURVEY §5.3);
the multi-host runtime here is NEW surface, so dead-peer hangs and
malformed build artifacts must fail typed and actionable, not hang or
KeyError.
"""

import time

import numpy as np
import pytest

from pqt_tpu.parallel.distributed import (PeerTimeoutError,
                                          run_with_peer_timeout)


def test_peer_timeout_raises_typed_error():
    with pytest.raises(PeerTimeoutError, match="did not complete"):
        run_with_peer_timeout(lambda: time.sleep(30), timeout_s=0.2,
                              what="test collective")


def test_peer_timeout_propagates_inner_error():
    def boom():
        raise ValueError("inner")
    with pytest.raises(ValueError, match="inner"):
        run_with_peer_timeout(boom, timeout_s=5)


def test_peer_timeout_returns_value():
    assert run_with_peer_timeout(lambda: 42, timeout_s=5) == 42


def test_merge_vectorless_chunks_typed_error(tmp_path):
    """merge_chunk_files(keep_vectors=True) over chunks encoded without
    vectors: a ChunkFormatError naming the chunk and the fix, not a bare
    KeyError (VERDICT r4 weak #6)."""
    from pqt_tpu.config import PQTConfig
    from pqt_tpu.models.db import (ChunkFormatError, merge_chunk_files,
                                   merge_chunk_files_range, payload_width)
    cfg = PQTConfig(dim=32, p=4, c1=8, c2=4, line_parts=8,
                    hash_size=1 << 12, k1_build=4, k1_query=4)
    p = str(tmp_path / "c0.npz")
    np.savez(p, bins=np.zeros(4, np.int32),
             packed=np.zeros((4, payload_width(cfg)), np.int32))
    with pytest.raises(ChunkFormatError, match="keep_vectors"):
        merge_chunk_files(cfg, None, [p], keep_vectors=True,
                          spill_path=str(tmp_path / "s"))
    with pytest.raises(ChunkFormatError, match="keep_vectors"):
        merge_chunk_files_range(cfg, [p], 0, cfg.hash_size,
                                keep_vectors=True)
