"""ctypes bindings for the native host runtime (pqt_tpu/cpp/pqt_host.cpp).

Compiled on first use with g++ (cached next to the source); every entry
point has a NumPy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cpp")
_SRC = os.path.join(_CPP_DIR, "pqt_host.cpp")
_SO = os.path.join(_CPP_DIR, "libpqt_host.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.pqt_build_csr.restype = ctypes.c_int
        lib.pqt_build_csr.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.pqt_gather_rows.restype = None
        lib.pqt_gather_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        lib.pqt_strip_xvecs.restype = ctypes.c_int
        lib.pqt_strip_xvecs.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        lib.pqt_u8_to_f32.restype = None
        lib.pqt_u8_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.pqt_place_positions.restype = None
        lib.pqt_place_positions.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.pqt_scatter_rows.restype = None
        lib.pqt_scatter_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p]
        lib.pqt_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def build_csr(bin_ids: np.ndarray, hash_size: int):
    """(counts, prefix, order) via native stable counting sort; NumPy
    fallback uses bincount + argsort."""
    bin_ids = np.ascontiguousarray(bin_ids, np.int32)
    n = bin_ids.shape[0]
    lib = get_lib()
    if lib is not None:
        counts = np.empty(hash_size, np.int32)
        prefix = np.empty(hash_size, np.int32)
        order = np.empty(n, np.int32)
        rc = lib.pqt_build_csr(_ptr(bin_ids), n, hash_size, _ptr(counts),
                               _ptr(prefix), _ptr(order))
        if rc == 0:
            return counts, prefix, order
        raise ValueError("bin id out of range for hash table")
    if bin_ids.size and (bin_ids.min() < 0 or bin_ids.max() >= hash_size):
        raise ValueError("bin id out of range for hash table")
    counts = np.bincount(bin_ids, minlength=hash_size).astype(np.int32)
    prefix = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    order = np.argsort(bin_ids, kind="stable").astype(np.int32)
    return counts, prefix, order


def gather_rows(src: np.ndarray, order: np.ndarray) -> np.ndarray:
    """out[i] = src[order[i]], multithreaded."""
    src = np.ascontiguousarray(src)
    order = np.ascontiguousarray(order, np.int32)
    lib = get_lib()
    if lib is None:
        return src[order]
    out = np.empty((order.shape[0],) + src.shape[1:], src.dtype)
    row_bytes = src.strides[0] if src.ndim > 1 else src.itemsize
    lib.pqt_gather_rows(_ptr(src), _ptr(order), order.shape[0],
                        int(row_bytes), _ptr(out))
    return out


def place_positions(bins: np.ndarray, cursor: np.ndarray) -> np.ndarray:
    """CSR positions for one merge chunk: pos[i] = cursor[bins[i]]++.

    `cursor` (int64, per local bin) is advanced IN PLACE; placement is in
    input order, so within-bin order is stable — identical output to the
    NumPy argsort formulation, in one linear pass (the streaming-merge hot
    loop, test1B.cpp:804-898 analog).
    """
    bins = np.ascontiguousarray(bins, np.int32)
    assert cursor.dtype == np.int64 and cursor.flags.c_contiguous
    if bins.shape[0] == 0:
        # a chunk may contribute zero rows to this hash range (common in
        # merge_chunk_files_range); the fallback's run-length math would
        # index an empty array
        return np.empty(0, np.int64)
    lib = get_lib()
    if lib is not None:
        pos = np.empty(bins.shape[0], np.int64)
        lib.pqt_place_positions(_ptr(bins), bins.shape[0], _ptr(cursor),
                                _ptr(pos))
        return pos
    order = np.argsort(bins, kind="stable")
    sb = bins[order]
    starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
    run_id = np.cumsum(np.r_[False, sb[1:] != sb[:-1]])
    within = np.arange(sb.shape[0], dtype=np.int64) - starts[run_id]
    pos = np.empty(bins.shape[0], np.int64)
    pos[order] = cursor[sb] + within
    np.add.at(cursor, sb[starts], np.diff(np.r_[starts, sb.shape[0]]))
    return pos


def scatter_rows(src: np.ndarray, pos: np.ndarray, dst: np.ndarray) -> None:
    """dst[pos[i]] = src[i], multithreaded (positions are unique)."""
    src = np.ascontiguousarray(src)
    pos = np.ascontiguousarray(pos, np.int64)
    lib = get_lib()
    if lib is None or not dst.flags.c_contiguous or \
            dst.strides[0] != src.strides[0]:
        dst[pos] = src
        return
    row_bytes = src.strides[0] if src.ndim > 1 else src.itemsize
    lib.pqt_scatter_rows(_ptr(src), _ptr(pos), src.shape[0],
                         int(row_bytes), dst.ctypes.data_as(ctypes.c_void_p))


def strip_xvecs(raw: np.ndarray, n: int, dim: int, dtype) -> np.ndarray:
    """Strip per-row dim headers from raw xvecs bytes -> (n, dim) array."""
    raw = np.ascontiguousarray(raw, np.uint8)
    elem = np.dtype(dtype).itemsize
    lib = get_lib()
    if lib is None:
        rows = raw.reshape(n, 4 + dim * elem)
        return np.ascontiguousarray(rows[:, 4:]).view(dtype).reshape(n, dim)
    out = np.empty(n * dim * elem, np.uint8)
    rc = lib.pqt_strip_xvecs(_ptr(raw), n, dim, elem, _ptr(out))
    if rc != 0:
        raise ValueError("xvecs row with mismatched dimension")
    return out.view(dtype).reshape(n, dim)


def u8_to_f32(src: np.ndarray) -> np.ndarray:
    src = np.ascontiguousarray(src, np.uint8)
    lib = get_lib()
    if lib is None:
        return src.astype(np.float32)
    out = np.empty(src.shape, np.float32)
    lib.pqt_u8_to_f32(_ptr(src), src.size, _ptr(out))
    return out
