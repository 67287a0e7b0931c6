"""Readers/writers for TexMex ANN datasets and the reference's .umem format.

Formats (reference: convert/filehelper.hpp:8-120, utils/filereader.hpp:7-132,
README.md:41-58):

  * .fvecs / .ivecs / .bvecs: each vector is a little-endian int32 `dim`
    followed by `dim` payload elements (float32 / int32 / uint8).
  * .umem / .imem / .fmem: 20-byte ASCII header "num dim" padded with
    newlines, then the raw payload with no per-vector dim (uint8 / int32 /
    float32).

All readers support chunked access (offset + count) for out-of-core builds,
via numpy memmap — the host-side analog of the reference's
FileReader::data(num, offset).
"""

from __future__ import annotations

import os

import numpy as np

_VEC_DTYPES = {".fvecs": np.float32, ".ivecs": np.int32, ".bvecs": np.uint8}
_MEM_DTYPES = {".umem": np.uint8, ".imem": np.int32, ".fmem": np.float32}

HEADER_BYTES = 20  # utils/filereader.hpp:23-33


def _xvecs_info(path: str):
    ext = os.path.splitext(path)[1]
    dtype = _VEC_DTYPES[ext]
    with open(path, "rb") as f:
        dim = int(np.fromfile(f, np.int32, 1)[0])
    itemsize = np.dtype(dtype).itemsize
    row_bytes = 4 + dim * itemsize
    num = os.path.getsize(path) // row_bytes
    return dtype, dim, num, row_bytes


def read_xvecs(path: str, count: int = -1, offset: int = 0) -> np.ndarray:
    """Read vectors from an .fvecs/.ivecs/.bvecs file.

    Returns (count, dim) array in the file's native dtype.
    """
    dtype, dim, num, row_bytes = _xvecs_info(path)
    if count < 0:
        count = num - offset
    count = min(count, num - offset)
    mm = np.memmap(path, dtype=np.uint8, mode="r",
                   offset=offset * row_bytes, shape=(count * row_bytes,))
    rows = mm.reshape(count, row_bytes)
    payload = np.ascontiguousarray(rows[:, 4:]).view(dtype)
    return payload.reshape(count, dim).copy()


def xvecs_header(path: str):
    """(num, dim) of an xvecs file without reading the payload."""
    _, dim, num, _ = _xvecs_info(path)
    return num, dim


def write_xvecs(path: str, data: np.ndarray):
    """Write (n, dim) array as .fvecs/.ivecs/.bvecs chosen by extension."""
    ext = os.path.splitext(path)[1]
    dtype = _VEC_DTYPES[ext]
    data = np.ascontiguousarray(data, dtype=dtype)
    n, dim = data.shape
    with open(path, "wb") as f:
        dims = np.full((n, 1), dim, np.int32)
        rows = np.concatenate(
            [dims.view(np.uint8).reshape(n, 4),
             data.view(np.uint8).reshape(n, -1)], axis=1)
        rows.tofile(f)


def mem_header(path: str):
    """(num, dim) from a .umem/.imem/.fmem 20-byte ASCII header."""
    with open(path, "rb") as f:
        header = f.read(HEADER_BYTES).decode("ascii", errors="replace")
    parts = header.split()
    return int(parts[0]), int(parts[1])


def read_mem(path: str, count: int = -1, offset: int = 0) -> np.ndarray:
    """Read vectors from a .umem/.imem/.fmem file (chunked)."""
    ext = os.path.splitext(path)[1]
    dtype = _MEM_DTYPES[ext]
    num, dim = mem_header(path)
    if count < 0:
        count = num - offset
    count = min(count, num - offset)
    itemsize = np.dtype(dtype).itemsize
    mm = np.memmap(path, dtype=dtype, mode="r",
                   offset=HEADER_BYTES + offset * dim * itemsize,
                   shape=(count, dim))
    return np.array(mm)


def write_mem(path: str, data: np.ndarray):
    """Write (n, dim) array as .umem/.imem/.fmem chosen by extension.

    Header layout matches utils/filereader.hpp: ASCII "num dim" padded to 20
    bytes with newlines.
    """
    ext = os.path.splitext(path)[1]
    dtype = _MEM_DTYPES[ext]
    data = np.ascontiguousarray(data, dtype=dtype)
    n, dim = data.shape
    header = f"{n} {dim}".encode("ascii")
    header = header + b"\n" * (HEADER_BYTES - len(header))
    with open(path, "wb") as f:
        f.write(header)
        data.tofile(f)


def convert_xvecs_to_mem(src: str, dst: str, chunk: int = 1_000_000):
    """Streaming .fvecs/.bvecs/.ivecs -> .fmem/.umem/.imem conversion.

    Equivalent of the convert_* CLI tools (convert/convert_fvecs.cpp:19-95).
    """
    num, dim = xvecs_header(src)
    ext = os.path.splitext(dst)[1]
    dtype = _MEM_DTYPES[ext]
    header = f"{num} {dim}".encode("ascii")
    header = header + b"\n" * (HEADER_BYTES - len(header))
    with open(dst, "wb") as f:
        f.write(header)
        for off in range(0, num, chunk):
            block = read_xvecs(src, min(chunk, num - off), off)
            np.ascontiguousarray(block, dtype=dtype).tofile(f)
    return num, dim
