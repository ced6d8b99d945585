"""Streaming fbin reader — native double-buffered prefetch pipeline.

The reference loads whole corpora into RAM up front (reference
include/efanna2e/util.h:180-211). At 10M-100M scale the right shape is
a pipeline: a C++ reader thread prefetches the next disk chunk while
the current one is staged to the device. Python fallback (sequential
reads) when the native toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
from typing import Iterator, Tuple

import numpy as np

from mysteryann_tpu import native
from mysteryann_tpu.io.formats import read_meta


def stream_fbin(path: str, chunk_rows: int = 262144,
                dtype=np.float32) -> Iterator[Tuple[int, np.ndarray]]:
    """Yield (start_row, chunk [rows<=chunk_rows, d]) over an fbin/ibin
    file. Disk IO for chunk i+1 overlaps consumption of chunk i."""
    elt = np.dtype(dtype).itemsize
    if elt == 4:
        # header-vs-file-size validation runs on BOTH paths (the native
        # opener only reads the 8-byte header, so a file with trailing
        # bytes would stream fine natively but fail the python fallback)
        read_meta(path)
    L = native.lib()
    if L is None:
        n, d = read_meta(path)
        with open(path, "rb") as f:
            f.seek(8)
            row = 0
            while row < n:
                rows = min(chunk_rows, n - row)
                buf = np.fromfile(f, dtype=dtype, count=rows * d)
                yield row, buf.reshape(rows, d)
                row += rows
        return

    h = L.msann_stream_open(path.encode(), chunk_rows, elt)
    if not h:
        raise OSError(f"cannot open {path}")
    try:
        n32, d32 = ctypes.c_uint32(), ctypes.c_uint32()
        L.msann_stream_meta(h, ctypes.byref(n32), ctypes.byref(d32))
        n, d = n32.value, d32.value
        out = np.empty((chunk_rows, d), dtype)
        row = 0
        while True:
            got = L.msann_stream_next(h, out.ctypes.data_as(ctypes.c_void_p))
            if got < 0:
                raise OSError(f"short read in {path} at row {row}")
            if got == 0:
                break
            yield row, out[:got].copy()
            row += got
        if row != n:
            raise OSError(f"{path}: read {row} rows, header says {n}")
    finally:
        L.msann_stream_close(h)


def load_fbin_to_device(path: str, chunk_rows: int = 262144,
                        dtype=np.float32):
    """Stream an fbin corpus straight into one device buffer.

    Disk prefetch (native thread) overlaps the host->device transfers;
    peak host memory is two chunks instead of the whole corpus.
    """
    import jax
    import jax.numpy as jnp

    n, d = read_meta(path)
    fill = jax.jit(
        lambda b, c, s: jax.lax.dynamic_update_slice_in_dim(b, c, s, 0),
        donate_argnums=(0,))
    buf = jnp.zeros((n, d), dtype)
    for row, chunk in stream_fbin(path, chunk_rows, dtype):
        buf = fill(buf, jnp.asarray(chunk), jnp.int32(row))
    return buf
