"""Native C++ persistence: byte-identical files + roundtrip vs Python path."""

import struct

import numpy as np
import pytest

from mysteryann_tpu import native
from mysteryann_tpu.graph.adjacency import PaddedGraph
from mysteryann_tpu.graph.roargraph import (
    load_projection_graph,
    save_projection_graph,
)


@pytest.fixture(scope="module")
def glib():
    L = native.lib()
    if L is None:
        pytest.skip("native toolchain unavailable")
    return L


def _random_graph(rng, n=500, m=9):
    nb = np.full((n, m), n, np.int32)
    for i in range(n):
        deg = rng.integers(0, m + 1)
        nb[i, :deg] = rng.choice(n, size=deg, replace=False)
    return PaddedGraph(neighbors=nb, ep=7)


def test_native_save_matches_python(glib, rng, tmp_path):
    g = _random_graph(rng)
    p_native = str(tmp_path / "native.idx")
    save_projection_graph(p_native, g)  # uses native lib

    # hand-rolled python writer (the fallback path's format)
    p_py = str(tmp_path / "py.idx")
    n = g.n_nodes
    with open(p_py, "wb") as f:
        f.write(struct.pack("<II", g.ep, n))
        for i in range(n):
            row = g.neighbors[i][g.neighbors[i] < n].astype(np.uint32)
            f.write(struct.pack("<I", row.size))
            row.tofile(f)
    assert open(p_native, "rb").read() == open(p_py, "rb").read()


def test_native_roundtrip(glib, rng, tmp_path):
    g = _random_graph(rng, n=800, m=5)
    p = str(tmp_path / "g.idx")
    save_projection_graph(p, g)
    g2 = load_projection_graph(p)
    assert g2.ep == g.ep
    n = g.n_nodes
    for i in range(n):
        a = [x for x in g.neighbors[i] if x < n]
        b = [x for x in g2.neighbors[i] if x < n]
        assert a == b


def test_native_trailing_bytes_rejected(glib, rng, tmp_path):
    g = _random_graph(rng, n=50, m=4)
    p = str(tmp_path / "bad.idx")
    save_projection_graph(p, g)
    with open(p, "ab") as f:
        f.write(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="trailing"):
        load_projection_graph(p)


def test_read_header(glib, tmp_path, rng):
    import ctypes
    from mysteryann_tpu.io import write_fbin
    x = rng.standard_normal((12, 7)).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    write_fbin(p, x)
    n = ctypes.c_uint32()
    d = ctypes.c_uint32()
    assert glib.msann_read_header(p.encode(), ctypes.byref(n),
                                  ctypes.byref(d)) == 0
    assert (n.value, d.value) == (12, 7)
