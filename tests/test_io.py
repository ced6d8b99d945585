import numpy as np
import pytest

from mysteryann_tpu.io import (
    read_fbin,
    read_ibin,
    write_fbin,
    write_ibin,
    read_meta,
    read_gt_with_dist,
    write_gt_with_dist,
    read_knn_ibin,
    write_knn_ibin,
    make_cross_modal,
)


def test_fbin_roundtrip(tmp_path, rng):
    x = rng.standard_normal((100, 33)).astype(np.float32)
    p = str(tmp_path / "x.fbin")
    write_fbin(p, x)
    assert read_meta(p) == (100, 33)
    np.testing.assert_array_equal(read_fbin(p), x)
    np.testing.assert_array_equal(read_fbin(p, mmap=False), x)


def test_ibin_roundtrip(tmp_path, rng):
    x = rng.integers(0, 1 << 31, size=(17, 8)).astype(np.uint32)
    p = str(tmp_path / "x.ibin")
    write_ibin(p, x)
    np.testing.assert_array_equal(read_ibin(p), x)


def test_size_validation(tmp_path, rng):
    p = str(tmp_path / "bad.fbin")
    write_fbin(p, rng.standard_normal((10, 4)).astype(np.float32))
    with open(p, "ab") as f:
        f.write(b"\x00" * 4)  # corrupt: extra bytes
    with pytest.raises(ValueError, match="bytes"):
        read_meta(p)


def test_gt_roundtrip(tmp_path, rng):
    ids = rng.integers(0, 1000, size=(20, 10)).astype(np.uint32)
    dists = rng.standard_normal((20, 10)).astype(np.float32)
    p = str(tmp_path / "gt.bin")
    write_gt_with_dist(p, ids, dists)
    i2, d2 = read_gt_with_dist(p)
    np.testing.assert_array_equal(i2, ids)
    np.testing.assert_array_equal(d2, dists)


def test_knn_ibin_k_check(tmp_path, rng):
    knn = rng.integers(0, 100, size=(5, 8)).astype(np.uint32)
    p = str(tmp_path / "knn.ibin")
    write_knn_ibin(p, knn)
    np.testing.assert_array_equal(read_knn_ibin(p, expected_k=8), knn)
    with pytest.raises(ValueError, match="M_sq"):
        read_knn_ibin(p, expected_k=9)


def test_synthetic_shapes_and_ood():
    base, q = make_cross_modal(1000, 200, 64, metric="ip", seed=7)
    assert base.shape == (1000, 64) and q.shape == (200, 64)
    assert base.dtype == np.float32
    # ip/cosine variants are unit norm
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)
    # OOD: query centroid is measurably displaced from base centroid
    gap = np.linalg.norm(base.mean(0) - q.mean(0))
    assert gap > 0.05


def test_synthetic_query_seed_same_world():
    # query_seed: independent query draws from the SAME world (the
    # held-out-eval mechanism). Same base, different queries, and the
    # new queries still live on the base manifold — unlike queries from
    # a different seed, which are a different world entirely.
    b1, q1 = make_cross_modal(3000, 200, 32, metric="ip", seed=7)
    b2, q2 = make_cross_modal(3000, 200, 32, metric="ip", seed=7,
                              query_seed=8)
    np.testing.assert_array_equal(b1, b2)
    assert not np.array_equal(q1, q2)
    q_other = make_cross_modal(10, 200, 32, metric="ip", seed=8)[1]
    top1 = lambda q: float(np.mean((q @ b1.T).max(axis=1)))
    assert top1(q2) > top1(q_other) + 0.05
    # and default (no query_seed) stays byte-stable
    b3, q3 = make_cross_modal(3000, 200, 32, metric="ip", seed=7)
    np.testing.assert_array_equal(q1, q3)


def test_nsg_import(tmp_path, rng):
    import struct
    from mysteryann_tpu.graph import load_nsg_graph
    # NSG layout: [width][ep] + per node [deg][ids...]
    p = str(tmp_path / "g.nsg")
    lists = [[1, 2], [0], [0, 1, 3], [2]]
    with open(p, "wb") as f:
        f.write(struct.pack("<II", 3, 2))
        for l in lists:
            f.write(struct.pack("<I", len(l)))
            np.asarray(l, np.uint32).tofile(f)
    g = load_nsg_graph(p)
    assert g.ep == 2 and g.n_nodes == 4
    from mysteryann_tpu.graph.adjacency import to_lists
    assert to_lists(g) == lists
    with pytest.raises(ValueError, match="expected"):
        load_nsg_graph(p, n_nodes=7)


def test_data_align():
    import numpy as np
    from mysteryann_tpu.io.formats import data_align

    x = np.random.default_rng(0).normal(size=(10, 200)).astype(np.float32)
    y = data_align(x)
    assert y.shape == (10, 256)
    np.testing.assert_array_equal(y[:, :200], x)
    assert np.all(y[:, 200:] == 0)
    # IP preserved
    np.testing.assert_allclose(y @ y.T, x @ x.T, rtol=1e-5)
    z = data_align(x, multiple=8)
    assert z.shape == (10, 200)


def test_index_registry():
    from mysteryann_tpu.index import index_kinds, get_index_cls
    import pytest

    assert set(index_kinds()) == {"flat", "ivf", "roargraph", "bipartite"}
    assert get_index_cls("flat").index_kind == "flat"
    with pytest.raises(ValueError):
        get_index_cls("nope")


def test_projection_loader_python_fallback_chunked(tmp_path):
    # the python fallback walks row starts through fixed-size tolist()
    # chunks (a whole-payload tolist() is ~28 B/word); cross the 4M-word
    # chunk boundary to exercise the refill path
    import struct
    import warnings
    import mysteryann_tpu.native as native
    from mysteryann_tpu.graph.roargraph import load_projection_graph

    rng = np.random.default_rng(3)
    n = 400_000
    degs = rng.integers(5, 16, n).astype(np.int64)  # ~4.6M words total
    words = np.empty(int(n + degs.sum()), np.uint32)
    off, rows = 0, []
    for i in range(n):
        d = int(degs[i])
        words[off] = d
        ids = rng.integers(0, n, d).astype(np.uint32)
        words[off + 1: off + 1 + d] = ids
        rows.append(ids)
        off += 1 + d
    assert off == words.size and off > (1 << 22)  # crosses a chunk
    p = str(tmp_path / "g.index")
    with open(p, "wb") as f:
        f.write(struct.pack("<II", 7, n))
        words.tofile(f)
    lib0 = native.lib
    native.lib = lambda: None
    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            g = load_projection_graph(p)
    finally:
        native.lib = lib0
    assert g.ep == 7 and g.neighbors.shape[0] == n
    nb = np.asarray(g.neighbors)
    for i in (0, 12345, n - 1):
        got = nb[i][nb[i] < n]
        np.testing.assert_array_equal(got, rows[i].astype(np.int32))
