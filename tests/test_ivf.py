"""IVF index: recall vs nprobe, structure, metrics."""

import numpy as np
import pytest

from mysteryann_tpu.ivf import IVFIndex
from mysteryann_tpu.io import make_cross_modal
from mysteryann_tpu.ops import exact_knn
from mysteryann_tpu.utils.metrics import compute_recall


@pytest.fixture(scope="module")
def world():
    base, q = make_cross_modal(20000, 500, 32, metric="ip", seed=71)
    _, gt = exact_knn(q, base, k=10, metric="ip", precision="highest")
    return base, q, gt


def test_ivf_recall_grows_with_nprobe(world):
    base, q, gt = world
    idx = IVFIndex(base, metric="ip", n_clusters=128, kmeans_iters=5)
    recalls = []
    for p in (2, 8, 32):
        ids, dists = idx.search(q, k=10, nprobe=p, query_batch=500)
        recalls.append(compute_recall(ids, gt, 10))
    assert recalls[0] <= recalls[1] <= recalls[2] + 1e-9
    assert recalls[-1] > 0.95, f"recalls {recalls}"
    assert np.all(np.diff(dists, axis=1) >= -1e-5)


def test_ivf_every_point_stored_once(world):
    base, _, _ = world
    idx = IVFIndex(base, metric="ip", n_clusters=64, kmeans_iters=3)
    ids = np.asarray(idx.block_ids)
    stored = ids[ids < idx.n_base]
    assert stored.size == idx.n_base
    assert np.unique(stored).size == idx.n_base


def test_ivf_l2(world):
    base, q, _ = world
    _, gt = exact_knn(q, base, k=10, metric="l2", precision="highest")
    idx = IVFIndex(base, metric="l2", n_clusters=128, kmeans_iters=5)
    ids, _ = idx.search(q, k=10, nprobe=32, query_batch=500)
    assert compute_recall(ids, gt, 10) > 0.93


def test_ivf_benchmark_schema(world):
    base, q, _ = world
    idx = IVFIndex(base, metric="ip", n_clusters=64, kmeans_iters=2)
    r = idx.benchmark(q, k=5, nprobe=4, query_batch=250)
    assert r["qps"] > 0 and r["nprobe"] == 4
    assert r["ids"].shape == (500, 5)

def test_ivf_grouped_matches_ungrouped(world):
    # the on-device qmap/merge path must rank identically to the
    # per-query probe path (same clusters scanned, exact f32 distances)
    base, q, _ = world
    idx = IVFIndex(base, metric="ip", n_clusters=64, kmeans_iters=3)
    ids_g, d_g = idx.search(q, k=10, nprobe=8, query_batch=500)
    ids_u, d_u = idx.search(q, k=10, nprobe=8, query_batch=500,
                            grouped=False)
    # allow distance ties to permute ids; the distance curves must match
    np.testing.assert_allclose(d_g, d_u, rtol=1e-5, atol=1e-5)
    assert (ids_g == ids_u).mean() > 0.99


def test_ivf_int8_recall_and_rerank(world):
    base, q, gt = world
    idx8 = IVFIndex(base, metric="ip", n_clusters=128, kmeans_iters=5,
                    store="int8", keep_f32=True)
    ids, dists = idx8.search(q, k=10, nprobe=32, query_batch=500)
    r8 = compute_recall(ids, gt, 10)
    assert r8 > 0.90, f"int8 recall {r8}"
    # approximate distances are in f32 units (close to true IP)
    idx = IVFIndex(base, metric="ip", n_clusters=128, kmeans_iters=5)
    _, d_f = idx.search(q, k=10, nprobe=32, query_batch=500)
    assert np.median(np.abs(dists[:, 0] - d_f[:, 0])
                     / np.abs(d_f[:, 0])) < 0.05
    # exact-f32 rerank over a widened candidate list recovers recall
    ids_r, d_r = idx8.search(q, k=10, nprobe=32, query_batch=500,
                             rerank=40)
    rr = compute_recall(ids_r, gt, 10)
    assert rr >= r8 and rr > 0.95, f"rerank recall {rr} (int8 {r8})"
    assert np.all(np.diff(d_r, axis=1) >= -1e-5)


def test_ivf_from_parts_roundtrip(world):
    base, q, _ = world
    idx = IVFIndex(base, metric="ip", n_clusters=64, kmeans_iters=3,
                   store="int8")
    idx2 = IVFIndex.from_parts(idx.centroids, idx.blocks, idx.block_ids,
                               n_base=idx.n_base, metric="ip",
                               gscale=idx.gscale)
    assert idx2.store == "int8" and idx2.cap == idx.cap
    ids_a, d_a = idx.search(q, k=10, nprobe=8, query_batch=500)
    ids_b, d_b = idx2.search(q, k=10, nprobe=8, query_batch=500)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6)


@pytest.mark.parametrize("store", ["f32", "int8"])
def test_ivf_save_load_roundtrip(world, store, tmp_path):
    base, q, _ = world
    idx = IVFIndex(base, metric="ip", n_clusters=64, kmeans_iters=3,
                   store=store, keep_f32=(store == "int8"))
    path = str(tmp_path / "ivf.npz")
    idx.save(path)
    idx2 = IVFIndex.load(path)
    assert idx2.store == store and idx2.cap == idx.cap
    assert idx2.n_clusters == idx.n_clusters and idx2.n_base == idx.n_base
    ids_a, d_a = idx.search(q, k=10, nprobe=8, query_batch=500)
    ids_b, d_b = idx2.search(q, k=10, nprobe=8, query_batch=500)
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(d_a, d_b, rtol=1e-6)
    if store == "int8":
        # rerank rows are not persisted; reattaching the corpus restores it
        with pytest.raises(ValueError):
            idx2.search(q, k=10, nprobe=8, query_batch=500, rerank=40)
        idx3 = IVFIndex.load(path, base=base)
        ids_c, d_c = idx3.search(q, k=10, nprobe=8, query_batch=500,
                                 rerank=40)
        ids_r, d_r = idx.search(q, k=10, nprobe=8, query_batch=500,
                                rerank=40)
        np.testing.assert_array_equal(ids_c, ids_r)
        np.testing.assert_allclose(d_c, d_r, rtol=1e-6)


def test_ivf_streaming_build(world):
    # streamed int8 build from a device tile function: every id stored
    # once, recall comparable to the in-memory int8 build
    import jax.numpy as jnp
    from mysteryann_tpu.ivf import build_ivf_streaming
    base, q, gt = world
    base_dev = jnp.asarray(base)

    def tile_fn(start, size):
        import jax
        return jax.lax.dynamic_slice_in_dim(base_dev, start, size, 0)

    idx = build_ivf_streaming(tile_fn, base.shape[0], base.shape[1],
                              metric="ip", n_clusters=128,
                              kmeans_iters=5, kmeans_sample=base.shape[0],
                              tile=4096)
    ids = np.asarray(idx.block_ids)
    stored = ids[ids < idx.n_base]
    assert stored.size == idx.n_base
    assert np.unique(stored).size == idx.n_base
    out, _ = idx.search(q, k=10, nprobe=32, query_batch=500)
    r = compute_recall(out, gt, 10)
    assert r > 0.90, f"streamed int8 recall {r}"

    # the destination-ordered stripe fill (rows_fn path, the >HBM/2
    # regime's layout) must place exactly the same bytes
    idx2 = build_ivf_streaming(tile_fn, base.shape[0], base.shape[1],
                               metric="ip", n_clusters=128,
                               kmeans_iters=5, kmeans_sample=base.shape[0],
                               tile=4096,
                               rows_fn=lambda i: jnp.take(base_dev, i,
                                                          axis=0))
    np.testing.assert_array_equal(np.asarray(idx.block_ids),
                                  np.asarray(idx2.block_ids))
    occ = ids < idx.n_base  # sentinel slots differ by design (zeros
    np.testing.assert_array_equal(  # vs clamped filler rows) — masked
        np.asarray(idx.blocks)[occ], np.asarray(idx2.blocks)[occ])


def test_ivf_streaming_cosine_matches_in_memory(world):
    # streamed cosine must normalize rows at the stream boundary — the
    # twin of IVFIndex.__init__'s prepare_vectors(base). Scale rows by
    # wildly varying norms: true cosine ranking is norm-invariant, so
    # the streamed index must agree with the in-memory cosine build.
    import jax.numpy as jnp
    from mysteryann_tpu.ivf import build_ivf_streaming
    base, q, _ = world
    rng = np.random.default_rng(5)
    scaled = base * np.exp(rng.normal(0, 2, (base.shape[0], 1))).astype(
        np.float32)
    mem = IVFIndex(scaled, metric="cosine", n_clusters=128, kmeans_iters=5,
                   store="int8")
    scaled_dev = jnp.asarray(scaled)

    def tile_fn(start, size):
        import jax
        return jax.lax.dynamic_slice_in_dim(scaled_dev, start, size, 0)

    st = build_ivf_streaming(tile_fn, scaled.shape[0], scaled.shape[1],
                             metric="cosine", n_clusters=128,
                             kmeans_iters=5, kmeans_sample=scaled.shape[0],
                             tile=4096)
    _, gt_cos = exact_knn(q, scaled, k=10, metric="cosine",
                          precision="highest")
    ids_m, _ = mem.search(q, k=10, nprobe=32, query_batch=500)
    ids_s, _ = st.search(q, k=10, nprobe=32, query_batch=500)
    rm = compute_recall(ids_m, gt_cos, 10)
    rs = compute_recall(ids_s, gt_cos, 10)
    assert rs > 0.85, f"streamed cosine recall {rs}"
    assert abs(rm - rs) < 0.03, (rm, rs)


def test_ivf_streaming_assign_cache_keyed_on_params(world, tmp_path):
    # the assignment cache must miss when cap_factor changes — a stale
    # hit silently reuses the old placement
    import jax.numpy as jnp
    import os
    from mysteryann_tpu.ivf import build_ivf_streaming
    base, _, _ = world
    base_dev = jnp.asarray(base)

    def tile_fn(start, size):
        import jax
        return jax.lax.dynamic_slice_in_dim(base_dev, start, size, 0)

    kw = dict(metric="ip", n_clusters=64, kmeans_iters=2,
              kmeans_sample=8192, tile=4096,
              assign_cache=str(tmp_path / "c"))
    i1 = build_ivf_streaming(tile_fn, base.shape[0], base.shape[1],
                             cap_factor=1.2, **kw)
    i2 = build_ivf_streaming(tile_fn, base.shape[0], base.shape[1],
                             cap_factor=2.5, **kw)
    assert len(list(tmp_path.iterdir())) == 2  # two distinct cache files
    assert i2.cap > i1.cap  # the larger cap_factor actually took effect
