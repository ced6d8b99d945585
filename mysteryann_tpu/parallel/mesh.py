"""Device mesh helpers.

The reference's only parallelism is OpenMP threads over one shared memory
(SURVEY §2: omp parallel for + per-node std::mutex). The TPU-native scaling
axes are:

- ``dp`` (data parallel): independent queries/build-nodes sharded across
  devices — the analogue of the reference's query fan-out
  (tests/test_search_roargraph.cpp:203-209);
- ``mp`` (model parallel): the base-vector table + adjacency tensor sharded
  across device HBM — the analogue RoarGraph *doesn't have* (single-node
  DRAM); required for T2I-100M-class corpora.

Collectives ride ICI: cross-shard candidate exchange is psum/all_gather
inside shard_map.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 1, mp: int = 1, devices=None,
              allow_split_mp: bool = False) -> Mesh:
    """dp x mp mesh with ``mp`` packed along consecutive devices.

    Consecutive devices share a host (JAX orders `jax.devices()` by
    process), so filling ``mp`` first keeps the per-hop psums (neighbor
    rows + partial distances) on ICI and lets ``dp`` — which never
    communicates during a search — span hosts over DCN (see
    docs/ARCHITECTURE.md "Multi-host meshes"). An ``mp`` axis that would
    straddle hosts turns every expansion into a DCN round trip; that is
    refused unless ``allow_split_mp=True`` (>400M-corpus territory).
    """
    devices = devices if devices is not None else jax.devices()
    if dp * mp > len(devices):
        raise ValueError(f"mesh {dp}x{mp} needs {dp * mp} devices, "
                         f"have {len(devices)}")
    use = devices[: dp * mp]
    n_proc = len({d.process_index for d in use})
    if n_proc > 1 and not allow_split_mp:
        per_host = len(use) // n_proc
        if mp > per_host or per_host % mp:
            raise ValueError(
                f"mp={mp} would straddle hosts ({per_host} devices/host): "
                "per-hop psums would ride DCN. Lay mp within a host, or "
                "pass allow_split_mp=True if the corpus truly exceeds "
                "one host's HBM.")
    dev = np.asarray(use).reshape(dp, mp)
    return Mesh(dev, axis_names=("dp", "mp"))


def shard_base(mesh: Mesh, x, axis: str = "mp"):
    """Shard a [N, ...] array's leading dim across the given mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
