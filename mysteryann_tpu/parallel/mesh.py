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


def make_mesh(dp: int = 1, mp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if dp * mp > len(devices):
        raise ValueError(f"mesh {dp}x{mp} needs {dp * mp} devices, "
                         f"have {len(devices)}")
    dev = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(dev, axis_names=("dp", "mp"))


def shard_base(mesh: Mesh, x, axis: str = "mp"):
    """Shard a [N, ...] array's leading dim across the given mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))
