"""mysteryann_tpu — a TPU-native cross-modal approximate nearest neighbor framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
RoarGraph codebase (matchyc/mysteryann): building projected-bipartite-graph
indices from cross-modal data and serving high-recall top-k search.

Where the reference (C++/OpenMP/AVX-512, /root/reference) is single-node
pointer-chasing with per-node mutexes and one-query-at-a-time best-first
traversal, this framework is dense / batched / fixed-shape:

- distances are tiled MXU matmuls (`mysteryann_tpu.ops.distances`),
- exact kNN is a sharded matmul + running top-k merge (`ops.knn`),
- the graph is a padded ``int32 [N, M]`` adjacency tensor in HBM
  (`graph.adjacency`),
- search is batched lockstep beam search with bitmask visited sets
  (`search.beam`),
- index construction (projection, occlusion pruning, reverse edges,
  connectivity enhancement) is batched prune scans + segmented scatter
  passes (`graph.roargraph`),
- multi-chip scaling is `jax.sharding` over a device mesh (`parallel`).
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even on hosts whose sitecustomize force-registers a
# device plugin that overrides the env var (observed on the axon rig:
# JAX_PLATFORMS=cpu in the env still initialized the tunneled TPU). An
# in-process config update issued before first backend touch wins; after
# a backend exists this is a no-op for that backend, never an error.
import os as _os

if "JAX_PLATFORMS" in _os.environ:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # pragma: no cover — never block import on this
        pass
del _os

from mysteryann_tpu.utils.params import BuildConfig, SearchConfig, Parameters  # noqa: F401
from mysteryann_tpu.ops.distances import Metric  # noqa: F401
from mysteryann_tpu.index import index_kinds, get_index_cls, register_index  # noqa: F401
