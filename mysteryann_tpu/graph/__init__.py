from mysteryann_tpu.graph.adjacency import PaddedGraph, from_lists, to_lists  # noqa: F401
from mysteryann_tpu.graph.prune import batched_occlusion_prune, dists_to_src  # noqa: F401
from mysteryann_tpu.graph.bipartite import (  # noqa: F401
    BipartiteIndex,
    BipartiteSearcher,
    build_bipartite,
)
from mysteryann_tpu.graph.roargraph import (  # noqa: F401
    RoarGraphIndex,
    build_roargraph,
    compute_medoid,
    save_projection_graph,
    load_projection_graph,
    load_nsg_graph,
)
