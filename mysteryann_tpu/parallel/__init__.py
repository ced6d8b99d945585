from mysteryann_tpu.parallel.mesh import make_mesh, shard_base, replicate  # noqa: F401
from mysteryann_tpu.parallel.sharded_knn import sharded_exact_knn  # noqa: F401
from mysteryann_tpu.parallel.sharded_search import (  # noqa: F401
    distributed_beam_search,
    query_parallel_search,
)
from mysteryann_tpu.parallel.sharded_build import (  # noqa: F401
    sharded_build_roargraph,
)
from mysteryann_tpu.parallel.sharded_fused import (  # noqa: F401
    ShardedFusedSearcher,
)
