from mysteryann_tpu.ops.distances import (  # noqa: F401
    Metric,
    pairwise_dist,
    point_dist,
    normalize_rows,
    squared_norms,
)
from mysteryann_tpu.ops.knn import exact_knn, exact_knn_device, compute_ground_truth  # noqa: F401
