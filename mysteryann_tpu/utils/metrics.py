"""Evaluation metrics matching the reference search drivers.

- recall@k: mean set-intersection with ground truth
  (ComputeRecall, reference tests/test_search_roargraph.cpp:23-36);
- rderr: mean relative distance error with IP/cosine un-negation
  (ComputeRderr, reference tests/test_search_roargraph.cpp:38-62).
"""

from __future__ import annotations

import numpy as np

from mysteryann_tpu.ops.distances import Metric


def compute_recall(found_ids: np.ndarray, gt_ids: np.ndarray, k: int) -> float:
    found = found_ids[:, :k]
    gt = gt_ids[:, :k]
    hits = 0
    for f, g in zip(found, gt):
        hits += len(np.intersect1d(f, g, assume_unique=False))
    return hits / (gt.shape[0] * k)


def compute_rderr(found_dists: np.ndarray, gt_dists: np.ndarray, k: int,
                  metric: Metric | str = Metric.IP) -> float:
    """Mean relative distance error over the top-k.

    IP/cosine distances are negated inner products; un-negate before the
    ratio like the reference does, guarding zero denominators.
    """
    metric = Metric.parse(metric)
    f = found_dists[:, :k].astype(np.float64)
    g = gt_dists[:, :k].astype(np.float64)
    if metric in (Metric.IP, Metric.COSINE):
        f, g = -f, -g
    denom = np.where(np.abs(g) < 1e-12, 1e-12, g)
    err = (g - f) / denom  # found is never better than GT; err >= 0 up to fp
    return float(np.mean(np.abs(err)))
