"""Synthetic cross-modal dataset generator.

The reference validates only on downloaded datasets (prepare_data.sh) —
it has no synthetic fixture. We need one for unit tests and benchmarks:
an out-of-distribution (OOD) query workload resembling text→image retrieval,
where training/search queries come from a *different* distribution than the
base set (the regime RoarGraph targets).

Construction: K latent "concept" directions; base vectors are concepts plus
isotropic noise (the "image" modality); queries are the same concepts pushed
through a fixed random linear "modality gap" map plus a shift, with their own
noise (the "text" modality). This reproduces the key OOD property: a query's
nearest base neighbors are spread across the base manifold rather than
forming a tight cluster around the query.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def make_cross_modal(
    n_base: int,
    n_query: int,
    dim: int,
    n_concepts: int = 64,
    modality_gap: float = 0.6,
    noise: float = 0.35,
    metric: str = "ip",
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (base [n_base, dim], queries [n_query, dim]) float32."""
    rng = np.random.default_rng(seed)
    concepts = rng.standard_normal((n_concepts, dim)).astype(np.float32)
    concepts /= np.linalg.norm(concepts, axis=1, keepdims=True)

    # modality gap: orthogonal-ish mixing matrix applied to query-side concepts
    mix = rng.standard_normal((dim, dim)).astype(np.float32) / np.sqrt(dim)
    gap_dir = rng.standard_normal((1, dim)).astype(np.float32)
    gap_dir /= np.linalg.norm(gap_dir)

    def sample(n: int, query_side: bool) -> np.ndarray:
        ids = rng.integers(0, n_concepts, size=n)
        x = concepts[ids]
        if query_side:
            x = x @ (np.eye(dim, dtype=np.float32) * (1 - modality_gap) + mix * modality_gap)
            x = x + gap_dir * modality_gap
        x = x + rng.standard_normal((n, dim)).astype(np.float32) * noise
        if metric in ("cosine", "ip"):
            # embeddings in these workloads are ~unit-norm (CLIP-style)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return x.astype(np.float32)

    return sample(n_base, False), sample(n_query, True)
