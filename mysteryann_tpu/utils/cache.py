"""npz compute-or-load cache used by the benchmark scripts.

One shared implementation (bench.py, scripts/bench_10m.py and
scripts/build_10m.py each carried a copy). Writes are atomic
(tmp + rename) so an interrupted run can't leave a truncated .npz that
poisons every later run.
"""

from __future__ import annotations

import os
from typing import Callable, List, Sequence

import numpy as np


def npz_cached(cache_dir: str, name: str,
               fn: Callable[[], Sequence[np.ndarray]]) -> List[np.ndarray]:
    """Return fn()'s arrays, loading from ``cache_dir/name.npz`` when present."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, name + ".npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return [z[k] for k in z.files]
    out = [np.asarray(a) for a in fn()]
    # np.savez appends ".npz" unless the name already ends with it
    tmp = path[:-4] + f".tmp{os.getpid()}.npz"
    np.savez(tmp, *out)
    os.replace(tmp, path)
    return out
