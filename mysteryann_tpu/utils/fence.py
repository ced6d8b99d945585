"""Device fence for trustworthy benchmark timing.

On the axon-tunneled backend `jax.block_until_ready` intermittently
returns before execution finishes (observed: identical benchmark configs
varying 17k vs 24k QPS, one absurd 15M-QPS row). Downloading even a
single element is a real completion barrier: the transfer is enqueued
after all prior work on the device stream, so its arrival proves
everything before it ran. `fence` slices one element on device (cheap)
and host-fetches it (~30 ms tunnel round trip — amortize by fencing once
per timed sweep, not per batch).
"""

from __future__ import annotations

import jax
import numpy as np


def fence(x) -> None:
    """Block until every device op ordered before `x` has completed."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    jax.block_until_ready(leaf)  # cheap path first (correct off-tunnel)
    np.asarray(leaf.ravel()[0:1])  # 4-byte download = real barrier
