"""Chunked host→device transfer.

CORRECTED MEASUREMENT (2026-08-20): every upload path through the axon
tunnel — `jnp.asarray`, chunked fills, `jax.device_put` — UNDER-BLOCKS:
`block_until_ready` returns while the real transfer keeps draining in
the background at the tunnel's true ~8-17 MB/s, and the next
device→host readback stalls behind it (a 32 KB probe download measured
108-230 s right after "0.6 s" uploads). The 2026-08-19 note here that
sub-GB chunks ride a ~1.3 GB/s "fast path" was an artifact of that
under-blocking — chunking does NOT change the aggregate rate. What
chunking still buys: bounded host-side copy/pinning per piece and a
buffer that can be donated into. For TIMING honesty, fence the staged
array (`utils.fence.fence` — a readback is the only true completion
barrier) before starting any clock; on production PCIe hosts none of
this applies.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# chunk well under the slow-path threshold; 256 MB measured fast
_CHUNK_BYTES = 256 * 1024 * 1024
# arrays at or under this go through plain jnp.asarray (no copy logic)
_DIRECT_BYTES = 1024 * 1024 * 1024


@partial(jax.jit, donate_argnums=(0,))
def _fill(buf, chunk, start):
    return jax.lax.dynamic_update_slice_in_dim(buf, chunk, start, 0)


def to_device_chunked(x: np.ndarray, dtype=None) -> jax.Array:
    """`jnp.asarray(x, dtype)` that stays on the fast transfer path.

    Splits leading-dim row chunks of ≤256 MB into a donated device
    buffer. Small arrays (≤1 GB) pass straight through. Device arrays
    are returned as-is (dtype-cast if asked).
    """
    if isinstance(x, jax.Array):
        return x.astype(dtype) if dtype is not None and x.dtype != dtype \
            else x
    x = np.asarray(x, dtype=np.dtype(dtype) if dtype is not None else None)
    if x.nbytes <= _DIRECT_BYTES or x.ndim == 0 or x.shape[0] <= 1:
        return jnp.asarray(x)
    row_bytes = max(1, x.nbytes // x.shape[0])
    rows = max(1, _CHUNK_BYTES // row_bytes)
    buf = jnp.zeros(x.shape, x.dtype)
    for s in range(0, x.shape[0], rows):
        c = np.ascontiguousarray(x[s: s + rows])
        buf = _fill(buf, jnp.asarray(c), jnp.int32(s))
    return buf
