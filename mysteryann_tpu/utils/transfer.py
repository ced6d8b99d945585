"""Chunked host→device transfer.

Measured through the axon tunnel (2026-08-19): a 512 MB `jnp.asarray`
lands at ~1.3 GB/s, but multi-GB arrays collapse to ~11-25 MB/s — the
5.1 GB base upload alone cost 450 s of a 10M build, and the 3.8 GB
reverse-candidate tensor another ~215 s. Splitting the transfer into
sub-GB chunks and folding them into a donated device buffer
(`dynamic_update_slice`, the pack_neighbor_table pattern) keeps every
piece on the fast path.
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
