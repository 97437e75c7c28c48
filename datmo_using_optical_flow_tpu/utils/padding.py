"""Fixed-capacity padded-buffer helpers.

The TPU-native convention replacing the reference's dynamic numpy filtering
(e.g. boolean masking at ``Optical_flow/main.py:30-36``): every array has a static
capacity and a validity mask; "filtering" = recomputing the mask; "compaction" =
stable scatter of valid rows to the front (preserving input order, like numpy
boolean indexing does).
"""

from __future__ import annotations

import jax.numpy as jnp


def pad_to(x: jnp.ndarray, capacity: int, fill_value=0) -> jnp.ndarray:
    """Pad (or truncate) the leading axis of ``x`` to ``capacity``."""
    n = x.shape[0]
    if n == capacity:
        return x
    if n > capacity:
        return x[:capacity]
    pad_width = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill_value)


def compact_masked(x: jnp.ndarray, mask: jnp.ndarray, capacity: int,
                   fill_value=1e9) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stable-compact rows of ``x`` where ``mask`` is True into a ``(capacity, ...)`` buffer.

    Returns ``(compacted, out_mask, count)`` where ``count`` is the number of valid rows
    (clamped to ``capacity``).  Order of surviving rows matches input order, so results
    are bit-compatible with numpy boolean indexing followed by padding.

    Implemented as a cumsum + scatter (O(N)), not a sort.
    """
    mask = mask.astype(bool)
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1          # destination row for valid entries
    count = jnp.minimum(pos[-1] + 1 if pos.shape[0] else 0, capacity)
    dest = jnp.where(mask & (pos < capacity), pos, capacity)  # invalid -> dropped slot
    out_shape = (capacity + 1,) + x.shape[1:]
    out = jnp.full(out_shape, fill_value, dtype=x.dtype)
    out = out.at[dest].set(x, mode="drop")
    out = out[:capacity]
    idx = jnp.arange(capacity)
    out_mask = idx < count
    return out, out_mask, count
