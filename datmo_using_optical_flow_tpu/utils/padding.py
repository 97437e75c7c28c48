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


# above this many input rows, compaction switches from cumsum+scatter to
# top_k+gather: a row scatter costs ~4.6 ns/row on TPU (9.6 ms for the 1080p
# velocity grid's 2M cells) while top_k of the valid indices costs 3.9 ms at
# 2M and the follow-up gather touches only ``capacity`` rows
_SCATTER_MAX = 1 << 15


def compact_masked(x: jnp.ndarray, mask: jnp.ndarray, capacity: int,
                   fill_value=1e9) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stable-compact rows of ``x`` where ``mask`` is True into a ``(capacity, ...)`` buffer.

    Returns ``(compacted, out_mask, count)`` where ``count`` is the number of valid rows
    (clamped to ``capacity``).  Order of surviving rows matches input order, so results
    are bit-compatible with numpy boolean indexing followed by padding.

    Small inputs use cumsum + scatter (O(N)); large inputs find the first
    ``capacity`` valid row indices with ``top_k`` and gather them (identical
    rows in identical order, so the two paths are bit-equal).
    """
    import jax

    mask = mask.astype(bool)
    n = x.shape[0]
    if n > _SCATTER_MAX and n > capacity:
        iota = jnp.arange(n, dtype=jnp.int32)
        sentinel = jnp.int32(-(2 ** 31) + 1)
        key = jnp.where(mask, -iota, sentinel)
        vals, _ = jax.lax.top_k(key, capacity)   # descending -idx == ascending idx
        okay = vals > sentinel
        safe = jnp.where(okay, -vals, 0)
        gathered = x[safe]
        shape_tail = (1,) * (x.ndim - 1)
        out = jnp.where(okay.reshape((capacity,) + shape_tail), gathered,
                        jnp.asarray(fill_value, x.dtype))
        count = jnp.minimum(jnp.sum(mask.astype(jnp.int32)), capacity)
        return out, okay, count
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
