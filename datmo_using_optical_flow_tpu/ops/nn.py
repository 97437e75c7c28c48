"""Batched brute-force 1-nearest-neighbor over padded point sets.

TPU-native replacement for the reference's per-point Python KDTree loops
(``GMFA/GMFA.py:84-91`` and :109-119 — its worst hot loop: one Python->C++ FLANN
call per point).  Here the whole N x M problem is tiled squared-distance matmuls
on the MXU with a running (min-dist, argmin) reduction — no tree, no host loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_TILE = 512


@partial(jax.jit, static_argnames=())
def nearest_neighbors(src: jnp.ndarray, tgt: jnp.ndarray, tgt_mask: jnp.ndarray
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """For each src point, the index + squared distance of its nearest valid tgt.

    ``src``: (N, 3); ``tgt``: (M, 3) padded; ``tgt_mask``: (M,) validity.
    Returns ``(idx (N,), sqdist (N,))``; if no valid target exists, idx = 0 and
    sqdist = +inf.  M is padded internally to the tile size.
    """
    from datmo_using_optical_flow_tpu.ops import nn_pallas

    if nn_pallas.eligible(tgt.shape[0]):
        return nn_pallas.nearest_neighbors_pallas(src, tgt, tgt_mask)
    return nearest_neighbors_scan(src, tgt, tgt_mask)


@partial(jax.jit, static_argnames=())
def nearest_neighbors_scan(src: jnp.ndarray, tgt: jnp.ndarray,
                           tgt_mask: jnp.ndarray
                           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled-scan XLA fallback for target clouds too large for the Pallas
    kernel's VMEM-resident layout (> ops.nn_pallas.MAX_TARGET points)."""
    n = src.shape[0]
    m = tgt.shape[0]
    pad = (-m) % _TILE
    tgt_p = jnp.pad(tgt.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=3e18)
    mask_p = jnp.pad(tgt_mask, ((0, pad),))
    src = src.astype(jnp.float32)
    sn = jnp.sum(src * src, axis=1)

    def tile_step(carry, j):
        best_d, best_i = carry
        tile = jax.lax.dynamic_slice_in_dim(tgt_p, j * _TILE, _TILE, 0)
        tm = jax.lax.dynamic_slice_in_dim(mask_p, j * _TILE, _TILE, 0)
        tn = jnp.sum(tile * tile, axis=1)
        d2 = sn[:, None] + tn[None, :] - 2.0 * (src @ tile.T)
        d2 = jnp.where(tm[None, :], jnp.maximum(d2, 0.0), jnp.inf)
        ti = jnp.argmin(d2, axis=1)
        td = jnp.min(d2, axis=1)  # NOT take_along_axis: that would be a gather
        take = td < best_d
        return (jnp.where(take, td, best_d),
                jnp.where(take, ti + j * _TILE, best_i)), None

    init = (jnp.full((n,), jnp.inf, jnp.float32), jnp.zeros((n,), jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(tile_step, init,
                                       jnp.arange(tgt_p.shape[0] // _TILE))
    return best_i, best_d


def align_by_nearest(points: jnp.ndarray, reference: jnp.ndarray,
                     ref_mask: jnp.ndarray) -> jnp.ndarray:
    """Replace each point by its nearest valid reference point
    (the reference's NN 'alignment' for mismatched cloud sizes, GMFA.py:84-91)."""
    idx, _ = nearest_neighbors(points, reference, ref_mask)
    return reference[idx]
