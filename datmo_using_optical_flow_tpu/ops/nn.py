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


@partial(jax.jit, static_argnames=())
def nearest_neighbors_active(src: jnp.ndarray, tgt: jnp.ndarray,
                             tgt_mask: jnp.ndarray, active: jnp.ndarray
                             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """1-NN for only the ``active`` subset of source rows; cost scales with the
    subset size (the cached-ICP hot path, :func:`ops.icp.registration_icp`).

    Active rows get exactly what :func:`nearest_neighbors` would return
    (bit-identical: each row's reduction is row-independent); inactive rows
    return idx=0 / sqdist=+inf.  Implemented by compacting active rows to the
    front (cumsum-position scatter, O(N)), running the Pallas kernel with an
    ``n_active`` scalar that lets whole inactive source blocks skip the target
    sweep, and scattering results back.
    """
    from datmo_using_optical_flow_tpu.ops import nn_pallas

    n = src.shape[0]
    if not nn_pallas.eligible(tgt.shape[0]):
        # fallback: full sweep, masked outputs (no savings, used by CPU tests
        # and oversized targets)
        idx, d2 = nearest_neighbors(src, tgt, tgt_mask)
        return (jnp.where(active, idx, 0),
                jnp.where(active, d2, jnp.inf))

    a = active.astype(jnp.int32)
    n_active = jnp.sum(a)
    pos_a = jnp.cumsum(a) - 1
    pos_i = n_active + jnp.cumsum(1 - a) - 1
    dest = jnp.where(active, pos_a, pos_i)          # original row -> compact slot
    perm = jnp.zeros((n,), jnp.int32).at[dest].set(jnp.arange(n, dtype=jnp.int32))
    idx_c, d2_c = nn_pallas.nearest_neighbors_pallas(src[perm], tgt, tgt_mask,
                                                     n_active)
    idx = jnp.zeros((n,), idx_c.dtype).at[perm].set(idx_c)
    d2 = jnp.full((n,), jnp.inf, d2_c.dtype).at[perm].set(d2_c)
    return jnp.where(active, idx, 0), jnp.where(active, d2, jnp.inf)


def align_by_nearest(points: jnp.ndarray, reference: jnp.ndarray,
                     ref_mask: jnp.ndarray) -> jnp.ndarray:
    """Replace each point by its nearest valid reference point
    (the reference's NN 'alignment' for mismatched cloud sizes, GMFA.py:84-91)."""
    idx, _ = nearest_neighbors(points, reference, ref_mask)
    return reference[idx]
