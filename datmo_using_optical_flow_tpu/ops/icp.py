"""Point-to-point ICP on device (ego-motion estimation).

TPU-native equivalent of Open3D's ``registration_icp(source, target, threshold,
I, TransformationEstimationPointToPoint())`` as invoked at ``GMFA/GMFA.py:297-309``:

* correspondences: 1-NN of each transformed source point in the target, gated by
  ``max_correspondence_distance`` — here a tiled brute-force matmul reduction
  (:mod:`datmo_using_optical_flow_tpu.ops.nn`) instead of a KD-tree;
* per-iteration rigid estimate: Kabsch/SVD over the masked correspondence set;
* Open3D's convergence criteria: stop when both |Δfitness| and |Δinlier_rmse|
  drop below their relative thresholds, or after ``max_iterations`` (default 30);
* everything under one ``lax.while_loop`` with static shapes.

Returns the 4x4 transform mapping source -> target, plus fitness/inlier_rmse —
the same observables Open3D reports.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from datmo_using_optical_flow_tpu.ops.nn import nearest_neighbors


class IcpResult(NamedTuple):
    transformation: jnp.ndarray  # (4, 4)
    fitness: jnp.ndarray         # scalar: |correspondences| / |valid source|
    inlier_rmse: jnp.ndarray     # scalar


def _kabsch(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted rigid alignment src->dst (rotation+translation, no scale)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    cs = jnp.sum(src * w[:, None], axis=0) / wsum
    cd = jnp.sum(dst * w[:, None], axis=0) / wsum
    s = (src - cs) * w[:, None]
    d = dst - cd
    h = s.T @ d  # (3, 3)
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(vt.T @ u.T)
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
    r = vt.T @ diag @ u.T
    t = cd - r @ cs
    return jnp.eye(4).at[:3, :3].set(r).at[:3, 3].set(t)


@partial(jax.jit, static_argnames=("max_iterations",))
def registration_icp(source: jnp.ndarray, source_mask: jnp.ndarray,
                     target: jnp.ndarray, target_mask: jnp.ndarray,
                     threshold: float = 0.02, max_iterations: int = 30,
                     relative_fitness: float = 1e-6,
                     relative_rmse: float = 1e-6) -> IcpResult:
    """ICP with identity init (the reference always passes I, GMFA.py:302)."""
    n = source.shape[0]
    srcf = source.astype(jnp.float32)
    smask = source_mask
    n_valid = jnp.maximum(jnp.sum(smask.astype(jnp.float32)), 1.0)
    thr2 = jnp.float32(threshold * threshold)

    def eval_state(transform):
        pts = srcf @ transform[:3, :3].T + transform[:3, 3]
        idx, d2 = nearest_neighbors(pts, target.astype(jnp.float32), target_mask)
        corr = smask & (d2 <= thr2)
        w = corr.astype(jnp.float32)
        cnt = jnp.sum(w)
        fitness = cnt / n_valid
        rmse = jnp.sqrt(jnp.sum(jnp.where(corr, d2, 0.0)) / jnp.maximum(cnt, 1.0))
        return pts, idx, w, cnt, fitness, rmse

    def cond(state):
        transform, f1, r1, f0, r0, it = state
        first = it < 2  # need two evaluations before convergence can trigger
        keep = (jnp.abs(f0 - f1) >= relative_fitness) | \
               (jnp.abs(r0 - r1) >= relative_rmse)
        return (it < max_iterations) & (first | keep)

    def body(state):
        transform, f1, r1, f0, r0, it = state
        pts, idx, w, cnt, fitness, rmse = eval_state(transform)
        dst = target.astype(jnp.float32)[idx]
        update = _kabsch(pts, dst, w)
        # fewer than 3 correspondences: no reliable estimate; keep transform
        update = jnp.where(cnt >= 3, update, jnp.eye(4))
        new_transform = update @ transform
        return new_transform, fitness, rmse, f1, r1, it + 1

    init = (jnp.eye(4), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(-1.0), jnp.float32(-1.0), 0)
    transform, _, _, _, _, _ = jax.lax.while_loop(cond, body, init)
    _, _, _, _, fitness, rmse = eval_state(transform)
    return IcpResult(transform, fitness, rmse)


def transform_points(points: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform ((R @ p) + t, the reference's GMFA.py:77)."""
    return points @ transformation[:3, :3].T + transformation[:3, 3]
