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

from datmo_using_optical_flow_tpu.ops.nn import (nearest_neighbors,
                                                 nearest_neighbors_active)


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


# Conservative bound on the NN kernel's absolute f32 error on a squared
# distance (catastrophic cancellation in ||s||^2 - 2 s.t + ||t||^2 at ROI-scale
# coordinates, |p| <= ~30 m -> ~6e-4; 6x headroom).  Only inflates the cached
# path's re-query shell — never its correctness (see registration_icp).
_D2_ERR = 4e-3


@partial(jax.jit, static_argnames=("max_iterations", "cached"))
def registration_icp(source: jnp.ndarray, source_mask: jnp.ndarray,
                     target: jnp.ndarray, target_mask: jnp.ndarray,
                     threshold: float = 0.02, max_iterations: int = 30,
                     relative_fitness: float = 1e-6,
                     relative_rmse: float = 1e-6,
                     cached: bool | None = None) -> IcpResult:
    """ICP with identity init (the reference always passes I, GMFA.py:302).

    ``cached`` enables incremental correspondence search (default for targets
    >= 4096 points): the NN distance function is 1-Lipschitz in the query
    position, so a source point whose last exact NN distance ``d`` (measured at
    query position ``q``) satisfies ``d - ||p' - q|| > threshold`` is GUARANTEED
    to stay outside ``max_correspondence_distance`` at its new position ``p'``
    — only points inside that shrinking shell re-query the target
    (:func:`ops.nn.nearest_neighbors_active`; cost scales with the shell size,
    not N).  Results are bit-identical to the uncached path: re-queried rows
    run the same per-row kernel math, excluded rows are provably
    non-correspondences (the bound is widened by ``_D2_ERR`` to dominate the
    kernel's own f32 rounding), and Open3D's convergence criteria see identical
    fitness/rmse sequences.
    """
    n = source.shape[0]
    srcf = source.astype(jnp.float32)
    tgtf = target.astype(jnp.float32)
    smask = source_mask
    n_valid = jnp.maximum(jnp.sum(smask.astype(jnp.float32)), 1.0)
    thr2 = jnp.float32(threshold * threshold)
    if cached is None:
        cached = target.shape[0] >= 4096

    def eval_full(transform, cache):
        pts = srcf @ transform[:3, :3].T + transform[:3, 3]
        idx, d2 = nearest_neighbors(pts, tgtf, target_mask)
        corr = smask & (d2 <= thr2)
        return pts, idx, d2, corr, cache

    def eval_cached(transform, cache):
        d2_old, idx_old, qpos = cache
        pts = srcf @ transform[:3, :3].T + transform[:3, 3]
        delta = jnp.linalg.norm(pts - qpos, axis=1)
        # lower bound on the true NN distance at the previous query position,
        # then at the new one (reverse triangle inequality), both widened by
        # the kernel's d2 rounding envelope
        lo_old = jnp.sqrt(jnp.maximum(d2_old - _D2_ERR, 0.0))
        lo_new = lo_old - delta
        excluded = (lo_new > 0.0) & (lo_new * lo_new - _D2_ERR > thr2)
        need = smask & ~excluded
        idx_new, d2_new = nearest_neighbors_active(pts, tgtf, target_mask, need)
        cache = (jnp.where(need, d2_new, d2_old),
                 jnp.where(need, idx_new, idx_old),
                 jnp.where(need[:, None], pts, qpos))
        corr = need & (d2_new <= thr2)
        return pts, cache[1], jnp.where(need, d2_new, jnp.inf), corr, cache

    eval_state = eval_cached if cached else eval_full

    def observables(d2, corr):
        w = corr.astype(jnp.float32)
        cnt = jnp.sum(w)
        fitness = cnt / n_valid
        rmse = jnp.sqrt(jnp.sum(jnp.where(corr, d2, 0.0)) / jnp.maximum(cnt, 1.0))
        return w, cnt, fitness, rmse

    def cond(state):
        transform, f1, r1, f0, r0, it, cache = state
        first = it < 2  # need two evaluations before convergence can trigger
        keep = (jnp.abs(f0 - f1) >= relative_fitness) | \
               (jnp.abs(r0 - r1) >= relative_rmse)
        return (it < max_iterations) & (first | keep)

    def body(state):
        transform, f1, r1, f0, r0, it, cache = state
        pts, idx, d2, corr, cache = eval_state(transform, cache)
        w, cnt, fitness, rmse = observables(d2, corr)
        dst = tgtf[idx]
        update = _kabsch(pts, dst, w)
        # fewer than 3 correspondences: no reliable estimate; keep transform
        update = jnp.where(cnt >= 3, update, jnp.eye(4))
        new_transform = update @ transform
        return new_transform, fitness, rmse, f1, r1, it + 1, cache

    cache0 = (jnp.zeros((n,), jnp.float32),            # d2 at last query
              jnp.zeros((n,), jnp.int32),              # NN index at last query
              jnp.full((n, 3), 1e9, jnp.float32))      # last query position
    init = (jnp.eye(4), jnp.float32(0.0), jnp.float32(0.0),
            jnp.float32(-1.0), jnp.float32(-1.0), 0, cache0)
    transform, _, _, _, _, _, cache = jax.lax.while_loop(cond, body, init)
    _, _, d2, corr, _ = eval_state(transform, cache)
    _, _, fitness, rmse = observables(d2, corr)
    return IcpResult(transform, fitness, rmse)


def transform_points(points: jnp.ndarray, transformation: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform ((R @ p) + t, the reference's GMFA.py:77)."""
    return points @ transformation[:3, :3].T + transformation[:3, 3]
