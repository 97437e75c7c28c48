"""BEV rasterization as segment reductions (no Python loops).

TPU-native equivalent of ``compute_bev_grid`` (``Optical_flow/main.py:98-126``), which
the reference implements as a pure-Python nested-list binning loop — its slowest stage.
Here it is two ``segment_sum`` passes over statically-shaped point buffers.

Reference semantics replicated exactly:

* bin edges via ``np.arange(lo, hi, step)`` — grid shape = number of arange entries;
* ``x_idx = int((x - x0)/w)`` — **truncation toward zero** (``main.py:106-107``), so
  points in ``(x0 - w, x0)`` land in bin 0;
* cell value ``(a·mean(z) + b·std(z))/h_max`` with population std (``main.py:114-118``);
* renormalize by grid max, then ``(v*255).astype(uint8)`` truncation (``main.py:122-123``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("grid_shape",))
def bev_cell_stats(points: jnp.ndarray, mask: jnp.ndarray, grid_shape: tuple[int, int],
                   x_range, y_range, grid_resolution
                   ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-cell (count, mean_z, std_z) over points binned into the BEV grid.

    Returns float arrays of shape ``grid_shape`` (= (nx, ny); row = x bin as in the
    reference, ``main.py:111``).
    """
    nx, ny = grid_shape
    w, h = grid_resolution
    dtype = points.dtype
    xi = jnp.trunc((points[:, 0] - x_range[0]) / w).astype(jnp.int32)
    yi = jnp.trunc((points[:, 1] - y_range[0]) / h).astype(jnp.int32)
    ok = mask & (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny)
    cell = jnp.where(ok, xi * ny + yi, nx * ny)  # out-of-grid -> scratch segment
    num_segments = nx * ny + 1

    z = points[:, 2]
    zm = jnp.where(ok, z, 0.0)
    cnt = jax.ops.segment_sum(ok.astype(dtype), cell, num_segments)
    s1 = jax.ops.segment_sum(zm, cell, num_segments)
    safe_cnt = jnp.maximum(cnt, 1.0)
    mean = s1 / safe_cnt
    # two-pass variance (matches np.std's mean-of-squared-deviations numerics
    # far better than E[z^2]-E[z]^2)
    dev = jnp.where(ok, z - mean[cell], 0.0)
    s2 = jax.ops.segment_sum(dev * dev, cell, num_segments)
    std = jnp.sqrt(s2 / safe_cnt)

    cnt = cnt[:-1].reshape(nx, ny)
    mean = mean[:-1].reshape(nx, ny)
    std = std[:-1].reshape(nx, ny)
    return cnt, mean, std


@partial(jax.jit, static_argnames=("grid_shape",))
def compute_bev_grid(points: jnp.ndarray, mask: jnp.ndarray, grid_shape: tuple[int, int],
                     x_range, y_range, grid_resolution, a: float = 0.5, b: float = 0.5,
                     h_max: float = 5.0) -> jnp.ndarray:
    """uint8 BEV grid, bit-matching ``compute_bev_grid`` (``main.py:98-126``)."""
    cnt, mean, std = bev_cell_stats(points, mask, grid_shape, x_range, y_range, grid_resolution)
    vals = jnp.where(cnt > 0, (a * mean + b * std) / h_max, 0.0)
    vmax = jnp.max(vals)
    # reference divides unconditionally (main.py:122); empty grids give 0/0 -> we guard
    vals = vals / jnp.where(vmax > 0, vmax, 1.0)
    # numpy's float->uint8 astype truncates toward zero then wraps modulo 256
    # (negative cell values — possible since mean(z) can be < 0 — wrap, main.py:123);
    # XLA's convert would clamp, so wrap explicitly for bit-parity.
    i32 = jnp.trunc(vals * 255.0).astype(jnp.int32)
    return (i32 % 256).astype(jnp.uint8)
