"""Decompose the stream step's pyramid-build cost at 1080p (diagnostics).

The stage table puts "smaller pyramid levels + resize" at ~2 ms and
"polynomial expansion" at ~2.2 ms per frame.  diag_resize showed the
inter-level flow upsample is only ~0.15 ms, so the bucket must be dominated
by the per-level full-resolution Gaussian blurs (cv2's FarnebackPolyExpPyr
smooths the ORIGINAL image per level: 25 taps for level 2, 7 for level 1 at
1080p) and the level-0 polyexp.  Variants timed here:

* each level's blur+resize as shipped (gaussian_blur + resize_bilinear);
* poly_exp per level, jnp vs the new Pallas kernel;
* blur+downsample as two banded matmuls on the MXU (HIGHEST) — one linear
  operator per axis combining the blur taps, the row/col picks, and the
  bilinear lerp weights; reads the image once, ~0.2 GFLOP at level 2;
* full build_pyramid as shipped vs with both candidate substitutions.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from datmo_using_optical_flow_tpu.utils.compile_cache import enable as _ec

_ec()
import jax.numpy as jnp
import numpy as np

from datmo_using_optical_flow_tpu.ops.farneback import (
    gaussian_blur, poly_exp, resize_bilinear, build_pyramid)
from datmo_using_optical_flow_tpu.ops.flow_pallas import poly_exp_pallas
from datmo_using_optical_flow_tpu.oracle.np_farneback import (
    level_sizes, gaussian_kernel)

H, W = 1080, 1920
REPS = 8
_RT = [0.0]


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def timed(name, fn, *args):
    f = jax.jit(lambda a: fn(a))
    _sync(f(*args))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(f(*args))
        runs.append((time.perf_counter() - t0) * 1000)
    dt = (min(runs) - _RT[0]) / REPS
    print(f"{name:58s} {dt:8.3f} ms", flush=True)
    return dt


def _rep(fn):
    def run(a):
        acc = jnp.float32(0)
        out = None
        for _ in range(REPS):
            out = fn(a + acc * 1e-30)
            acc = jnp.sum(jax.tree.leaves(out)[0]) * 1e-30
        return out
    return run


def blur_downsample_mats(h, w, lh, lw, smooth_sz, sigma):
    """Banded operators: rows (lh, h), cols (w, lw) — blur o resize, f64 taps
    composed in numpy then cast once to f32."""
    k = gaussian_kernel(smooth_sz, sigma).astype(np.float64)
    m = smooth_sz // 2

    def axis_mat(size, out):
        sy = size / out
        fy = (np.arange(out) + 0.5) * sy - 0.5
        y0 = np.clip(np.floor(fy).astype(np.int64), 0, max(size - 2, 0))
        wy = np.clip(fy - y0, 0.0, 1.0)
        y1 = np.minimum(y0 + 1, size - 1)
        A = np.zeros((out, size))
        A[np.arange(out), y0] += 1 - wy
        A[np.arange(out), y1] += wy
        # blur with edge ("reflect"? gaussian_blur uses reflect 101) — compose
        B = np.zeros((size, size))
        for i, wk in enumerate(k):
            idx = np.arange(size) + i - m
            idx = np.abs(idx)                      # BORDER_REFLECT_101 lower
            idx = np.where(idx > size - 1, 2 * (size - 1) - idx, idx)
            B[np.arange(size), idx] += wk
        return (A @ B).astype(np.float32)

    return jnp.asarray(axis_mat(h, lh)), jnp.asarray(axis_mat(w, lw).T)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32) * 40 + 120)

    tiny = jax.jit(lambda a: a + 1.0)
    _sync(tiny(jnp.float32(1)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny(jnp.float32(1)))
        rts.append((time.perf_counter() - t0) * 1000)
    _RT[0] = min(rts)
    print(f"dispatch+readback constant: {_RT[0]:.1f} ms", flush=True)

    levels = level_sizes(H, W, 0.3, 5)
    total_ship = 0.0
    total_new = 0.0
    for k, scale, lh, lw in levels:
        sigma = (1.0 / scale - 1.0) * 0.5
        smooth_sz = max(int(round(sigma * 5)) | 1, 3)

        def ship(a, sz=smooth_sz, sg=sigma, LH=lh, LW=lw):
            return resize_bilinear(gaussian_blur(a, sz, sg), LH, LW)

        t = timed(f"L{k} blur({smooth_sz})+resize->{lh}x{lw} (shipped)",
                  _rep(ship), img)
        total_ship += t
        if (lh, lw) != (H, W):
            Wr, Wc = blur_downsample_mats(H, W, lh, lw, smooth_sz, sigma)

            def mat(a, Wr=Wr, Wc=Wc):
                v = jnp.einsum("oh,hw->ow", Wr, a,
                               precision=jax.lax.Precision.HIGHEST)
                return jnp.einsum("ow,wq->oq", v, Wc,
                                  precision=jax.lax.Precision.HIGHEST)

            t2 = timed(f"L{k} blur+downsample as banded matmul", _rep(mat), img)
            total_new += t2
            d = float(jnp.max(jnp.abs(mat(img) - ship(img))))
            print(f"    matmul vs shipped: max|d| {d:.3e}", flush=True)
        else:
            total_new += t

        small = ship(img)
        tp = timed(f"L{k} poly_exp jnp @{lh}x{lw}",
                   _rep(lambda a: poly_exp(a, 5, 5.0)), small)
        tq = timed(f"L{k} poly_exp PALLAS @{lh}x{lw}",
                   _rep(lambda a: poly_exp_pallas(a, 5, 5.0)), small)
        dd = float(jnp.max(jnp.abs(poly_exp(small, 5, 5.0)
                                   - poly_exp_pallas(small, 5, 5.0))))
        print(f"    pallas vs jnp: max|d| {dd:.3e}", flush=True)
        total_ship += tp
        total_new += min(tp, tq)

    print(f"\nper-frame pyramid build (shipped pieces): {total_ship:.3f} ms",
          flush=True)
    print(f"per-frame pyramid build (best variants):  {total_new:.3f} ms",
          flush=True)

    timed("build_pyramid full (shipped)",
          _rep(lambda a: build_pyramid(a, 0.3, 5, 5, 5.0)), img)


if __name__ == "__main__":
    main()
