"""Pallas TPU kernels for the Farnebäck hot path.

Two fused kernels cover a pyramid level's per-iteration work (reference kernel
``cv2.calcOpticalFlowFarneback``, ``Optical_flow/main.py:132-142``):

* :mod:`datmo_using_optical_flow_tpu.ops.warp_pallas` — the flow-compensated
  normal-equation planes M (warp + algebra fused; replaces the XLA gather);
* :func:`blur_solve` here — aggregate M over the window (box or Gaussian,
  i.e. the OPTFLOW_FARNEBACK_GAUSSIAN flag) and solve the per-pixel 2x2
  system, in one pass (``FarnebackUpdateFlow_Blur`` semantics).  The XLA path
  materializes the blurred planes to HBM and re-reads them for the solve; this
  kernel DMAs overlapping row tiles of the padded planes into VMEM, computes
  the separable window sums on the VPU, and writes only the two flow
  components.

Layout: planes are channel-first (5, H, W), edge-padded to (5, H+2r+pad, W+2r)
by the caller wrapper; tiles overlap by 2r rows, which BlockSpecs cannot
express, so the kernel stages its window via an explicit async copy.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blur_solve_kernel(m_hbm, dx_ref, dy_ref, scratch, vscratch, sem, *,
                       taps: tuple[float, ...], scale: float, tile_h: int,
                       window_h: int):
    """One row tile: DMA window -> weighted vertical/horizontal sums -> solve."""
    t = pl.program_id(0)
    w_out = dx_ref.shape[1]
    winsize = len(taps)

    # window_h is tile_h + 2r rounded up to the sublane tiling (8); the caller
    # pads the source so the over-read stays in bounds
    copy = pltpu.make_async_copy(
        m_hbm.at[:, pl.ds(t * tile_h, window_h), :], scratch, sem)
    copy.start()
    copy.wait()

    # static (python-int) slices keep Mosaic happy (dynamic sublane offsets must
    # be 8-aligned); accumulating through the scratch ref caps live temporaries
    def term(sl, w):
        return sl if w == 1.0 else np.float32(w) * sl

    vscratch[...] = term(scratch[:, 0:tile_h, :], taps[0])
    for i in range(1, winsize):
        vscratch[...] = vscratch[...] + term(scratch[:, i:i + tile_h, :], taps[i])

    hsum = term(vscratch[:, :, 0:w_out], taps[0])
    for i in range(1, winsize):
        hsum = hsum + term(vscratch[:, :, i:i + w_out], taps[i])
    mb = hsum * np.float32(scale)

    g11, g12, g22, h1, h2 = mb[0], mb[1], mb[2], mb[3], mb[4]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    dx_ref[...] = (g11 * h2 - g12 * h1) * idet
    dy_ref[...] = (g22 * h1 - g12 * h2) * idet


def _gauss_taps(winsize: int) -> tuple[float, ...]:
    """OPTFLOW_FARNEBACK_GAUSSIAN window: sigma = (winsize//2)*0.3, normalized
    (matches ops/farneback.py:gauss_blur5, validated vs cv2 flags=256)."""
    m = winsize // 2
    x = np.arange(-m, m + 1, dtype=np.float64)
    sigma = m * 0.3
    g = np.exp(-x * x / (2 * sigma * sigma))
    return tuple((g / g.sum()).astype(np.float32).tolist())


@partial(jax.jit, static_argnames=("winsize", "gaussian"))
def blur_solve(M: jnp.ndarray, winsize: int, gaussian: bool = False
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``solve_flow(blur(M, winsize))`` for box or Gaussian aggregation —
    matches the jnp path up to float reassociation (same adds, different
    grouping)."""
    _, h, w = M.shape
    r = winsize // 2
    if gaussian:
        taps = _gauss_taps(winsize)
        scale = 1.0
    else:
        taps = (1.0,) * winsize
        scale = 1.0 / (winsize * winsize)
    tile_h = 16 if h >= 16 else 8  # 8-aligned tiles/DMA offsets
    pad_h = (-h) % tile_h
    window_h = -(-(tile_h + 2 * r) // 8) * 8    # DMA row slices: 8-aligned
    wp = -(-(w + 2 * r) // 128) * 128           # DMA lane dim: 128-aligned
    extra_h = window_h - (tile_h + 2 * r)
    mp = jnp.pad(M, ((0, 0), (r, r + pad_h + extra_h), (r, wp - w - r)), mode="edge")
    n_tiles = (h + pad_h) // tile_h

    kernel = partial(_blur_solve_kernel, taps=taps, scale=scale, tile_h=tile_h,
                     window_h=window_h)
    dx, dy = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",  # tests run on the CPU mesh
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec((tile_h, w), lambda t: (t, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile_h, w), lambda t: (t, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((h + pad_h, w), jnp.float32),
                   jax.ShapeDtypeStruct((h + pad_h, w), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((5, window_h, wp), jnp.float32),
            pltpu.VMEM((5, tile_h, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(mp)
    return dx[:h], dy[:h]


def box_blur_solve(M: jnp.ndarray, winsize: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Backward-compatible alias for the box-aggregation path."""
    return blur_solve(M, winsize, gaussian=False)


def farneback_level(R0: jnp.ndarray, R1: jnp.ndarray, dx: jnp.ndarray,
                    dy: jnp.ndarray, winsize: int, iterations: int,
                    gaussian: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramid level on the Pallas path: shift-decomposition warp kernel for
    the matrices (with an in-graph fallback to the packed-gather path when the
    flow exceeds the warp window) + the fused blur/solve kernel.

    Small levels stay entirely on the XLA packed-gather path — their gathers
    are cheap and the strip-grid overhead would dominate.
    """
    from datmo_using_optical_flow_tpu.ops import warp_pallas
    from datmo_using_optical_flow_tpu.ops.farneback import (pack_corner_pairs,
                                                            update_matrices)

    _, h, w = R0.shape
    if warp_pallas.eligible(h, w):
        r1p = warp_pallas._pad_r1(R1)

        def um(dxi, dyi):
            def fast(args):
                return warp_pallas.warp_matrices(R0, r1p, *args)

            def slow(args):
                return update_matrices(R0, R1, *args, pack_corner_pairs(R1))

            return jax.lax.cond(warp_pallas.flow_in_range(dxi, dyi),
                                fast, slow, (dxi, dyi))
    else:
        packed = pack_corner_pairs(R1)

        def um(dxi, dyi):
            return update_matrices(R0, R1, dxi, dyi, packed)

    M = um(dx, dy)
    for i in range(iterations):
        dx, dy = blur_solve(M, winsize, gaussian)
        if i < iterations - 1:
            M = um(dx, dy)
    return dx, dy
