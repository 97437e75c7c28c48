"""Pallas TPU kernels for the Farnebäck hot path.

The aggregation stage of every flow iteration — box-filter the five
normal-equation planes over ``winsize`` then solve a 2x2 system per pixel
(``FarnebackUpdateFlow_Blur`` semantics) — is fused into ONE kernel here:
the XLA path materializes the blurred planes to HBM and re-reads them for the
solve (~3 extra plane round-trips per iteration); this kernel DMAs overlapping
row tiles of the padded planes into VMEM, computes the separable box sums on
the VPU, and writes only the two flow components.

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
                       winsize: int, tile_h: int, window_h: int):
    """One row tile: DMA window -> vertical/horizontal box sums -> 2x2 solve."""
    r = winsize // 2
    t = pl.program_id(0)
    w_out = dx_ref.shape[1]
    inv = np.float32(1.0 / (winsize * winsize))

    # window_h is tile_h + 2r rounded up to the sublane tiling (8); the caller
    # pads the source so the over-read stays in bounds
    copy = pltpu.make_async_copy(
        m_hbm.at[:, pl.ds(t * tile_h, window_h), :], scratch, sem)
    copy.start()
    copy.wait()

    # static (python-int) slices keep Mosaic happy (dynamic sublane offsets must
    # be 8-aligned); accumulating through the scratch ref caps live temporaries
    vscratch[...] = scratch[:, 0:tile_h, :]
    for i in range(1, winsize):
        vscratch[...] = vscratch[...] + scratch[:, i:i + tile_h, :]

    hsum = vscratch[:, :, 0:w_out]
    for i in range(1, winsize):
        hsum = hsum + vscratch[:, :, i:i + w_out]
    mb = hsum * inv

    g11, g12, g22, h1, h2 = mb[0], mb[1], mb[2], mb[3], mb[4]
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    dx_ref[...] = (g11 * h2 - g12 * h1) * idet
    dy_ref[...] = (g22 * h1 - g12 * h2) * idet


@partial(jax.jit, static_argnames=("winsize",))
def box_blur_solve(M: jnp.ndarray, winsize: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ``solve_flow(box_blur5(M, winsize))`` — matches the jnp path up to
    float reassociation (same adds, different grouping)."""
    _, h, w = M.shape
    r = winsize // 2
    tile_h = 16 if h >= 16 else 8  # 8-aligned tiles/DMA offsets
    pad_h = (-h) % tile_h
    window_h = -(-(tile_h + 2 * r) // 8) * 8    # DMA row slices: 8-aligned
    wp = -(-(w + 2 * r) // 128) * 128           # DMA lane dim: 128-aligned
    extra_h = window_h - (tile_h + 2 * r)
    mp = jnp.pad(M, ((0, 0), (r, r + pad_h + extra_h), (r, wp - w - r)), mode="edge")
    n_tiles = (h + pad_h) // tile_h

    kernel = partial(_blur_solve_kernel, winsize=winsize, tile_h=tile_h,
                     window_h=window_h)
    dx, dy = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",  # tests run on the CPU mesh
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
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


def farneback_level(R0: jnp.ndarray, R1: jnp.ndarray, dx: jnp.ndarray,
                    dy: jnp.ndarray, winsize: int, iterations: int
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramid level using the fused Pallas aggregation kernel.

    The flow-compensated matrices stay on the XLA path (dominated by the warp
    gathers); the blur+solve is the Pallas kernel above.
    """
    from datmo_using_optical_flow_tpu.ops.farneback import (pack_corner_pairs,
                                                            update_matrices)

    packed = pack_corner_pairs(R1)
    M = update_matrices(R0, R1, dx, dy, packed)
    for i in range(iterations):
        dx, dy = box_blur_solve(M, winsize)
        if i < iterations - 1:
            M = update_matrices(R0, R1, dx, dy, packed)
    return dx, dy
