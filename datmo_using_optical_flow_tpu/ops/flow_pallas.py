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


# ------------------------------------------------------------ poly expansion

def _poly_exp_kernel(img_hbm, out_ref, scratch, vscratch, sem, *,
                     g: tuple[float, ...], xg: tuple[float, ...],
                     xxg: tuple[float, ...], igs: tuple[float, float, float, float],
                     tile_h: int, window_h: int):
    """One row tile of FarnebackPolyExp: image window -> 5 coefficient planes.

    Same taps, f32 casts, and ascending accumulation order (with the same
    skip-zero rules) as :func:`ops.farneback.poly_exp`; values agree up to
    FMA formation (the compiler fuses mul+add differently around the scratch
    stores — observed max ~5e-6 on the parity scenes, i.e. ~1 ulp at plane
    scale; same class of reassociation as :func:`blur_solve`).  The image is
    read once per tile and the three intermediate row planes never leave
    VMEM — the XLA path materializes them to HBM between the separable
    passes (~24 MB of round-trip traffic at 1080p).
    """
    t = pl.program_id(0)
    w_out = out_ref.shape[2]
    n2 = len(g)  # 2n + 1 taps
    ig11, ig03, ig33, ig55 = igs

    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(t * tile_h, window_h), :], scratch, sem)
    copy.start()
    copy.wait()

    # vertical pass (matches farneback.poly_exp: ascending i; xg skips its
    # zero center tap, xxg keeps it — the jnp path adds the 0-weight term)
    xg_first = next(i for i in range(n2) if xg[i] != 0.0)
    for i in range(n2):
        sl = scratch[i:i + tile_h, :]
        tg = np.float32(g[i]) * sl
        vscratch[0] = tg if i == 0 else vscratch[0] + tg
        if xg[i] != 0.0:
            txg = np.float32(xg[i]) * sl
            vscratch[1] = txg if i == xg_first else vscratch[1] + txg
        t2 = np.float32(xxg[i]) * sl
        vscratch[2] = t2 if i == 0 else vscratch[2] + t2

    # horizontal pass (matches _corr_axis: ascending taps, zero taps skipped)
    def corr(plane, taps):
        out = None
        for j in range(n2):
            # skip rule matches _corr_axis bit-for-bit: it casts taps to f32
            # BEFORE comparing, so a tap that rounds to f32 zero is skipped
            # by both paths (signed-zero-level parity; ADVICE r4)
            if np.float32(taps[j]) == np.float32(0.0):
                continue
            term = np.float32(taps[j]) * plane[:, j:j + w_out]
            out = term if out is None else out + term
        return out

    row_g, row_xg, row_xxg = vscratch[0], vscratch[1], vscratch[2]
    b1 = corr(row_g, g)
    b2 = corr(row_g, xg)
    b3 = corr(row_xg, g)
    b4 = corr(row_g, xxg)
    b5 = corr(row_xxg, g)
    b6 = corr(row_xg, xg)

    out_ref[0] = b3 * np.float32(ig11)                          # y-linear
    out_ref[1] = b2 * np.float32(ig11)                          # x-linear
    out_ref[2] = b1 * np.float32(ig03) + b5 * np.float32(ig33)  # y^2
    out_ref[3] = b1 * np.float32(ig03) + b4 * np.float32(ig33)  # x^2
    out_ref[4] = b6 * np.float32(ig55)                          # xy


def poly_exp_pallas(img: jnp.ndarray, n: int, sigma: float) -> jnp.ndarray:
    """Fused polynomial expansion -> (5, H, W); see :func:`_poly_exp_kernel`.

    Edge padding note: the jnp path pads the raw image vertically and the
    computed row planes horizontally; the vertical correlation is
    column-independent and linear, so padding the raw image on BOTH axes here
    yields bit-identical planes.
    """
    from datmo_using_optical_flow_tpu.oracle.np_farneback import prepare_gaussian

    h, w = img.shape
    g, xg, xxg, invG = prepare_gaussian(n, sigma)
    igs = (float(invG[1, 1]), float(invG[0, 3]),
           float(invG[3, 3]), float(invG[5, 5]))
    tile_h = 16 if h >= 16 else 8
    pad_h = (-h) % tile_h
    window_h = -(-(tile_h + 2 * n) // 8) * 8
    wp = -(-(w + 2 * n) // 128) * 128
    extra_h = window_h - (tile_h + 2 * n)
    imgp = jnp.pad(img.astype(jnp.float32),
                   ((n, n + pad_h + extra_h), (n, wp - w - n)), mode="edge")
    n_tiles = (h + pad_h) // tile_h

    kernel = partial(_poly_exp_kernel,
                     g=tuple(float(v) for v in g),
                     xg=tuple(float(v) for v in xg),
                     xxg=tuple(float(v) for v in xxg),
                     igs=igs, tile_h=tile_h, window_h=window_h)
    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",  # tests run on the CPU mesh
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((5, tile_h, w), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, h + pad_h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((window_h, wp), jnp.float32),
            pltpu.VMEM((3, tile_h, wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )(imgp)
    return out[:, :h]


# ------------------------------------------------------------ fused iteration
#
# One kernel per refinement iteration: warp + matrix assembly + window
# aggregation + 2x2 solve, with the M planes never leaving VMEM.  The grid
# walks row strips in a look-behind pipeline: step t warps strip t into a VMEM
# slot, then blurs/solves strip t-1 (whose vertical window spans strips
# t-2..t, all resident).  Replaces the warp_matrices -> blur_solve pair, whose
# M round trip (write 42 MB + re-read ~60 MB at 1080p) was pure HBM traffic.

FS = 32   # fused-kernel strip rows (multiple of 8; 2*warp_pallas.YOFF must be a multiple of FS's window ring slots — wh = FS + 2*YOFF with wh % FS == 0)

# Widest image the strip kernels fit in scoped VMEM for: the per-strip rings
# and M planes scale linearly with W, and at W=3840 the fused iteration's
# scoped allocation measures 17.77 MB against the 16 MB limit (r5 diag_4k
# on-chip compile failure) — ~2x the ~8.9 MB footprint at the 1920-wide
# headline shape.  Dispatchers fall back to the XLA path above this.
MAX_KERNEL_WIDTH = 2048
_TAIL = 8  # retained rows of the t-2 strip (>= winsize//2, 8-aligned)


def _fused_kernel(r1_hbm, r0_ref, dx_ref, dy_ref, odx_ref, ody_ref,
                  tail, mcur, mtmp, win, rowbuf, vcat, vacc, hcat, mbb, sem, *,
                  h: int, w: int, wp: int, ww: int, taps: tuple[float, ...],
                  scale: float, n_strips: int):
    from datmo_using_optical_flow_tpu.ops import warp_pallas

    t = pl.program_id(0)
    s = FS
    r = len(taps) // 2
    wh = s + 2 * warp_pallas.YOFF
    assert wh % s == 0, "ring window requires 2*YOFF to be a multiple of FS"
    hv = h - (n_strips - 1) * s  # valid rows in the last strip (static)

    # ---- R1 window ring (VERDICT r3 item 1: halve the window's HBM traffic) --
    # ``win`` is a wh-row ring: padded R1 row j lives at ring row j % wh, so
    # strip t's window (rows [t*s, t*s+wh)) starts at ring phase (t*s) % wh and
    # only the s NEW rows [(t+1)*s, (t+2)*s) are DMA'd per step — the old
    # full-window copy re-read every row wh/s times (2x at FS=24/YOFF=12).
    # The copy for strip t+1 starts at the END of step t (after strip t's warp
    # has consumed the rows it overwrites) and is waited at the top of step
    # t+1, so the transfer rides under the blur/solve compute.  Slot math
    # lives in warp_pallas.ring_rows (shared with the standalone warp).
    n_slots = wh // s

    @pl.when(t == 0)
    def _():
        prime = pltpu.make_async_copy(r1_hbm.at[:, pl.ds(0, wh), :], win, sem)
        prime.start()
        prime.wait()

    @pl.when((t >= 1) & (t < n_strips))
    def _():
        warp_pallas.ring_rows(r1_hbm, win, sem, t, 1, s, "wait")

    # ---- warp strip t into mtmp (skipped on the final drain step) ----
    @pl.when(t < n_strips)
    def _():
        phase = (t % n_slots) * s
        warp_pallas._warp_into(mtmp, win, r0_ref, dx_ref, dy_ref, None,
                               h=h, w=w, wp=wp, s=s, t=t, rowbuf=rowbuf,
                               phase=phase)
        replicate_last_strip_pad(mtmp, t, n_strips=n_strips, hv=hv, s=s, wp=wp)

    # ---- prefetch strip t+1's new rows (they overwrite strip t's oldest) ----
    @pl.when(t < n_strips - 1)
    def _():
        warp_pallas.ring_rows(r1_hbm, win, sem, t, 2, s, "start")

    # ---- blur + solve strip t-1 from (tail, mcur, mtmp) ----
    @pl.when(t >= 1)
    def _():
        blur_solve_strip(tail, mcur, mtmp, vcat, vacc, hcat, mbb,
                         odx_ref, ody_ref, t, taps=taps, scale=scale,
                         n_strips=n_strips, w=w, wp=wp, s=s, hv=hv)

    # ---- ring shift: tail <- mcur's last rows, mcur <- mtmp ----
    for c in range(5):
        tail[c] = mcur[c, s - _TAIL:s, :]
        mcur[c] = mtmp[c]


def replicate_last_strip_pad(mtmp, t, *, n_strips: int, hv: int, s: int,
                             wp: int):
    """Edge-replicate the LAST strip's pad rows of M right after its warp.

    The XLA blur pads M with mode="edge" (rows >= h replicate row h-1); the
    strip kernels' t==n_strips drain branch replicates for the final strip's
    OWN blur, but the blur of strip n_strips-2 also reads mtmp[0:r] — when
    the last strip has fewer valid rows than the blur radius (h % FS < r),
    rows hv..r-1 would otherwise be the warp's zeros.  Idempotent with the
    drain-branch replication."""
    if hv < s:
        @pl.when(t == n_strips - 1)
        def _():
            for c in range(5):
                mtmp[c] = jnp.concatenate(
                    [mtmp[c, 0:hv, :],
                     jnp.broadcast_to(mtmp[c, hv - 1:hv, :], (s - hv, wp))],
                    axis=0)


def blur_solve_strip(tail, mcur, mtmp, vcat, vacc, hcat, mbb, odx_ref, ody_ref,
                     t, *, taps: tuple[float, ...], scale: float, n_strips: int,
                     w: int, wp: int, s: int, hv: int):
    """Window-aggregate + 2x2 solve of strip ``t - 1`` from the three-strip
    M ring (tail of t-2, mcur = t-1, mtmp = t), writing the flow components.
    ``t`` is the LEVEL-LOCAL warp strip index (caller guards t >= 1).

    A hybrid log-tree aggregation (pairwise-doubling sliding sums on interior
    strips/columns, exact cv2-order borders; ~2x fewer VPU adds) was built
    and A/B'd on chip in r4 and REMOVED: 44.87 ms vs 45.22 ms for 5 chained
    fused iterations at 1080p (same process, max flow diff 4.7e-5 px) — the
    blur's adds ride under the strip DMA, so halving them buys <1% while
    complicating the hottest kernel (BENCHMARKS.md r4)."""
    r = len(taps) // 2

    # edge replication (BORDER_REPLICATE semantics of the unfused path,
    # ops/farneback.py:box_blur5): above row 0 / below row h-1 the window
    # replicates the edge M row.  Full-block ref rewrites keep the
    # accumulation below unconditional (and sublane-aligned).
    @pl.when(t == 1)
    def _():
        for c in range(5):
            tail[c] = jnp.concatenate(
                [tail[c, 0:_TAIL - r, :],
                 jnp.broadcast_to(mcur[c, 0:1, :], (r, wp))], axis=0)

    @pl.when(t == n_strips)
    def _():
        for c in range(5):
            if hv < s:
                mcur[c] = jnp.concatenate(
                    [mcur[c, 0:hv, :],
                     jnp.broadcast_to(mcur[c, hv - 1:hv, :], (s - hv, wp))],
                    axis=0)
            mtmp[c] = jnp.concatenate(
                [jnp.broadcast_to(mcur[c, hv - 1:hv, :], (r, wp)),
                 mtmp[c, r:s, :]], axis=0)

    winsize = len(taps)

    def term(x, wgt):
        return x if wgt == 1.0 else np.float32(wgt) * x

    # per channel: vertical pass (output row i aggregates logical rows
    # i-r..i+r of strip t-1: rows [-r, 0) live in tail[-r:], [0, s) in
    # mcur, [s, s+r) in mtmp[:r]), then the horizontal pass with
    # edge-replicated columns.  Taps accumulate in ascending order for BOTH
    # box and Gaussian windows — the exact f32 grouping of the XLA path's
    # box_blur5/gauss_blur5 (ops/farneback.py:304-319).  A log-tree window
    # sum was ~2x fewer VPU adds but its different grouping blew past the
    # EPE budget on ill-conditioned border pixels (0.12 px vs cv2; see
    # BENCHMARKS.md "Flow accuracy") — cv2-order arithmetic everywhere
    # keeps the whole fused path at the exact path's accuracy level.
    # Each pass stages its window ONCE into a contiguous scratch (vcat /
    # hcat) and accumulates static slices of it: same values and add order
    # as slicing the pieces per tap, but ~winsize x fewer concat ops in
    # the Mosaic IR (compile time) and bounded live temporaries (the
    # scoped-VMEM stack).
    for c in range(5):
        vcat[...] = jnp.concatenate(
            [tail[c, _TAIL - r:_TAIL, :], mcur[c], mtmp[c, 0:r, :],
             jnp.zeros((vcat.shape[0] - (s + 2 * r), wp), jnp.float32)],
            axis=0)
        for k in range(winsize):
            contrib = term(vcat[k:k + s, :], taps[k])
            vacc[...] = contrib if k == 0 else vacc[...] + contrib

        hcat[...] = jnp.concatenate(
            [jnp.broadcast_to(vacc[:, 0:1], (s, r)), vacc[:, 0:w],
             jnp.broadcast_to(vacc[:, w - 1:w], (s, hcat.shape[1] - w - r))],
            axis=1)
        for k in range(winsize):
            contrib = term(hcat[:, k:k + w], taps[k])
            mbb[c] = contrib if k == 0 else mbb[c] + contrib

    g11 = mbb[0] * np.float32(scale)
    g12 = mbb[1] * np.float32(scale)
    g22 = mbb[2] * np.float32(scale)
    h1 = mbb[3] * np.float32(scale)
    h2 = mbb[4] * np.float32(scale)
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    vx = (g11 * h2 - g12 * h1) * idet
    vy = (g22 * h1 - g12 * h2) * idet
    if odx_ref.shape[1] == w:
        odx_ref[...] = vx
        ody_ref[...] = vy
    else:
        # wider (lane-padded) refs: pad columns are written ZERO so a
        # downstream warp's shift bounds stay well-behaved (matching the
        # padded HBM inputs)
        zpad = jnp.zeros((s, odx_ref.shape[1] - w), jnp.float32)
        odx_ref[...] = jnp.concatenate([vx, zpad], axis=1)
        ody_ref[...] = jnp.concatenate([vy, zpad], axis=1)


def fused_iteration(R0: jnp.ndarray, R1_padded: jnp.ndarray, dx: jnp.ndarray,
                    dy: jnp.ndarray, winsize: int, gaussian: bool
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One full refinement iteration (update_matrices + blur + solve) as a
    single look-behind Pallas kernel; M stays in VMEM.  ``R1_padded`` from
    ``warp_pallas._pad_r1(R1, s=FS)`` (shared across the level's iterations).
    Matches ``blur_solve(warp_matrices(...), winsize)`` up to f32 grouping."""
    from datmo_using_optical_flow_tpu.ops import warp_pallas

    _, h, w = R0.shape
    s = FS
    n_strips = -(-h // s)
    hp = n_strips * s
    wp = -(-w // 128) * 128
    ww = R1_padded.shape[2]
    r = winsize // 2
    if gaussian:
        taps = _gauss_taps(winsize)
        scale = 1.0
    else:
        taps = (1.0,) * winsize
        scale = 1.0 / (winsize * winsize)

    def pad_hw(x):
        return jnp.pad(x, ((0, hp - h), (0, wp - w)))

    r0p = jnp.pad(R0, ((0, 0), (0, hp - h), (0, wp - w)))

    kernel = partial(_fused_kernel, h=h, w=w, wp=wp, ww=ww, taps=taps,
                     scale=scale, n_strips=n_strips)
    odx, ody = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        # the cv2-order sequential blur's unrolled tap accumulation keeps more
        # concat temporaries live than the old log-tree (18.4 MB peak scoped
        # VMEM at 1080p vs the 16 MB default limit); v5e has 128 MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024),
        grid=(n_strips + 1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((5, s, wp),
                               lambda t: (0, jnp.minimum(t, n_strips - 1), 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((s, wp),
                               lambda t: (jnp.minimum(t, n_strips - 1), 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((s, wp),
                               lambda t: (jnp.minimum(t, n_strips - 1), 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((s, w), lambda t: (jnp.maximum(t - 1, 0), 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((s, w), lambda t: (jnp.maximum(t - 1, 0), 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((hp, w), jnp.float32),
                   jax.ShapeDtypeStruct((hp, w), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((5, _TAIL, wp), jnp.float32),  # tail of strip t-2
            pltpu.VMEM((5, s, wp), jnp.float32),      # mcur (strip t-1)
            pltpu.VMEM((5, s, wp), jnp.float32),      # mtmp (strip t)
            pltpu.VMEM((5, s + 2 * warp_pallas.YOFF, ww), jnp.float32),  # win
            pltpu.VMEM((5, -(-(s + 1) // 8) * 8, ww), jnp.float32),  # rowbuf
            pltpu.VMEM((-(-(s + 2 * r) // 8) * 8, wp), jnp.float32),  # vcat
            pltpu.VMEM((s, wp), jnp.float32),     # vacc (vertical blur acc)
            pltpu.VMEM((s, -(-(w + 2 * r) // 128) * 128), jnp.float32),  # hcat
            pltpu.VMEM((5, s, w), jnp.float32),   # mbb (blurred M channels)
            pltpu.SemaphoreType.DMA,
        ],
    )(R1_padded, r0p, pad_hw(dx), pad_hw(dy))
    return odx[:h], ody[:h]


def farneback_level(R0: jnp.ndarray, R1: jnp.ndarray, dx: jnp.ndarray,
                    dy: jnp.ndarray, winsize: int, iterations: int,
                    gaussian: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Pyramid level on the Pallas path: each refinement iteration is ONE
    fused warp+aggregate+solve kernel (:func:`fused_iteration`; M planes never
    leave VMEM), with an in-graph fallback to the packed-gather XLA warp +
    blur/solve kernel when the flow exceeds the warp window.

    Small levels stay entirely on the XLA packed-gather path — their gathers
    are cheap and the strip-grid overhead would dominate.

    A K-iteration wavefront variant (all iterations in one pallas_call,
    R0/R1 read once, intermediate flows VMEM-resident) was built and A/B'd
    on chip in r4 and REMOVED: 11.99 ms vs 11.2 ms for 5 chained fused
    iterations at 1080p.  The level is VPU-compute-bound, not HBM-bound
    (5x chained moves ~595 MB at only ~53 GB/s effective while the
    standalone warp demonstrates ~85 GB/s), so the wavefront's traffic
    savings buy nothing and its (K-1)/n_strips fill/drain bubbles cost ~7%.
    The FLOP:byte ratio of this 1/10-scale chip matches a production v5e,
    so the result carries over (BENCHMARKS.md r4).
    """
    from datmo_using_optical_flow_tpu.ops import warp_pallas
    from datmo_using_optical_flow_tpu.ops.farneback import (pack_corner_pairs,
                                                            update_matrices)

    _, h, w = R0.shape
    if warp_pallas.eligible(h, w):
        r1p = warp_pallas._pad_r1(R1, s=FS)

        def step(dxi, dyi):
            def fast(args):
                return fused_iteration(R0, r1p, args[0], args[1], winsize,
                                       gaussian)

            def slow(args):
                m = update_matrices(R0, R1, *args, pack_corner_pairs(R1))
                return blur_solve(m, winsize, gaussian)

            return jax.lax.cond(warp_pallas.flow_in_range(dxi, dyi),
                                fast, slow, (dxi, dyi))

        for _ in range(iterations):
            dx, dy = step(dx, dy)
        return dx, dy

    packed = pack_corner_pairs(R1)

    def um(dxi, dyi):
        return update_matrices(R0, R1, dxi, dyi, packed)

    M = um(dx, dy)
    for i in range(iterations):
        dx, dy = blur_solve(M, winsize, gaussian)
        if i < iterations - 1:
            M = um(dx, dy)
    return dx, dy
