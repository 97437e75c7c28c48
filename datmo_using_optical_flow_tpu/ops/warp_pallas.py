"""Pallas shift-decomposition warp for Farnebäck update_matrices.

Replaces the per-pixel XLA gather in the flow-compensated matrix computation
(``ops/farneback.py:update_matrices``; reference kernel
``cv2.calcOpticalFlowFarneback``, ``Optical_flow/main.py:142``).  XLA gathers
on this TPU are issue-bound at ~5 ns/index regardless of row width, putting a
~12 ms floor per 1080p warp; this kernel instead exploits that optical-flow
fields are piecewise smooth: the bilinear warp

    r[c, i, j] = bilinear(R1[c], i + dy[i,j], j + dx[i,j])

decomposes into integer shifts ``(a, b) = (floor dy, floor dx)`` whose distinct
values per row-strip are few.  Per row-strip, the kernel DMAs an R1 window
into VMEM, loops ``a`` over the strip's actual floor(dy) range (row-roll, a
proven-fast dynamic op on this backend — dynamic ``pl.ds`` offsets do not
compile), and for each ``a`` loops ``b`` over the masked floor(dx) range
(lane-roll), accumulating mask-weighted bilinear corners.  Smooth scenes
execute a handful of (a, b) blocks per strip-chunk; the shifts never touch
HBM.  Measured: 1.30 ms/warp at 1080p (ring-DMA window + 512-lane column
chunking) vs 12 ms for the packed single-gather path, exact to f32 roundoff
(no int16/int8 quantization like ``fast_warp``).

The full update_matrices algebra (inside mask, OpenCV border attenuation, the
normal-equation planes M) is fused in, so one kernel reads (R0, R1-window,
flow) and writes M — nothing else hits HBM.

Displacement capability: floor(dy) in [-YOFF, YOFF-2] = [-12, 10], floor(dx)
in [-64, 62] (window margins; YOFF sized so realistic inter-frame motion plus
coarse-to-fine overshoot stays on the exact fast path).  ``update_matrices_auto`` guards with an in-graph
``lax.cond``: out-of-range flow falls back to the packed-gather path, so
semantics hold for any input.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from datmo_using_optical_flow_tpu.oracle.np_farneback import BORDER, BORDER_ATTEN

S = 32            # rows per strip
YOFF = 16         # window top margin: floor(dy) in [-YOFF, YOFF-2]
XOFF = 64         # window left margin: floor(dx) in [-XOFF, XOFF-2]
WH = S + 2 * YOFF  # window rows (= 2*S: the ring-DMA slot math needs WH % S == 0)
# clip bounds for the shift loops (geometric capability of the window)
AMIN, AMAX = -YOFF, YOFF - 2
BMIN, BMAX = -XOFF, XOFF - 2
# Column-chunked inner loops: the strip is processed in CHUNK-lane column
# chunks, each looping only over ITS OWN floor-shift ranges — flow fields are
# spatially smooth, so a shift present in one image region rolls / mask-tests
# / accumulates only those columns.  Bit-exact vs the old full-width form
# (each pixel's four corner FMAs happen in ONE visit to its own (a, b) cell;
# other cells add mask-zeroed terms, so the per-pixel FMA chain is unchanged).
# On-chip A/B at 1080p with converged real flow (benchmarks/ab_warp_chunk.py,
# r4): full-width 2.34 / 512 -> 1.66 ms per fused iteration, standalone warp
# 1.90 -> 1.30 ms, max diff 0.0; 768/384/256 all slower than 512.  The win is
# the chunk x shift sparsity: a (a, b) block pays rolls and masked FMAs only
# where that shift actually occurs, which beats the extra per-chunk row rolls.
CHUNK = 512


def _axis_atten(idx_f: jnp.ndarray, size: int) -> jnp.ndarray:
    """OpenCV's BORDER-pixel certainty attenuation along one axis, from a float
    index plane (matches ops/farneback.py:_border_scale)."""
    near = jnp.minimum(idx_f, np.float32(size - 1) - idx_f)
    out = jnp.ones_like(idx_f)
    for k in range(BORDER - 1, -1, -1):
        out = jnp.where(near <= k + 0.5, np.float32(BORDER_ATTEN[k]), out)
    return out


def _warp_into(m_ref, win, r0_ref, dx_ref, dy_ref, copy, *, h: int, w: int,
               wp: int, s: int, t, rowbuf=None, phase=None,
               clip_ref=None):
    """Shift-decomposition warp + update_matrices algebra for one ``s``-row
    strip starting at row ``t*s``; writes the five M planes into ``m_ref``
    (any (5, s, wp)-shaped ref).  ``copy`` is the in-flight R1-window DMA
    (waited after the flow weights are derived).  Shared by the standalone
    warp kernel below and the fused warp+blur+solve kernel
    (:func:`ops.flow_pallas.fused_iteration`).

    ``phase`` (traced int32, default 0): ring offset of the window buffer —
    window row k lives at ``win`` row ``(phase + k) % win_rows``.  The shift
    rolls are circular anyway, so a ring-buffered window costs nothing here.

    ``rowbuf`` (optional (5, >=s+1, >=window-cols) scratch): stage the per-``a`` row roll
    once and lane-roll from it per ``b`` — halves the scoped-VMEM peak of the
    inner loop (one window-sized temporary instead of two), which the fused
    kernel needs to stay under the 16 MB budget.

    ``copy`` may be ``None`` when the caller already waited for the window
    (double-buffered prefetch in the fused kernel)."""
    dx = dx_ref[...]
    dy = dy_ref[...]
    wh = win.shape[1]
    gi = (t * s + jax.lax.broadcasted_iota(jnp.int32, (s, wp), 0)).astype(jnp.float32)
    gj = jax.lax.broadcasted_iota(jnp.int32, (s, wp), 1).astype(jnp.float32)
    # cv2/XLA-order weight arithmetic (ops/farneback.py:update_matrices):
    # floor/frac of the ABSOLUTE position j+dx, not the displacement — in f32
    # the two differ by ~j*2^-24 in the fractional weight, which the
    # attenuated border pixels' ill-conditioned 2x2 systems amplify ~1000x
    # (the round-2 0.12 px excursion traced to exactly this)
    gx = gj + dx
    gy = gi + dy
    x1a = jnp.floor(gx)
    y1a = jnp.floor(gy)
    fx = gx - x1a
    fy = gy - y1a
    x1 = x1a - gj   # integer shift fields for the (a, b) decomposition
    y1 = y1a - gi
    a00 = (1 - fy) * (1 - fx)
    a01 = (1 - fy) * fx
    a10 = fy * (1 - fx)
    a11 = fy * fx

    inside = (x1a >= 0) & (x1a < w - 1) & (y1a >= 0) & (y1a < h - 1)

    if clip_ref is not None:
        # in-kernel out-of-range detection (for callers whose flows cannot
        # be range-checked outside): a clipped shift only corrupts INSIDE
        # pixels (outside ones take the r0 fallback regardless), so flag
        # exactly those — the caller recomputes the whole level on the exact
        # path when any strip flags.
        oob = ((y1 < AMIN) | (y1 > AMAX) | (x1 < BMIN) | (x1 > BMAX)) & inside

        @pl.when(jnp.any(oob))
        def _():
            clip_ref[0, 0] = jnp.int32(1)

    # clip shifts to window capability (out-of-range pixels are ~inside or the
    # caller took the fallback branch)
    y1 = jnp.clip(y1, AMIN, AMAX)
    x1 = jnp.clip(x1, BMIN, BMAX)

    # warped-R1 accumulators live in m_ref (reused before final assembly)
    for c in range(5):
        m_ref[c] = jnp.zeros((s, wp), jnp.float32)
    if copy is not None:
        copy.wait()

    for j0 in range(0, wp, CHUNK):
        ch = min(CHUNK, wp - j0)
        chw = ch + 2 * XOFF          # window columns this chunk reads
        y1c = y1[:, j0:j0 + ch]
        x1c = x1[:, j0:j0 + ch]
        a00c = a00[:, j0:j0 + ch]
        a01c = a01[:, j0:j0 + ch]
        a10c = a10[:, j0:j0 + ch]
        a11c = a11[:, j0:j0 + ch]
        alo = jnp.min(y1c).astype(jnp.int32)
        ahi = jnp.max(y1c).astype(jnp.int32)

        def body_a(a, _, *, j0=j0, ch=ch, chw=chw, y1c=y1c, x1c=x1c,
                   a00c=a00c, a01c=a01c, a10c=a10c, a11c=a11c):
            ma = y1c == a.astype(jnp.float32)

            @pl.when(jnp.any(ma))
            def _():
                blo = jnp.min(jnp.where(ma, x1c, jnp.inf)).astype(jnp.int32)
                bhi = jnp.max(jnp.where(ma, x1c, -jnp.inf)).astype(jnp.int32)
                off = YOFF + a if phase is None else phase + YOFF + a
                shift = (wh - off) % wh
                if rowbuf is not None:
                    nb = rowbuf.shape[1]
                    rowbuf[:, :, :chw] = pltpu.roll(
                        win[:, :, j0:j0 + chw], shift, 1)[:, :nb, :]

                def body_b(b, __):
                    # [blo, bhi] can have gaps (no pixel with this (a, b)
                    # shift — e.g. background at b=0 plus one object at b=5):
                    # testing the mask (~3 VPU passes) before the ~25-pass
                    # accumulate skips empty blocks
                    mbm = ma & (x1c == b.astype(jnp.float32))

                    @pl.when(jnp.any(mbm))
                    def _():
                        # lane l of the rolled chunk reads window column
                        # j0 + l + XOFF + b; l + XOFF + b <= ch + 126 < chw
                        # for b <= BMAX, so the circular roll never wraps
                        # into the lanes consumed below
                        bshift = (chw - (XOFF + b)) % chw
                        if rowbuf is not None:
                            p = pltpu.roll(rowbuf[:, :, :chw], bshift, 2)
                        else:
                            # without rowbuf: recompute the row roll per b
                            # (the standalone kernel's out-block budget has
                            # no room for the scratch)
                            p = pltpu.roll(
                                pltpu.roll(win[:, :, j0:j0 + chw],
                                           shift, 1)[:, :s + 1, :],
                                bshift, 2)
                        mb = mbm.astype(jnp.float32)
                        u00 = a00c * mb
                        u01 = a01c * mb
                        u10 = a10c * mb
                        u11 = a11c * mb
                        for c in range(5):
                            m_ref[c, :, j0:j0 + ch] = (
                                m_ref[c, :, j0:j0 + ch]
                                + u00 * p[c, :s, :ch]
                                + u01 * p[c, :s, 1:ch + 1]
                                + u10 * p[c, 1:s + 1, :ch]
                                + u11 * p[c, 1:s + 1, 1:ch + 1])
                    return 0

                jax.lax.fori_loop(blo, bhi + 1, body_b, 0)
            return 0

        jax.lax.fori_loop(alo, ahi + 1, body_a, 0)

    _warp_epilogue(m_ref, r0_ref, dx, dy, inside, gi, gj, h=h, w=w)


def _warp_epilogue(m_ref, r0_ref, dx, dy, inside, gi, gj, *, h: int, w: int):
    """update_matrices algebra (ops/farneback.py:283-301), fused: turn the
    accumulated warped-R1 planes in ``m_ref`` into the five M planes."""
    r0 = r0_ref[...]
    r2 = jnp.where(inside, m_ref[0], 0.0)
    r3 = jnp.where(inside, m_ref[1], 0.0)
    r4 = jnp.where(inside, (r0[2] + m_ref[2]) * 0.5, r0[2])
    r5 = jnp.where(inside, (r0[3] + m_ref[3]) * 0.5, r0[3])
    r6 = jnp.where(inside, (r0[4] + m_ref[4]) * 0.25, r0[4] * 0.5)
    r2 = (r0[0] - r2) * 0.5
    r3 = (r0[1] - r3) * 0.5
    r2 = r2 + r4 * dy + r6 * dx
    r3 = r3 + r6 * dy + r5 * dx

    scale = _axis_atten(gi, h) * _axis_atten(gj, w)
    r2 = r2 * scale
    r3 = r3 * scale
    r4 = r4 * scale
    r5 = r5 * scale
    r6 = r6 * scale
    m_ref[0] = r4 * r4 + r6 * r6
    m_ref[1] = (r4 + r5) * r6
    m_ref[2] = r5 * r5 + r6 * r6
    m_ref[3] = r4 * r2 + r6 * r3
    m_ref[4] = r6 * r2 + r5 * r3


def ring_rows(r1_hbm, win, sem, t, k, s: int, action: str):
    """Ring-window DMA dispatch shared by this kernel and the fused flow
    kernel (ops/flow_pallas._fused_kernel): padded R1 row j lives at ring row
    ``j % wh`` (``wh = win rows``, a multiple of the strip height ``s``), so
    the s NEW rows of grid step ``t + k`` — rows ``[(t+k)*s, (t+k+1)*s)`` —
    always land in slot ``(t+k) % (wh // s)``.  ``action`` starts or waits
    the copy; start/wait pairs are constructed identically on both sides of
    the grid-step boundary (the standard Pallas cross-step DMA idiom).  Keep
    the slot arithmetic HERE only: a divergent copy in one kernel would
    silently read stale window rows."""
    n_slots = win.shape[1] // s
    for slot in range(n_slots):
        @pl.when((t + k) % n_slots == slot)
        def _():
            c = pltpu.make_async_copy(
                r1_hbm.at[:, pl.ds((t + k) * s, s), :],
                win.at[:, slot * s:(slot + 1) * s, :], sem)
            c.start() if action == "start" else c.wait()


def _kernel(r1_hbm, r0_ref, dx_ref, dy_ref, m_ref, win, rowbuf, sem,
            *, h: int, w: int, wp: int, ww: int, n_strips: int):
    """One strip with a ring-buffered R1 window: only the S NEW rows per strip
    are DMA'd, and that copy is started one grid step ahead (after the
    previous strip's last read of the slot it overwrites) so it rides under a
    full strip of compute + the M write-back.  The old form started AND
    waited the full 2.3 MB window copy inside the same strip — ~10 us/strip
    of exposed DMA, measured as ~45% of the warp's 1.47 ms at 1080p."""
    t = pl.program_id(0)
    n_slots = WH // S  # = 2

    @pl.when(t == 0)
    def _():
        prime = pltpu.make_async_copy(r1_hbm.at[:, pl.ds(0, WH), :], win, sem)
        prime.start()
        prime.wait()

    @pl.when(t >= 1)
    def _():
        ring_rows(r1_hbm, win, sem, t, 1, S, "wait")

    _warp_into(m_ref, win, r0_ref, dx_ref, dy_ref, None,
               h=h, w=w, wp=wp, s=S, t=t, rowbuf=rowbuf,
               phase=(t % n_slots) * S)

    # prefetch the next strip's new rows: they overwrite the slot this strip
    # just finished reading, and the copy overlaps the M write-back plus the
    # next strip's weight computation
    @pl.when(t < n_strips - 1)
    def _():
        ring_rows(r1_hbm, win, sem, t, 2, S, "start")


@partial(jax.jit, static_argnames=("s",))
def _pad_r1(R1: jnp.ndarray, s: int = S) -> jnp.ndarray:
    """Zero-pad R1 (5, h, w) to the window layout (5, Hp + 2*YOFF, WW)."""
    _, h, w = R1.shape
    hp = -(-h // s) * s
    ww = -(-(w + 2 * XOFF) // 128) * 128
    return jnp.pad(R1, ((0, 0), (YOFF, YOFF + hp - h), (XOFF, ww - w - XOFF)))


def warp_matrices(R0: jnp.ndarray, R1_padded: jnp.ndarray, dx: jnp.ndarray,
                  dy: jnp.ndarray) -> jnp.ndarray:
    """Fused shift-decomposition warp + matrix assembly -> M (5, h, w).

    ``R1_padded`` must come from :func:`_pad_r1` (shared across the level's
    iterations).  Assumes floor(dy) in [AMIN, AMAX] and floor(dx) in
    [BMIN, BMAX] for all inside-image pixels; see :func:`update_matrices_auto`
    for the guarded version.
    """
    _, h, w = R0.shape
    hp = -(-h // S) * S
    wp = -(-w // 128) * 128
    ww = R1_padded.shape[2]
    n_tiles = hp // S

    def pad_hw(x):
        return jnp.pad(x, ((0, hp - h), (0, wp - w)))

    r0p = jnp.pad(R0, ((0, 0), (0, hp - h), (0, wp - w)))

    kernel = partial(_kernel, h=h, w=w, wp=wp, ww=ww, n_strips=n_tiles)
    m = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        # the WH=2S ring window + rowbuf staging push scoped VMEM past the
        # 16 MB default; v5e has 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=40 * 1024 * 1024),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((5, S, wp), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((S, wp), lambda t: (t, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((S, wp), lambda t: (t, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((5, S, wp), lambda t: (0, t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((5, WH, ww), jnp.float32),
                        pltpu.VMEM((5, -(-(S + 1) // 8) * 8, ww), jnp.float32),
                        pltpu.SemaphoreType.DMA],
        out_shape=jax.ShapeDtypeStruct((5, hp, wp), jnp.float32),
    )(R1_padded, r0p, pad_hw(dx), pad_hw(dy))
    return m[:, :h, :w]


def flow_in_range(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Scalar bool: every pixel's integer displacement fits the window.

    Mirrors the kernel's absolute-position arithmetic (floor(j+dx)-j), which
    can differ from floor(dx) by 1 at knife-edge fractions."""
    h, w = dx.shape
    gj = jnp.arange(w, dtype=jnp.float32)[None, :]
    gi = jnp.arange(h, dtype=jnp.float32)[:, None]
    x1 = jnp.floor(gj + dx) - gj
    y1 = jnp.floor(gi + dy) - gi
    return ((jnp.min(y1) >= AMIN) & (jnp.max(y1) <= AMAX)
            & (jnp.min(x1) >= BMIN) & (jnp.max(x1) <= BMAX))


def eligible(h: int, w: int) -> bool:
    """Pallas warp pays off only when the gather count is large; small pyramid
    levels stay on the XLA path (their gathers are cheap and strip padding
    overhead would dominate)."""
    return h >= 128 and w >= 256
