"""Multi-iteration wavefront kernel for the Farnebäck refinement loop.

The per-iteration fused kernel (ops/flow_pallas.fused_iteration) is
bandwidth-bound: every iteration re-reads the full R0 and padded-R1 planes
(~92 MB at 1080p) and round-trips dx/dy through HBM.  This kernel runs K
refinement iterations of one pyramid level in a SINGLE pallas_call as a
software pipeline over row strips: at grid step g, iteration level k warps
strip ``g - k`` and blur/solves strip ``g - k - 1`` — a wavefront skewed one
strip per level.  Consequences:

* R0 and padded R1 are read from HBM ONCE for all K iterations: R0 rows live
  in a (K+1)-slot VMEM ring indexed directly by each level; R1 rows are
  DMA'd once into a shared (K+3)-slot VMEM ring and fanned out to per-level
  64-row window rings by VMEM->VMEM copies (the shift-decomposition warp
  needs a compact ring for its cheap rolls).
* Intermediate flows never touch HBM: level k-1's blur of strip t and level
  k's warp of strip t happen at the SAME grid step (k-1 is processed first),
  through a single (s, w) VMEM buffer per level boundary.

Arithmetic is IDENTICAL to fused_iteration per level (same _warp_into, same
blur_solve_strip helper) — only the schedule changes — so results are
bit-equal to K chained fused_iteration calls (pinned by
tests/test_flow_wavefront.py).  Exactness under large flows: _warp_into
flags any inside-pixel shift that exceeds the warp window (intermediate
flows cannot be range-checked outside the kernel); the wrapper returns the
flag and ``farneback_level`` falls back to the exact packed-gather path for
the whole level when it fires.

Reference kernel: ``cv2.calcOpticalFlowFarneback``
(``Optical_flow/main.py:132-142``).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Opt-in until the target chip validates the VMEM footprint + schedule
# (flip the default after the on-chip A/B; DATMO_WAVEFRONT=0/1 overrides).
ENABLED = os.environ.get("DATMO_WAVEFRONT", "0") == "1"
# Iterations fused per pallas_call: VMEM scales ~linearly with K (rings, M
# state, windows; ~55 MB at 1080p/K=5).  If the chip rejects the footprint,
# lower MAX_K (e.g. 3 -> ~33 MB) — farneback_level then runs ceil(iters/K)
# passes, each still reading R0/R1 once.
# clamped: 0/negative would make farneback_level's chunking loop never
# decrement (trace-time hang)
MAX_K = max(1, int(os.environ.get("DATMO_WAVEFRONT_K", "5")))

from datmo_using_optical_flow_tpu.ops import warp_pallas
from datmo_using_optical_flow_tpu.ops.flow_pallas import (
    FS, _TAIL, _gauss_taps, blur_solve_strip, replicate_last_strip_pad)

# VMEM budget at 1080p/K=5 is ~55 MB of rings+windows+temps; the chip's
# physical VMEM must cover it (the guide's 16 MB is the scheduling default,
# not the capacity).  Lower K if the backend rejects the limit.
_VMEM_LIMIT = 100 * 1024 * 1024


def _wave_kernel(r1_hbm, r0_hbm, dx0_ref, dy0_ref, odx_ref, ody_ref, flag_ref,
                 *sc, h: int, w: int, wp: int, ww: int,
                 taps: tuple[float, ...], scale: float, n_strips: int, K: int):
    # flat scratch unpacking (pallas scratch lists are flat)
    it = iter(sc)
    r1big = next(it)
    r0ring = next(it)
    wins = [next(it) for _ in range(K)]
    flows = [next(it) for _ in range(2 * (K - 1))]
    tails = [next(it) for _ in range(K)]
    mcurs = [next(it) for _ in range(K)]
    mtmps = [next(it) for _ in range(K)]
    rowbuf, vcat, vacc, hcat, mbb, sems = (next(it) for _ in range(6))

    g = pl.program_id(0)
    s = FS
    r1s = K + 3                     # R1 ring slots (overwrite-safety margin)
    r0s = K + 1
    hv = h - (n_strips - 1) * s     # valid rows of the last strip (static)

    # single (1, 1) SMEM accumulator with a CONSTANT index map (Mosaic rejects
    # grid-blocked (1, 1) slices of a (grid, 1) array): init once, sticky-set
    # by any grid step's out-of-range detection
    @pl.when(g == 0)
    def _():
        flag_ref[0, 0] = jnp.int32(0)

    def r1_strip_copy(j, sem):
        """HBM padded-R1 rows [j*s, (j+1)*s) -> big ring slot j % r1s."""
        slot = j % r1s
        return pltpu.make_async_copy(
            r1_hbm.at[:, pl.ds(j * s, s), :],
            r1big.at[:, pl.ds(slot * s, s), :], sem)

    def r0_strip_copy(j, sem):
        slot = j % r0s
        return pltpu.make_async_copy(
            r0_hbm.at[:, pl.ds(j * s, s), :], r0ring.at[slot], sem)

    def win_copy(k, j, sem):
        """Big ring strip j -> level-k window slot j % 2 (VMEM->VMEM)."""
        slot = j % r1s
        wslot = j % 2
        return pltpu.make_async_copy(
            r1big.at[:, pl.ds(slot * s, s), :],
            wins[k].at[:, pl.ds(wslot * s, s), :], sem)

    # ---- pipeline priming / steady-state ring feeds --------------------
    @pl.when(g == 0)
    def _():
        c = r0_strip_copy(0, sems.at[K + 2])
        c.start()
        c.wait()
        if n_strips > 1:    # strip 2 exists in the padded R1 whenever the
            c2 = r1_strip_copy(2, sems.at[K + 2])   # windows reach it
            c2.start()
            c2.wait()

    # the padded R1 has n_strips + 1 strips (the 2*YOFF tail rows _pad_r1
    # appends are exactly one strip at WH = 2*FS); windows of the last image
    # strip read into that padded tail
    n_pstrips = n_strips + 1

    @pl.when((g >= 1) & (g < n_strips))
    def _():
        r0_strip_copy(g, sems.at[0]).wait()      # started at end of step g-1

    @pl.when((g >= 1) & (g + 2 < n_pstrips))
    def _():
        r1_strip_copy(g + 2, sems.at[1]).wait()  # started at end of step g-1

    # ---- per-level wavefront -------------------------------------------
    for k in range(K):
        t = g - k                                 # level-local strip index

        @pl.when(t == 0)
        def _(k=k):
            # window prime: the first two strips, straight from HBM (once
            # per level; the steady-state rows come from the shared ring)
            c = pltpu.make_async_copy(
                r1_hbm.at[:, pl.ds(0, 2 * s), :], wins[k], sems.at[K + 2])
            c.start()
            c.wait()

        @pl.when((t >= 1) & (t < n_strips))
        def _(k=k, t=t):
            win_copy(k, t + 1, sems.at[2 + k]).wait()  # started prev step

        @pl.when((t >= 0) & (t < n_strips))
        def _(k=k, t=t):
            dxr = dx0_ref if k == 0 else flows[2 * (k - 1)]
            dyr = dy0_ref if k == 0 else flows[2 * (k - 1) + 1]
            warp_pallas._warp_into(
                mtmps[k], wins[k], r0ring.at[t % r0s], dxr, dyr, None,
                h=h, w=w, wp=wp, ww=ww, s=s, t=t, rowbuf=rowbuf,
                phase=(t % 2) * s, clip_ref=flag_ref)
            replicate_last_strip_pad(mtmps[k], t, n_strips=n_strips, hv=hv,
                                     s=s, wp=wp)

        @pl.when((t >= 1) & (t <= n_strips))
        def _(k=k, t=t):
            od = odx_ref if k == K - 1 else flows[2 * k]
            oy = ody_ref if k == K - 1 else flows[2 * k + 1]
            blur_solve_strip(tails[k], mcurs[k], mtmps[k], vcat, vacc, hcat,
                             mbb, od, oy, t, taps=taps, scale=scale,
                             n_strips=n_strips, w=w, wp=wp, s=s, hv=hv)

        # M ring shift (pre-/post-range shifts move garbage — harmless)
        for c in range(5):
            tails[k][c] = mcurs[k][c, s - _TAIL:s, :]
            mcurs[k][c] = mtmps[k][c]

        # prefetch the level's next new window rows from the big ring
        @pl.when((t >= 0) & (t < n_strips - 1))
        def _(k=k, t=t):
            win_copy(k, t + 2, sems.at[2 + k]).start()

    # ---- end-of-step HBM ring feeds ------------------------------------
    @pl.when(g + 1 < n_strips)
    def _():
        r0_strip_copy(g + 1, sems.at[0]).start()

    @pl.when(g + 3 < n_pstrips)
    def _():
        r1_strip_copy(g + 3, sems.at[1]).start()


def wavefront_iterations(R0: jnp.ndarray, R1_padded: jnp.ndarray,
                         dx: jnp.ndarray, dy: jnp.ndarray, winsize: int,
                         iterations: int, gaussian: bool
                         ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K refinement iterations in one kernel.  Returns ``(dx, dy, exceeded)``
    — ``exceeded`` (bool scalar) means some intermediate flow left the warp
    window and the results are NOT exact: the caller must fall back.
    ``R1_padded`` from ``warp_pallas._pad_r1(R1, s=FS)``."""
    _, h, w = R0.shape
    s = FS
    K = iterations
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
    grid = n_strips + K

    def pad_hw(x):
        return jnp.pad(x, ((0, hp - h), (0, wp - w)))

    r0p = jnp.pad(R0, ((0, 0), (0, hp - h), (0, wp - w)))
    kernel = partial(_wave_kernel, h=h, w=w, wp=wp, ww=ww, taps=taps,
                     scale=scale, n_strips=n_strips, K=K)

    scratch = (
        [pltpu.VMEM((5, (K + 3) * s, ww), jnp.float32),      # R1 big ring
         pltpu.VMEM((K + 1, 5, s, wp), jnp.float32)]         # R0 ring
        + [pltpu.VMEM((5, 2 * s, ww), jnp.float32) for _ in range(K)]   # wins
        + [pltpu.VMEM((s, wp), jnp.float32) for _ in range(2 * (K - 1))]  # flows
        + [pltpu.VMEM((5, _TAIL, wp), jnp.float32) for _ in range(K)]   # tails
        + [pltpu.VMEM((5, s, wp), jnp.float32) for _ in range(K)]       # mcurs
        + [pltpu.VMEM((5, s, wp), jnp.float32) for _ in range(K)]       # mtmps
        + [pltpu.VMEM((5, -(-(s + 1) // 8) * 8, ww), jnp.float32),  # rowbuf
           pltpu.VMEM((-(-(s + 2 * r) // 8) * 8, wp), jnp.float32),  # vcat
           pltpu.VMEM((s, wp), jnp.float32),                        # vacc
           pltpu.VMEM((s, -(-(w + 2 * r) // 128) * 128), jnp.float32),  # hcat
           pltpu.VMEM((5, s, w), jnp.float32),                      # mbb
           pltpu.SemaphoreType.DMA((K + 3,))])

    odx, ody, flags = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),   # R1 padded (HBM)
                  pl.BlockSpec(memory_space=pl.ANY),   # R0 padded (HBM)
                  pl.BlockSpec((s, wp),
                               lambda g: (jnp.clip(g, 0, n_strips - 1), 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((s, wp),
                               lambda g: (jnp.clip(g, 0, n_strips - 1), 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((s, w),
                                lambda g: (jnp.clip(g - K, 0, n_strips - 1), 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((s, w),
                                lambda g: (jnp.clip(g - K, 0, n_strips - 1), 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1), lambda g: (0, 0),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((hp, w), jnp.float32),
                   jax.ShapeDtypeStruct((hp, w), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.int32)),
        scratch_shapes=scratch,
    )(R1_padded, r0p, pad_hw(dx), pad_hw(dy))
    return odx[:h], ody[:h], flags[0, 0] > 0


def eligible(h: int, w: int, n_levels_hint: int = 0) -> bool:
    """The wavefront needs enough strips to cover the level skew and enough
    width for the strip layout (mirrors warp_pallas.eligible)."""
    return warp_pallas.eligible(h, w) and h >= 4 * FS
