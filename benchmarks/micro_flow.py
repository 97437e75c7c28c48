"""Micro-profile of the level-0 fused flow iteration (diagnostics only).

Times the fused warp+blur+solve kernel and its two unfused halves at the
1080p level-0 shape with REAL converged flow (shift-block count matters),
using an anti-CSE chain that preserves input values bitwise: each rep's
input is ``where(prev_out == sentinel, prev_out, base)`` — structurally
distinct per rep (no CSE) yet numerically equal to ``base``.
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

from bench import make_frames
from datmo_using_optical_flow_tpu.config import PipelineAConfig
from datmo_using_optical_flow_tpu.ops import flow_pallas, warp_pallas
from datmo_using_optical_flow_tpu.ops.farneback import (build_pyramid,
                                                        flow_from_pyramids,
                                                        pack_corner_pairs,
                                                        update_matrices)

H, W = 1080, 1920
REPS = 8
_SENT = jnp.float32(9.87654321e35)

# Measured chip ceiling (BENCHMARKS.md round 1): ~82 GB/s HBM copy bandwidth
# on this tunneled 1/10-scale v5e.  Utilization = modeled-bytes / time / peak
# (VERDICT r3 item 7: make "bandwidth-bound" a number).
HBM_PEAK_GBPS = 82.0


def hbm_model_bytes(*, iterations: int) -> dict[str, float]:
    """Modeled HBM bytes per call at the 1080p level-0 shape.

    fused_iteration (per iteration): R0 5 planes f32 + the padded-R1 ring
    window (each padded row DMA'd once) + flow in + flow out.  M planes stay
    in VMEM.
    """
    r = 7  # winsize//2
    r0 = 5 * H * W * 4.0
    r1 = 5 * (H + 2 * r + 8) * (W + 2 * r) * 4.0
    flow_io = 2 * H * W * 4.0
    per_iter = r0 + r1 + 2 * flow_io
    return {
        "fused_iteration": per_iter,
        "warp_matrices": r0 + r1 + flow_io + 5 * H * W * 4.0,  # writes M
        "blur_solve": 5 * (H + 2 * r) * (W + 2 * r) * 4.0 + flow_io,
    }


def util(name: str, key: str, dt_ms: float, model: dict[str, float]) -> None:
    gbps = model[key] / 1e9 / (dt_ms / 1e3)
    print(f"{'':42s} {gbps:8.1f} GB/s achieved "
          f"({100 * gbps / HBM_PEAK_GBPS:.0f}% of {HBM_PEAK_GBPS:.0f} GB/s "
          f"copy peak, modeled {model[key] / 1e6:.0f} MB)", flush=True)


def _chain(out, base):
    """Value-identical to ``base``, data-dependent on ``out`` (anti-CSE)."""
    return jnp.where(out == _SENT, out, base)


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


_RT = [0.0]


def timed(name, fn, *args):
    _sync(fn(*args))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(*args))
        runs.append((time.perf_counter() - t0) * 1000)
    dt = (min(runs) - _RT[0]) / REPS
    print(f"{name:42s} {dt:8.2f} ms/rep   (raw {', '.join('%.1f' % r for r in runs)})",
          flush=True)
    return dt


def main():
    cfg = PipelineAConfig()
    fb = cfg.farneback
    frames = make_frames(2, H, W)
    im1 = jnp.asarray(frames[0], jnp.float32)
    im2 = jnp.asarray(frames[1], jnp.float32)
    print(f"devices: {jax.devices()}", flush=True)

    tiny = jax.jit(lambda a: a + 1.0)
    _sync(tiny(jnp.float32(1)))
    rts = []
    for _ in range(6):
        t0 = time.perf_counter()
        _sync(tiny(jnp.float32(1)))
        rts.append((time.perf_counter() - t0) * 1000)
    _RT[0] = min(rts)
    print(f"roundtrip: {_RT[0]:.1f} ms (samples {['%.0f' % s for s in rts]})",
          flush=True)

    pyr1 = jax.jit(lambda im: build_pyramid(im, fb.pyr_scale, fb.levels,
                                            fb.poly_n, fb.poly_sigma))(im1)
    pyr2 = jax.jit(lambda im: build_pyramid(im, fb.pyr_scale, fb.levels,
                                            fb.poly_n, fb.poly_sigma))(im2)
    R0, R1 = pyr1[-1], pyr2[-1]
    flow = jax.jit(lambda p1, p2: flow_from_pyramids(
        p1, p2, fb.pyr_scale, fb.winsize, fb.iterations, True, True, False))(
            pyr1, pyr2)
    dxr, dyr = flow[..., 0], flow[..., 1]
    print(f"flow range dx [{float(dxr.min()):.2f},{float(dxr.max()):.2f}] "
          f"dy [{float(dyr.min()):.2f},{float(dyr.max()):.2f}]", flush=True)

    r1p_fs = jax.jit(lambda r: warp_pallas._pad_r1(r, s=flow_pallas.FS))(R1)
    r1p_s = jax.jit(lambda r: warp_pallas._pad_r1(r, s=warp_pallas.S))(R1)

    # --- fused iteration (warp + blur + solve, M in VMEM) ---
    @jax.jit
    def run_fused(r0, r1pad, d0x, d0y):
        dxx, dyy = d0x, d0y
        for _ in range(REPS):
            a, b = flow_pallas.fused_iteration(r0, r1pad, dxx, dyy,
                                               fb.winsize, False)
            dxx = _chain(a, d0x)
            dyy = _chain(b, d0y)
        return dxx, dyy

    model = hbm_model_bytes(iterations=fb.iterations)
    dt = timed("fused_iteration (real flow)", run_fused, R0, r1p_fs, dxr, dyr)
    util("fused_iteration", "fused_iteration", dt, model)

    # --- standalone warp (writes M to HBM) ---
    @jax.jit
    def run_warp(r0, r1pad, d0x, d0y):
        dxx, dyy = d0x, d0y
        for _ in range(REPS):
            m = warp_pallas.warp_matrices(r0, r1pad, dxx, dyy)
            dxx = _chain(m[3], d0x)
            dyy = _chain(m[4], d0y)
        return dxx, dyy

    dt = timed("warp_matrices standalone", run_warp, R0, r1p_s, dxr, dyr)
    util("warp_matrices", "warp_matrices", dt, model)

    # --- standalone blur+solve (reads M from HBM) ---
    m0 = jax.jit(warp_pallas.warp_matrices)(R0, r1p_s, dxr, dyr)

    @jax.jit
    def run_blur2(m):
        mm = m
        acc = None
        for _ in range(REPS):
            a, b = flow_pallas.blur_solve(mm, fb.winsize, False)
            mm = jnp.stack([_chain(a, m[0]), _chain(b, m[1]), m[2], m[3], m[4]])
            acc = a
        return acc

    dt = timed("blur_solve standalone", run_blur2, m0)
    util("blur_solve", "blur_solve", dt, model)

    # (A K-iteration wavefront kernel was A/B'd here on chip in r4 and
    # removed: 11.99 ms vs 11.2 ms for 5 chained fused iterations — the
    # level is VPU-bound, so its HBM-traffic savings bought nothing and its
    # fill/drain bubbles cost ~7%.  See BENCHMARKS.md r4.)

    # --- XLA packed-gather update_matrices (for reference) ---
    packed = jax.jit(pack_corner_pairs)(R1)

    @jax.jit
    def run_um(r0, r1, d0x, d0y):
        dxx, dyy = d0x, d0y
        out = None
        for _ in range(REPS):
            m = update_matrices(r0, r1, dxx, dyy, packed)
            dxx = _chain(m[3], d0x)
            dyy = _chain(m[4], d0y)
            out = m
        return out

    timed("update_matrices XLA gather", run_um, R0, R1, dxr, dyr)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="micro_flow_1080p", unit="diagnostic")
