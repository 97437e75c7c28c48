"""Stage-level profile of the 1080p stream step on the real chip.

Times each stage of the pipeline-A stream step (polyexp pyramid, per-level
flow refinement, warp kernel, blur+solve kernel, DATMO tail) by chaining N
dependent repetitions inside one jitted program (the tunnel's per-dispatch
round trip is ~28 ms, so single dispatches can't be timed directly).

Diagnostics only — not part of bench.py.
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

from bench import make_frames
from datmo_using_optical_flow_tpu.config import CapacityConfig, PipelineAConfig
from datmo_using_optical_flow_tpu.models.optical_flow_datmo import (
    PipelineA, _datmo_tail, _stream_step_impl)
from datmo_using_optical_flow_tpu.ops import flow_pallas, warp_pallas
from datmo_using_optical_flow_tpu.ops.farneback import (build_pyramid,
                                                        flow_from_pyramids)

H, W = 1080, 1920
REPS = 6


def _sync(out):
    # value-readback sync (tunnel block_until_ready is unreliable; compiles can
    # be async too): reduce to a scalar and fetch it
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


_ROUNDTRIP_MS = [0.0]  # dispatch+readback constant, calibrated in main()


def timed(name, fn, *args):
    _sync(fn(*args))  # compile + drain the queue
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        _sync(fn(*args))
        runs.append((time.perf_counter() - t0) * 1000)
    dt = (min(runs) - _ROUNDTRIP_MS[0]) / REPS
    print(f"{name:45s} {dt:8.2f} ms   (raw: {runs[0]:.1f}, {runs[1]:.1f} per "
          f"{REPS} reps)", flush=True)
    return dt


def main():
    cfg = PipelineAConfig(
        x_range=(0.0, H * 0.1), y_range=(0.0, W * 0.1), grid_resolution=(0.1, 0.1),
        capacities=CapacityConfig(max_cells=4096, max_clusters=32, max_tracks=64),
    )
    fb = cfg.farneback
    frames = make_frames(3, H, W)
    im1 = jnp.asarray(frames[0], jnp.float32)
    im2 = jnp.asarray(frames[1], jnp.float32)
    pipe = PipelineA(cfg, fast_warp=True, use_pallas=True)

    print(f"devices: {jax.devices()}", file=sys.stderr)

    # --- calibrate the per-timed-call dispatch+readback constant ---
    tiny = jax.jit(lambda a: a + 1.0)
    _sync(tiny(jnp.float32(1)))
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny(jnp.float32(1)))
        samples.append((time.perf_counter() - t0) * 1000)
    _ROUNDTRIP_MS[0] = min(samples)
    print(f"dispatch+readback constant: {_ROUNDTRIP_MS[0]:.1f} ms "
          f"(samples {['%.1f' % s for s in samples]})", flush=True)

    # --- full stream step ---
    carry = pipe.init_stream_carry()
    step = jax.jit(lambda b, c: _stream_step_impl(b, c, cfg=cfg, fast_warp=True,
                                                  use_pallas=True))
    bev = jnp.asarray(frames[0])

    @jax.jit
    def run_step(b, c):
        for _ in range(REPS):
            c, out = step(b, c)
        return c, out

    timed("full stream step", run_step, bev, carry)

    # --- flow from pyramids (all levels) ---
    pyr1 = jax.jit(lambda im: build_pyramid(im, fb.pyr_scale, fb.levels, fb.poly_n,
                                            fb.poly_sigma))(im1)
    pyr2 = jax.jit(lambda im: build_pyramid(im, fb.pyr_scale, fb.levels, fb.poly_n,
                                            fb.poly_sigma))(im2)

    def mk_flow(use_pallas):
        @jax.jit
        def run(p1, p2):
            acc = jnp.float32(0)
            for _ in range(REPS):
                f = flow_from_pyramids(jax.tree.map(lambda x: x + acc * 1e-30, p1),
                                       p2, fb.pyr_scale, fb.winsize, fb.iterations,
                                       use_pallas, True, False)
                acc = jnp.sum(f)
            return acc
        return run

    timed("flow_from_pyramids (pallas)", mk_flow(True), pyr1, pyr2)

    # --- warp with realistic (nonzero) flow: shift-block count matters ---
    R0, R1 = pyr1[-1], pyr2[-1]
    r1p = jax.jit(warp_pallas._pad_r1)(R1)
    dx = jnp.zeros(R0.shape[1:], jnp.float32)
    dy = jnp.zeros(R0.shape[1:], jnp.float32)
    flow_real = jax.jit(lambda p1, p2: flow_from_pyramids(
        p1, p2, fb.pyr_scale, fb.winsize, fb.iterations, True, True, False))(pyr1, pyr2)
    dxr = flow_real[..., 0]
    dyr = flow_real[..., 1]

    @jax.jit
    def run_warp_real(r0, r1pad, d0x, d0y):
        dxx, dyy = d0x, d0y
        for _ in range(REPS):
            m = warp_pallas.warp_matrices(r0, r1pad, dxx, dyy)
            dxx = m[3] * 1e-30 + d0x
            dyy = m[4] * 1e-30 + d0y
        return dxx

    timed("warp_matrices L0 real flow", run_warp_real, R0, r1p, dxr, dyr)
    print(f"flow range: dx [{float(dxr.min()):.2f},{float(dxr.max()):.2f}] "
          f"dy [{float(dyr.min()):.2f},{float(dyr.max()):.2f}]", flush=True)

    # --- fused iteration with realistic flow ---
    r1p_fs = jax.jit(lambda r: warp_pallas._pad_r1(r, s=flow_pallas.FS))(R1)

    @jax.jit
    def run_fused_real(r0, r1pad, d0x, d0y):
        dxx, dyy = d0x, d0y
        for _ in range(REPS):
            a, b = flow_pallas.fused_iteration(r0, r1pad, dxx, dyy, fb.winsize,
                                               False)
            dxx = a * 1e-30 + d0x
            dyy = b * 1e-30 + d0y
        return dxx

    timed("fused_iteration L0 real flow", run_fused_real, R0, r1p_fs, dxr, dyr)
    timed("fused_iteration L0 zero flow", run_fused_real, R0, r1p_fs, dx, dy)

    # --- datmo tail alone ---
    carry2, _ = step(bev, carry)

    @jax.jit
    def run_tail(f, c):
        acc = jnp.float32(0)
        for _ in range(REPS):
            c2, out = _datmo_tail(f + acc * 1e-30, jnp.asarray(True), c.step, cfg)
            # checksum FULL outputs + carry: consuming a single element lets
            # XLA slice away DBSCAN/tracker entirely (the r2 DCE lesson — an
            # earlier form of this probe measured the tail at ~0 ms)
            acc = sum(jnp.sum(x.astype(jnp.float32)) for x in
                      jax.tree.leaves((c2, out)))
        return acc

    timed("datmo tail (masks+dbscan+tracker)", run_tail, flow_real, carry2)

    # --- levels 1..4 flow (pyramid minus L0) ---
    @jax.jit
    def run_flow_small(p1, p2):
        acc = jnp.float32(0)
        for _ in range(REPS):
            f = flow_from_pyramids(jax.tree.map(lambda x: x + acc * 1e-30, p1[:-1]),
                                   p2[:-1], fb.pyr_scale, fb.winsize, fb.iterations,
                                   True, True, False)
            acc = jnp.sum(f)
        return acc

    timed("flow levels 1..4 only", run_flow_small, pyr1, pyr2)

    # --- pyramid build (polyexp all levels) ---
    @jax.jit
    def run_pyr(im):
        acc = jnp.float32(0)
        for _ in range(REPS):
            pyr = build_pyramid(im + acc * 1e-30, fb.pyr_scale, fb.levels,
                                fb.poly_n, fb.poly_sigma)
            acc = jnp.sum(pyr[-1])
        return acc

    timed("build_pyramid (all levels)", run_pyr, im1)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="profile_1080p", unit="diagnostic")
