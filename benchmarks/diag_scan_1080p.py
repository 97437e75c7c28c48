"""Diagnose the 1080p lax.scan pathology (VERDICT r2 item 8, SCAN_MAX_CELLS).

At 1080p, `lax.scan` over the stream step runs ~330x slower than dispatching
the same body per frame (models/optical_flow_datmo.py:142-147).  This script
bisects which ingredient triggers the slowdown by timing, at 1080p with T=3
scan steps:

  1. per-frame dispatch of the full stream step (baseline);
  2. lax.scan over the full stream step, Pallas path;
  3. lax.scan over the full stream step, XLA path (no Pallas custom-calls);
  4. lax.scan whose body is ONLY the fused Pallas iteration (carry = flow);
  5. lax.scan whose body is ONLY the standalone Pallas warp;
  6. lax.scan whose body is ONLY the XLA blur+solve.

Diagnostics only — results recorded in BENCHMARKS.md.
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
    PipelineA, _stream_step_impl)
from datmo_using_optical_flow_tpu.ops import flow_pallas, warp_pallas

H, W = 1080, 1920
T = 3


def log(m):
    print(m, flush=True)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args, per=1):
    t0 = time.perf_counter()
    sync(fn(*args))
    log(f"{name:44s} compile+first {time.perf_counter() - t0:7.1f} s")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    log(f"{name:44s} {best / per * 1000:10.1f} ms/unit")
    return best / per


def main():
    cfg = PipelineAConfig(
        x_range=(0.0, H * 0.1), y_range=(0.0, W * 0.1),
        grid_resolution=(0.1, 0.1),
        capacities=CapacityConfig(max_cells=4096, max_clusters=32, max_tracks=64))
    fb = cfg.farneback
    frames = make_frames(T + 1, H, W)
    stack = jnp.asarray(frames)
    pipe = PipelineA(cfg, fast_warp=True, use_pallas=True)
    log(f"devices: {jax.devices()}")

    # 1. per-frame dispatch baseline
    def per_frame(stk, sc):
        for i in range(T + 1):
            sc, out = pipe.step_stream(stk[i], sc)
        return out.magnitude

    timed("1. per-frame dispatch (pallas)", per_frame, stack,
          pipe.init_stream_carry(), per=T)

    # 2./3. full-step scan, pallas vs xla
    def mk_scan(use_pallas):
        @jax.jit
        def run(stk, sc):
            def body(c, bev):
                return _stream_step_impl(bev, c, cfg=cfg, fast_warp=True,
                                         use_pallas=use_pallas)
            sc0, _ = body(sc, stk[0])
            final, outs = jax.lax.scan(body, sc0, stk[1:])
            return outs.magnitude
        return run

    timed("2. lax.scan full step (pallas)", mk_scan(True), stack,
          pipe.init_stream_carry(), per=T)
    timed("3. lax.scan full step (xla)", mk_scan(False), stack,
          pipe.init_stream_carry(), per=T)

    # 4.-6. minimal bodies
    rng = np.random.default_rng(0)
    R0 = jnp.asarray(rng.normal(size=(5, H, W)).astype(np.float32))
    R1 = jnp.asarray(rng.normal(size=(5, H, W)).astype(np.float32))
    r1p = jax.jit(lambda r: warp_pallas._pad_r1(r, s=flow_pallas.FS))(R1)
    r1p_s = jax.jit(warp_pallas._pad_r1)(R1)
    dx0 = jnp.zeros((H, W), jnp.float32)

    @jax.jit
    def scan_fused(r0, r1pad, d0):
        def body(c, _):
            a, b = flow_pallas.fused_iteration(r0, r1pad, c[0], c[1],
                                               fb.winsize, False)
            return (a, b), a[0, 0]
        (_, _), outs = jax.lax.scan(body, (d0, d0), jnp.arange(T))
        return outs

    timed("4. lax.scan fused_iteration only", scan_fused, R0, r1p, dx0, per=T)

    @jax.jit
    def scan_warp(r0, r1pad, d0):
        def body(c, _):
            m = warp_pallas.warp_matrices(r0, r1pad, c, c)
            return m[0, :, :W] * 1e-30 + d0, m[0, 0, 0]
        _, outs = jax.lax.scan(body, d0, jnp.arange(T))
        return outs

    timed("5. lax.scan warp_matrices only", scan_warp, R0, r1p_s, dx0, per=T)

    @jax.jit
    def scan_blur(m0):
        def body(c, _):
            a, b = flow_pallas.blur_solve(c, fb.winsize)
            return c + a * 1e-30, a[0, 0]
        _, outs = jax.lax.scan(body, m0, jnp.arange(T))
        return outs

    timed("6. lax.scan blur_solve (pallas kernel)", scan_blur, R0, per=T)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_scan_1080p", unit="diagnostic")
