"""Same-process on-chip chunk-size scan for the shift-warp inner loops.

The shipped warp processes each strip in ``warp_pallas.CHUNK``-lane column
chunks, each looping only over its own floor-shift ranges (see the constant's
comment for the r4 A/B that fixed CHUNK=512 and removed the full-width form:
fused iteration 2.34 -> 1.66 ms, standalone warp 1.90 -> 1.30 ms at 1080p,
bit-identical).  This harness re-scans chunk sizes same-process — variants
are bit-exact by construction (each pixel's four corner FMAs happen in one
visit to its own (a, b) cell; other cells add exact zeros), asserted here on
the real kernel.

Same-process because this chip's effective clock drifts run-to-run (~35%
observed between two runs 25 min apart; BENCHMARKS.md r4 caveat).  CHUNK is
read at trace time, so each variant mutates the module global and clears the
jit caches before compiling fresh closures.
"""

from __future__ import annotations

import json
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
from datmo_using_optical_flow_tpu.config import PipelineAConfig
from datmo_using_optical_flow_tpu.ops import flow_pallas, warp_pallas
from datmo_using_optical_flow_tpu.ops.farneback import (build_pyramid,
                                                        flow_from_pyramids)

H, W = 1080, 1920
REPS = 8
_SENT = jnp.float32(9.87654321e35)


def _chain(out, base):
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
    print(f"{name:46s} {dt:8.2f} ms/rep   "
          f"(raw {', '.join('%.1f' % r for r in runs)})", flush=True)
    return dt


def build_variant(fb, chunk):
    """Fresh jitted closures tracing with ``warp_pallas.CHUNK = chunk``."""
    warp_pallas.CHUNK = chunk
    jax.clear_caches()

    @jax.jit
    def run_fused(r0, r1pad, d0x, d0y):
        dxx, dyy = d0x, d0y
        for _ in range(REPS):
            a, b = flow_pallas.fused_iteration(r0, r1pad, dxx, dyy,
                                               fb.winsize, False)
            dxx = _chain(a, d0x)
            dyy = _chain(b, d0y)
        return dxx, dyy

    @jax.jit
    def run_warp(r0, r1pad, d0x, d0y):
        dxx, dyy = d0x, d0y
        for _ in range(REPS):
            m = warp_pallas.warp_matrices(r0, r1pad, dxx, dyy)
            dxx = _chain(m[3], d0x)
            dyy = _chain(m[4], d0y)
        return dxx, dyy

    @jax.jit
    def one_fused(r0, r1pad, d0x, d0y):
        return flow_pallas.fused_iteration(r0, r1pad, d0x, d0y,
                                           fb.winsize, False)

    @jax.jit
    def one_warp(r0, r1pad, d0x, d0y):
        return warp_pallas.warp_matrices(r0, r1pad, d0x, d0y)

    return run_fused, run_warp, one_fused, one_warp


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
    print(f"roundtrip: {_RT[0]:.1f} ms", flush=True)

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

    chunks = [int(c) for c in
              os.environ.get("AB_CHUNKS", "512,768,384").split(",")]
    results = {}
    ref_fused = ref_warp = None
    # interleave variants round-robin so clock drift averages out:
    # pass 1 establishes parity + first timings, pass 2 retimes everything
    built = {}
    for chunk in chunks:
        built[chunk] = build_variant(fb, chunk)
        run_fused, run_warp, one_fused, one_warp = built[chunk]
        warp_pallas.CHUNK = chunk  # (rebuilt traces happen on first call)
        of = jax.tree.map(np.asarray, one_fused(R0, r1p_fs, dxr, dyr))
        ow = np.asarray(one_warp(R0, r1p_s, dxr, dyr))
        if chunk == chunks[0]:
            ref_fused, ref_warp = of, ow
        else:
            dfd = max(float(np.abs(of[0] - ref_fused[0]).max()),
                      float(np.abs(of[1] - ref_fused[1]).max()))
            dwd = float(np.abs(ow - ref_warp).max())
            print(f"chunk={chunk}: max|diff| fused {dfd:.3e} warp {dwd:.3e}",
                  flush=True)
            results.setdefault(chunk, {})["max_diff"] = max(dfd, dwd)
        tf = timed(f"fused_iteration chunk={chunk}", run_fused,
                   R0, r1p_fs, dxr, dyr)
        tw = timed(f"warp_matrices   chunk={chunk}", run_warp,
                   R0, r1p_s, dxr, dyr)
        results.setdefault(chunk, {}).update(fused_ms=tf, warp_ms=tw)

    # second timing pass (drift control): best-of across passes
    for chunk in chunks:
        run_fused, run_warp, _, _ = built[chunk]
        warp_pallas.CHUNK = chunk
        tf = timed(f"fused_iteration chunk={chunk} (pass 2)", run_fused,
                   R0, r1p_fs, dxr, dyr)
        tw = timed(f"warp_matrices   chunk={chunk} (pass 2)", run_warp,
                   R0, r1p_s, dxr, dyr)
        r = results[chunk]
        r["fused_ms"] = min(r["fused_ms"], tf)
        r["warp_ms"] = min(r["warp_ms"], tw)

    print(json.dumps({"metric": "ab_warp_chunk_1080p", "value": 1,
                      "unit": "ms/iter",
                      "results": {str(k): v for k, v in results.items()}}),
          flush=True)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="ab_warp_chunk_1080p", unit="diagnostic")
