"""Attribute the non-kernel time inside the 1080p flow path (diagnostics).

profile_1080p (r4): full step 16.2 ms, of which L0 fused iterations 5x1.48 =
7.4 ms, levels 1..4 = 1.0 ms, tail 1.9 ms, pyramid 0.18 ms — leaving ~5.7 ms
of glue split between flow_from_pyramids (~2.4 ms) and the step wrapper
(~3.3 ms).  Candidates timed here:

* ``_pad_r1`` of the level-0 coefficient planes (a 40 MB pad per frame);
* ``flow_in_range`` (a full 16 MB flow reduction per iteration, 5x/frame,
  feeding the fallback ``lax.cond``);
* the level-0 iteration loop with the cond vs calling fused_iteration
  directly (cond scheduling/materialization cost);
* the final upsample + (H, W, 2) stack;
* full flow_from_pyramids for reference.
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
from datmo_using_optical_flow_tpu.ops import flow_pallas, warp_pallas
from datmo_using_optical_flow_tpu.ops.farneback import (
    build_pyramid, flow_from_pyramids, resize_bilinear)

H, W = 1080, 1920
REPS = 6
_RT = [0.0]


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def timed(name, fn, *args):
    f = jax.jit(fn)
    _sync(f(*args))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(f(*args))
        runs.append((time.perf_counter() - t0) * 1000)
    dt = (min(runs) - _RT[0]) / REPS
    print(f"{name:56s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    frames = make_frames(2, H, W)
    im1 = jnp.asarray(frames[0], jnp.float32)
    im2 = jnp.asarray(frames[1], jnp.float32)

    tiny = jax.jit(lambda a: a + 1.0)
    _sync(tiny(jnp.float32(1)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny(jnp.float32(1)))
        rts.append((time.perf_counter() - t0) * 1000)
    _RT[0] = min(rts)
    print(f"dispatch+readback constant: {_RT[0]:.1f} ms", flush=True)

    pyr1 = jax.jit(lambda im: build_pyramid(im, 0.3, 5, 5, 5.0))(im1)
    pyr2 = jax.jit(lambda im: build_pyramid(im, 0.3, 5, 5, 5.0))(im2)
    R0, R1 = pyr1[-1], pyr2[-1]
    # converged-ish real flow for the L0 iterations
    flow = jax.jit(lambda a, b: flow_from_pyramids(
        a, b, 0.3, 15, 5, True))(pyr1, pyr2)
    dx0 = flow[..., 0] * 0.9
    dy0 = flow[..., 1] * 0.9

    def rep(fn, *xs):
        def run(*args):
            acc = jnp.float32(0)
            out = None
            for _ in range(REPS):
                shifted = [a + acc * 1e-30 for a in args]
                out = fn(*shifted)
                acc = jnp.sum(jax.tree.leaves(out)[0]) * 1e-30
            return out
        return run, xs

    timed("_pad_r1 (L0 planes)", *rep(lambda r: warp_pallas._pad_r1(
        r, s=flow_pallas.FS), R1))
    timed("flow_in_range x5", *rep(
        lambda a, b: [warp_pallas.flow_in_range(a + i * 1e-30, b)
                      for i in range(5)][-1], dx0, dy0))

    r1p = jax.jit(lambda r: warp_pallas._pad_r1(r, s=flow_pallas.FS))(R1)

    def loop_direct(dx, dy):
        for _ in range(5):
            dx, dy = flow_pallas.fused_iteration(R0, r1p, dx, dy, 15, False)
        return dx, dy

    def loop_cond(dx, dy):
        def fast(args):
            return flow_pallas.fused_iteration(R0, r1p, args[0], args[1],
                                               15, False)

        def slow(args):
            from datmo_using_optical_flow_tpu.ops.farneback import (
                pack_corner_pairs, update_matrices)
            m = update_matrices(R0, R1, *args, pack_corner_pairs(R1))
            return flow_pallas.blur_solve(m, 15, False)

        for _ in range(5):
            dx, dy = jax.lax.cond(warp_pallas.flow_in_range(dx, dy),
                                  fast, slow, (dx, dy))
        return dx, dy

    timed("L0 5 iterations, direct fused calls", *rep(loop_direct, dx0, dy0))
    timed("L0 5 iterations, cond + range checks", *rep(loop_cond, dx0, dy0))

    dxs = resize_bilinear(dx0, 324, 576)
    dys = resize_bilinear(dy0, 324, 576)
    timed("upsample 324x576 -> 1080p x2 + stack", *rep(
        lambda a, b: jnp.stack([resize_bilinear(a, H, W) * np.float32(1 / 0.3),
                                resize_bilinear(b, H, W) * np.float32(1 / 0.3)],
                               axis=-1), dxs, dys))


if __name__ == "__main__":
    main()
