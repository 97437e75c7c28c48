"""Sub-stage breakdown of the DATMO tail at 1080p (diagnostics).

The r4 chip profile put the full tail (masks -> compaction -> DBSCAN ->
tracker) at ~3.8 ms inside the 16.9 ms stream step — the largest non-flow
item.  This script times each piece separately with full-output checksums
(the r2 DCE lesson) so the optimization target is a number, not a guess:

* elementwise/stencil chain (velocity scaling, continuity gradients,
  magnitude, angular curl);
* compact_masked (top_k over the 2.07M-cell valid mask);
* DBSCAN on the compacted 4096-cap features;
* extract_clusters + associate_and_update + lifecycle (the tracker).
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
from datmo_using_optical_flow_tpu.config import CapacityConfig, PipelineAConfig
from datmo_using_optical_flow_tpu.models import tracker_a
from datmo_using_optical_flow_tpu.models.optical_flow_datmo import (
    PipelineA, _datmo_tail, _stream_step_impl)
from datmo_using_optical_flow_tpu.ops import masks as mask_ops
from datmo_using_optical_flow_tpu.ops.dbscan import dbscan, dbscan_velocity_grid
from datmo_using_optical_flow_tpu.utils.padding import compact_masked

H, W = 1080, 1920
REPS = 8

_RT = [0.0]


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.asarray(leaf, jnp.float32)))


def timed(name, fn, *args):
    _sync(fn(*args))
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(fn(*args))
        runs.append((time.perf_counter() - t0) * 1000)
    dt = (min(runs) - _RT[0]) / REPS
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def checksum(tree):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree))


def main():
    cfg = PipelineAConfig(
        x_range=(0.0, H * 0.1), y_range=(0.0, W * 0.1), grid_resolution=(0.1, 0.1),
        capacities=CapacityConfig(max_cells=4096, max_clusters=32, max_tracks=64),
    )
    c = cfg
    frames = make_frames(3, H, W)
    pipe = PipelineA(cfg, fast_warp=True, use_pallas=True)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    tiny = jax.jit(lambda a: a + 1.0)
    _sync(tiny(jnp.float32(1)))
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny(jnp.float32(1)))
        samples.append((time.perf_counter() - t0) * 1000)
    _RT[0] = min(samples)
    print(f"dispatch+readback constant: {_RT[0]:.1f} ms", flush=True)

    # real flow for realistic sparsity in the valid mask
    carry = pipe.init_stream_carry()
    step = jax.jit(lambda b, cr: _stream_step_impl(b, cr, cfg=cfg, fast_warp=True,
                                                   use_pallas=True))
    carry, _ = step(jnp.asarray(frames[0]), carry)
    carry, out = step(jnp.asarray(frames[1]), carry)
    flow = jnp.stack([out.raw_velocity_x / ((c.x_range[1] - c.x_range[0]) / W),
                      out.raw_velocity_y / ((c.y_range[1] - c.y_range[0]) / H)],
                     axis=-1)
    print(f"valid cells in real frame: "
          f"{int(jnp.sum((out.magnitude > c.velocity_threshold)))}", flush=True)

    # --- full tail ---
    @jax.jit
    def run_tail(f, cr):
        acc = jnp.float32(0)
        for _ in range(REPS):
            c2, o = _datmo_tail(f + acc * 1e-30, jnp.asarray(True), cr.step, cfg)
            acc = checksum((c2, o))
        return acc

    timed("full tail", run_tail, flow, carry)

    # --- elementwise/stencil chain only ---
    @jax.jit
    def run_elem(f):
        acc = jnp.float32(0)
        for _ in range(REPS):
            fl = f + acc * 1e-30
            vx, vy, _ = mask_ops.velocity_from_flow(fl, c.x_range, c.y_range)
            cont = mask_ops.continuity_mask(vx, vy, c.masks.alpha_cont)
            comb = cont.astype(vx.dtype)
            vxf = vx * comb
            vyf = vy * comb
            mag = jnp.sqrt(vxf * vxf + vyf * vyf)
            ang = mask_ops.gradient(vyf, 1) - mask_ops.gradient(vxf, 0)
            valid = mag > c.velocity_threshold
            acc = checksum((vx, vy, vxf, vyf, mag, ang, valid))
        return acc

    timed("elementwise+stencil chain", run_elem, flow)

    # precompute the chain's outputs once for the downstream probes
    vx, vy, _ = mask_ops.velocity_from_flow(flow, c.x_range, c.y_range)
    cont = mask_ops.continuity_mask(vx, vy, c.masks.alpha_cont).astype(vx.dtype)
    vxf = vx * cont
    vyf = vy * cont
    mag = jnp.sqrt(vxf * vxf + vyf * vyf)
    valid = mag > c.velocity_threshold

    # --- compaction only (inside dbscan_velocity_grid) ---
    h, w = c.grid_shape
    rows = (jnp.arange(h * w, dtype=jnp.int32) // w)
    cols = (jnp.arange(h * w, dtype=jnp.int32) % w)

    @jax.jit
    def run_compact(vxi, vyi, vmask):
        acc = jnp.float32(0)
        for _ in range(REPS):
            feats_full = jnp.stack([rows.astype(jnp.float32) + acc * 1e-30,
                                    cols.astype(jnp.float32),
                                    vxi.reshape(-1), vyi.reshape(-1)], axis=1)
            feats, cmask, count = compact_masked(
                feats_full, vmask.reshape(-1), c.capacities.max_cells,
                fill_value=3e18)
            acc = checksum((feats, cmask, count))
        return acc

    timed("compact_masked 2.07M -> 4096", run_compact, vxf, vyf, valid)

    feats_full = jnp.stack([rows.astype(jnp.float32), cols.astype(jnp.float32),
                            vxf.reshape(-1), vyf.reshape(-1)], axis=1)
    feats, cmask, count = compact_masked(feats_full, valid.reshape(-1),
                                         c.capacities.max_cells, fill_value=3e18)

    # --- DBSCAN on compacted feats ---
    @jax.jit
    def run_dbscan(f, m):
        acc = jnp.float32(0)
        for _ in range(REPS):
            labels, _ = dbscan(f + acc * 1e-30, m, c.dbscan.eps,
                               c.dbscan.min_samples)
            acc = checksum(labels)
        return acc

    timed("dbscan 4096-cap", run_dbscan, feats, cmask)

    labels, _, rr, cc2, _2 = None, None, None, None, None
    labels_full, rcomp, ccomp, cmask2, cnt = dbscan_velocity_grid(
        vxf, vyf, valid, c.dbscan.eps, c.dbscan.min_samples, c.grid_shape,
        c.capacities.max_cells)

    # --- tracker (extract + associate + lifecycle) ---
    t = c.tracker

    @jax.jit
    def run_tracker(lab, rws, cls, vxi, vyi, table):
        acc = jnp.float32(0)
        for _ in range(REPS):
            clusters = tracker_a.extract_clusters(lab, rws, cls,
                                                  vxi + acc * 1e-30, vyi,
                                                  c.capacities.max_clusters)
            snap = tracker_a.associate_and_update(table, clusters, c.dt,
                                                  t.process_noise,
                                                  t.measurement_noise, t.gamma)
            tbl = tracker_a.lifecycle(snap, t.m1, t.n1, t.m2, t.n2)
            acc = checksum((clusters, snap, tbl))
        return acc

    timed("tracker (extract+associate+lifecycle)", run_tracker,
          labels_full, rcomp, ccomp, vxf, vyf, carry.step.table)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="profile_tail", unit="diagnostic")
