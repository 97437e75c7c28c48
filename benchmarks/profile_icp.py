"""ICP per-iteration cost decomposition at reference load (diagnostics).

The r4 chip capture showed registration_icp at 453 ms (r2: 326 ms) despite
the r3 machinery (caps, certificates, in-place block skip, pruning-table
reuse) skipping ~70% of rows per iteration (sweep_stats).  This script
isolates where the per-iteration time actually goes:

* max_iterations sweep (1/2/5/10/20/30): the slope is the true ms/iteration,
  the intercept the fixed cost (index build + final eval + dispatch);
* A/B of the flag-reachable variants: capped (default) vs uncapped
  (search_cap=inf) vs uncached (cached=False -> 30 full compaction-free
  sweeps);
* a single in-place kernel sweep with a realistic ~30%-active need mask vs
  the all-active sweep (does block-level skipping actually reduce time?).

Reference workload: GMFA/GMFA.py:297-309 (threshold 0.02, identity init)
between consecutive x10-densified clouds of 102,400 points.
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

from datmo_using_optical_flow_tpu.config import CapacityConfig, GMFAConfig
from datmo_using_optical_flow_tpu.io.frames import pad_points
from datmo_using_optical_flow_tpu.models.gmfa import GMFAPipeline
from datmo_using_optical_flow_tpu.ops import nn_pallas
from datmo_using_optical_flow_tpu.ops.icp import registration_icp
from datmo_using_optical_flow_tpu.ops.nn import nearest_neighbors_active_inplace
from datmo_using_optical_flow_tpu.sim.synthetic import (BoxTarget, SyntheticScene,
                                                        synthetic_frame)

_RT = [0.0]


def log(msg):
    print(msg, flush=True)


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args, reps=3):
    sync(fn(*args))  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, (time.perf_counter() - t0) * 1000)
    dt = best - _RT[0]
    log(f"{name:56s} {dt:8.2f} ms")
    return dt


def main():
    cfg = GMFAConfig(capacities=CapacityConfig(
        max_raw_points=65536, max_roi_points=10240, max_cells=4096,
        max_clusters=32, max_tracks=64))
    scene = SyntheticScene(
        ground_points=40000, ground_extent=25.0,
        static_boxes=(BoxTarget(center0=(-8.0, 6.0, 1.0), velocity=(0, 0),
                                points_per_frame=4000),),
        targets=(BoxTarget(center0=(6.0, -4.0, 0.75), velocity=(1.5, 0.8),
                           points_per_frame=4000),
                 BoxTarget(center0=(-6.0, 5.0, 0.75), velocity=(-1.0, -1.2),
                           size=(3.0, 1.6, 1.4), points_per_frame=4000),
                 BoxTarget(center0=(0.0, 10.0, 0.75), velocity=(0.5, -1.5),
                           points_per_frame=4000)),
        seed=42)
    pipe = GMFAPipeline(cfg, max_moving_points=16384)
    key = jax.random.PRNGKey(0)
    log(f"devices: {jax.devices()}")
    clouds = []
    for i in range(2):
        raw = synthetic_frame(scene, i, dt=cfg.dt).astype(np.float32)
        padded, mask = pad_points(raw, cfg.capacities.max_raw_points)
        ex, exmask = pipe.preprocess(jnp.asarray(padded), jnp.asarray(mask),
                                     jax.random.fold_in(key, i))
        clouds.append((ex, exmask))
    (prev, prev_m), (cur, cur_m) = clouds
    log(f"points/cloud: {int(jnp.sum(cur_m))}")

    tiny = jax.jit(lambda a: a + 1.0)
    sync(tiny(jnp.float32(1)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(tiny(jnp.float32(1)))
        rts.append((time.perf_counter() - t0) * 1000)
    _RT[0] = min(rts)
    log(f"dispatch+readback constant: {_RT[0]:.1f} ms (subtracted)")

    ic = cfg.icp

    def mk(max_it, **kw):
        @jax.jit
        def run(p, pm, c, cm):
            return registration_icp(p, pm, c, cm, ic.threshold, max_it,
                                    ic.relative_fitness, ic.relative_rmse,
                                    **kw).transformation
        return run

    # ---- iteration-count slope ----
    pts = []
    for it in (1, 2, 5, 10, 20, 30):
        dt = timed(f"icp max_iterations={it}", mk(it), prev, prev_m, cur, cur_m)
        pts.append((it, dt))
    (x0, y0), (x1, y1) = pts[0], pts[-1]
    slope = (y1 - y0) / (x1 - x0)
    log(f"  -> slope {slope:.2f} ms/iteration, intercept ~{y0 - slope:.1f} ms")

    # ---- variants ----
    timed("icp default (capped, cached, in-place)", mk(30),
          prev, prev_m, cur, cur_m)
    timed("icp search_cap=inf (uncapped sweeps)", mk(30, search_cap=float("inf")),
          prev, prev_m, cur, cur_m)
    timed("icp cached=False (full sweep / iteration)", mk(30, cached=False),
          prev, prev_m, cur, cur_m)
    timed("icp sweep=compact (argsort-compacted actives)", mk(30, sweep="compact"),
          prev, prev_m, cur, cur_m)
    # transform equivalence of the two sweep modes (same exact NNs)
    ta = mk(30)(prev, prev_m, cur, cur_m)
    tb = mk(30, sweep="compact")(prev, prev_m, cur, cur_m)
    log(f"  inplace-vs-compact max |dT| = {float(jnp.max(jnp.abs(ta - tb))):.2e}")

    # ---- single in-place kernel sweep: all-active vs ~30% coherent-active ----
    order = jax.jit(nn_pallas.sort_order)(cur, cur_m)
    src_sorted = cur[order]
    sm_sorted = cur_m[order]
    index = jax.jit(nn_pallas.build_target_index)(prev, prev_m)
    n = src_sorted.shape[0]
    cap2 = jnp.float32((5.0 * ic.threshold) ** 2)

    build = nn_pallas.block_first_fill(src_sorted, sm_sorted, n)[:n]
    table = jax.jit(lambda s, i: nn_pallas.build_block_table(s, i, n))(build, index)

    def sweep(need):
        @jax.jit
        def run(s, i, t):
            return nearest_neighbors_active_inplace(
                s, prev, prev_m, need, i, cap2=cap2, block_table=t,
                drift=jnp.float32(0.05))[1]
        return run

    all_need = sm_sorted
    rng = np.random.default_rng(0)
    start = rng.integers(0, n - n // 3)
    part = np.zeros(n, bool)
    part[start:start + n // 3] = True          # spatially coherent 33%
    part_need = jnp.asarray(part) & sm_sorted
    scat = np.zeros(n, bool)
    scat[rng.permutation(n)[:n // 3]] = True   # scattered 33% (worst case)
    scat_need = jnp.asarray(scat) & sm_sorted

    timed("in-place sweep, 100% active", sweep(all_need), src_sorted, index, table)
    timed("in-place sweep, 33% coherent-active", sweep(part_need),
          src_sorted, index, table)
    timed("in-place sweep, 33% scattered-active", sweep(scat_need),
          src_sorted, index, table)

    # capped vs uncapped single sweep
    @jax.jit
    def sweep_uncapped(s, i, t):
        return nearest_neighbors_active_inplace(
            s, prev, prev_m, all_need, i, cap2=None, block_table=t,
            drift=jnp.float32(0.05))[1]
    timed("in-place sweep, 100% active, UNCAPPED", sweep_uncapped,
          src_sorted, index, table)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="profile_icp", unit="diagnostic")
