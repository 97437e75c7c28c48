"""Decompose the GMFA step's on-chip time (r4: bench_gmfa measured 1876 ms
per step while the probed stages summed to ~460 ms — find the rest).

Times, with the same clouds as bench_gmfa:
  1. the full jitted pipe.step
  2. ICP exactly as the step invokes it (shared cur_index + carried order)
  3. the capped classification sweep exactly as the step invokes it
  4. a step with ICP replaced by identity (env DATMO_DIAG_SKIP_ICP=1 path
     is not wired; instead we time a program of stages 2+3 chained to see
     whether composition itself changes scheduling)

Prints stage times to stderr; one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    from datmo_using_optical_flow_tpu.utils.compile_cache import enable as _ec
    _ec()
    import jax.numpy as jnp

    from datmo_using_optical_flow_tpu.config import CapacityConfig, GMFAConfig
    from datmo_using_optical_flow_tpu.io.frames import pad_points
    from datmo_using_optical_flow_tpu.models.gmfa import GMFAPipeline
    from datmo_using_optical_flow_tpu.ops import nn_pallas
    from datmo_using_optical_flow_tpu.ops.icp import registration_icp, transform_points
    from datmo_using_optical_flow_tpu.ops.nn import nearest_neighbors_with_bound
    from datmo_using_optical_flow_tpu.sim.synthetic import (BoxTarget, SyntheticScene,
                                                            synthetic_frame)

    log(f"devices: {jax.devices()}")
    cfg = GMFAConfig(
        capacities=CapacityConfig(max_raw_points=65536, max_roi_points=10240,
                                  max_cells=4096, max_clusters=32, max_tracks=64),
    )
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
        seed=42,
    )
    pipe = GMFAPipeline(cfg, max_moving_points=16384)
    key = jax.random.PRNGKey(0)
    clouds = []
    for i in range(2):
        raw = synthetic_frame(scene, i, dt=cfg.dt).astype(np.float32)
        padded, mask = pad_points(raw, cfg.capacities.max_raw_points)
        ex, exmask = pipe.preprocess(jnp.asarray(padded), jnp.asarray(mask),
                                     jax.random.fold_in(key, i))
        clouds.append((ex, exmask))
    prev, prev_m = clouds[0]
    cur, cur_m = clouds[1]

    tiny = jax.jit(lambda a: a + 1.0)
    _ = float(tiny(jnp.float32(1)))
    rts = []
    for _i in range(5):
        t0 = time.time()
        _ = float(tiny(jnp.float32(1)))
        rts.append((time.time() - t0) * 1000)
    rt = min(rts)
    log(f"dispatch+readback constant: {rt:.1f} ms (subtracted)")

    results = {}

    def timeit(f, *a, label="", reps=2):
        r = f(*a)
        _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
        best = float("inf")
        for _i in range(reps):
            t0 = time.time()
            r = f(*a)
            _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
            best = min(best, (time.time() - t0) * 1000)
        v = max(best - rt, 0.0)
        results[label] = round(v, 2)
        log(f"  {label:55s} {v:9.2f} ms")

    # 1. the full step as bench_gmfa runs it
    carry0 = pipe.seed_carry(prev, prev_m)

    def full_step(c, cm):
        carry, out = pipe.step(c, cm, carry0, key)
        return out.n_clusters

    timeit(full_step, cur, cur_m, label="full pipe.step")

    # 2. ICP exactly as the step invokes it (shared index + carried order)
    @jax.jit
    def icp_as_step(p, pm, c, cm, order):
        cur_order = nn_pallas.sort_order(c, cm)
        cur_index = nn_pallas.build_target_index(c, cm, order=cur_order)
        return registration_icp(p, pm, c, cm, cfg.icp.threshold,
                                cfg.icp.max_iterations, cfg.icp.relative_fitness,
                                cfg.icp.relative_rmse, tgt_index=cur_index,
                                src_order=order).transformation
    timeit(icp_as_step, prev, prev_m, cur, cur_m, carry0.prev_order,
           label="ICP as-step (shared index + carried order)")

    # 2b. ICP building everything itself (the bench_gmfa probe form)
    @jax.jit
    def icp_solo(p, pm, c, cm):
        return registration_icp(p, pm, c, cm, cfg.icp.threshold,
                                cfg.icp.max_iterations, cfg.icp.relative_fitness,
                                cfg.icp.relative_rmse).transformation
    timeit(icp_solo, prev, prev_m, cur, cur_m, label="ICP solo (own index/order)")

    # 3. the capped classification sweep exactly as the step invokes it
    cls_cap = 2.0 * jnp.float32(cfg.moving_threshold)

    @jax.jit
    def cls_as_step(p, pm, c, cm, order, tr):
        cur_order = nn_pallas.sort_order(c, cm)
        prev_t = transform_points(p, tr)
        idx, d2s, _ = nearest_neighbors_with_bound(
            c, prev_t, pm, cap2=cls_cap * cls_cap,
            tgt_order=order, src_order=cur_order)
        return d2s
    tr = icp_solo(prev, prev_m, cur, cur_m)
    timeit(cls_as_step, prev, prev_m, cur, cur_m, carry0.prev_order, tr,
           label="classification sweep as-step (capped, shared orders)")

    # 3b. the classification sweep UNCAPPED with fresh orders
    @jax.jit
    def cls_plain(p, pm, c, tr):
        prev_t = transform_points(p, tr)
        idx, d2s, _ = nearest_neighbors_with_bound(c, prev_t, pm)
        return d2s
    timeit(cls_plain, prev, prev_m, cur, tr,
           label="classification sweep plain (uncapped, own orders)")

    # 4. tail stages with the REAL step tensors (the bench probes used
    # synthetic-friendly inputs; e.g. DBSCAN's label-propagation while_loop
    # iteration count is data-dependent)
    _, out_real = pipe.step(cur, cur_m, carry0, key)
    mpts_r = out_real.moving_points
    mcount_r = out_real.moving_count
    mmask_r = jnp.arange(mpts_r.shape[0]) < mcount_r
    log(f"  real moving_count={int(mcount_r)} n_clusters={int(out_real.n_clusters)}")

    from datmo_using_optical_flow_tpu.models.gmfa import _cluster_features
    from datmo_using_optical_flow_tpu.ops.dbscan import dbscan

    timeit(jax.jit(lambda p, m: dbscan(p, m, cfg.dbscan.eps,
                                       cfg.dbscan.min_samples)[0]),
           mpts_r, mmask_r, label="DBSCAN on REAL moving points")
    labels_r = out_real.labels
    timeit(jax.jit(lambda p, l: _cluster_features(
        p, l, cfg.capacities.max_clusters)[0]), mpts_r, labels_r,
           label="_cluster_features on REAL labels")

    from datmo_using_optical_flow_tpu.ops.som import update_som
    res_r = out_real.residuals[:mpts_r.shape[0]]
    timeit(jax.jit(lambda s, p, m, r: update_som(
        s, p, m, r, cfg.static_threshold, cfg.moving_threshold,
        cfg.som.cell_resolution, cfg.som.static_increment,
        cfg.som.moving_decrement, cfg.som.max_value, cfg.som.min_value)),
           carry0.som, mpts_r, mmask_r, res_r, label="SOM on REAL moving points")

    # 5. cumulative-prefix timing of the ONE composed program: marginal cost
    # per stage locates where in-program composition overhead appears
    from functools import partial as _partial

    from datmo_using_optical_flow_tpu.models.gmfa import _gmfa_step_impl
    prev_ms = 0.0
    for stop in ("orders", "icp", "cls", "compact", "dbscan", "hungarian",
                 "births", "som", "kf", None):
        f = jax.jit(_partial(_gmfa_step_impl, cfg=cfg, max_moving=16384,
                             diag_stop=stop), static_argnames=())
        name = stop or "FULL"
        timeit(f, cur, cur_m, carry0, key, label=f"prefix..{name}")
        cur_ms = results[f"prefix..{name}"]
        log(f"      marginal {name}: {cur_ms - prev_ms:+.1f} ms")
        prev_ms = cur_ms

    print(json.dumps({"metric": "diag_gmfa_step", "value": results.get(
        "full pipe.step"), "unit": "ms", "stages": results}))


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_gmfa_step", unit="ms")
