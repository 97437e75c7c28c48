"""Third GMFA diag: the prefix containing ALL the step's compute costs 454 ms
while the full step costs 1572 ms, and trivial multi-output programs cost ~0.
So some specific OUTPUT's liveness changes what XLA compiles/schedules.

Runs the full _gmfa_step_impl under jit but returns an increasing selection
of outputs; the selection that jumps ~+1100 ms is the trigger.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from datmo_using_optical_flow_tpu.utils.compile_cache import enable as _ec
    _ec()
    from functools import partial

    from datmo_using_optical_flow_tpu.config import CapacityConfig, GMFAConfig
    from datmo_using_optical_flow_tpu.io.frames import pad_points
    from datmo_using_optical_flow_tpu.models.gmfa import GMFAPipeline, _gmfa_step_impl
    from datmo_using_optical_flow_tpu.sim.synthetic import (BoxTarget, SyntheticScene,
                                                            synthetic_frame)

    print(f"devices: {jax.devices()}", file=sys.stderr)
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
    carry0 = pipe.seed_carry(prev, prev_m)

    tiny = jax.jit(lambda a: a + 1.0)
    _ = float(tiny(jnp.float32(1)))
    rts = []
    for _i in range(5):
        t0 = time.time()
        _ = float(tiny(jnp.float32(1)))
        rts.append((time.time() - t0) * 1000)
    rt = min(rts)
    print(f"roundtrip: {rt:.1f} ms", file=sys.stderr)

    results = {}

    def timeit(f, label=""):
        r = f(cur, cur_m, carry0, key)
        _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
        best = float("inf")
        for _i in range(2):
            t0 = time.time()
            r = f(cur, cur_m, carry0, key)
            _ = float(jnp.sum(jax.tree.leaves(r)[0].astype(jnp.float32)))
            best = min(best, (time.time() - t0) * 1000)
        v = max(best - rt, 0.0)
        results[label] = round(v, 2)
        print(f"  {label:45s} {v:9.2f} ms", file=sys.stderr, flush=True)

    def make(*names):
        @jax.jit
        def f(c, cm, carry, k):
            nc, out = _gmfa_step_impl(c, cm, carry, k, cfg=cfg, max_moving=16384)
            items = {
                "base": (nc.table.state, out.moving_points),
                "fitness": out.fitness,
                "som": nc.som,
                "residuals": out.residuals,
                "classifications": out.classifications,
                "labels": out.labels,
                "prev_points": nc.prev_points,
                "prev_order": nc.prev_order,
                "skip": out.skip,
                "transformation": out.transformation,
                "carry": nc,
                "outputs": out,
            }
            return tuple(items[n] for n in names)
        return f

    timeit(make("base"), label="base (kf state + moving pts)")
    for extra in ("fitness", "som", "residuals", "classifications", "labels",
                  "prev_points", "prev_order", "skip", "transformation"):
        timeit(make("base", extra), label=f"base + {extra}")
    timeit(make("carry"), label="carry only")
    timeit(make("outputs"), label="outputs only")
    timeit(make("carry", "outputs"), label="carry + outputs (== step)")

    print(json.dumps({"metric": "diag_gmfa_liveness", "value": results.get(
        "carry + outputs (== step)"), "unit": "ms", "stages": results}))


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_gmfa_liveness", unit="ms")
