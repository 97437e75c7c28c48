"""BASELINE config[4] (single-chip form): 4 concurrent 1080p DATMO streams,
batched with vmap on one chip (on a multi-chip slice the same streams map one
per device via parallel.streams.make_multi_stream_step).

Prints a JSON line with per-stream and aggregate FPS.
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

    from bench import make_frames
    from datmo_using_optical_flow_tpu.config import CapacityConfig, PipelineAConfig
    from datmo_using_optical_flow_tpu.models import tracker_a
    from datmo_using_optical_flow_tpu.models.optical_flow_datmo import (StepCarry,
                                                                        _step_impl)

    h, w, n_streams = 1080, 1920, 4
    cfg = PipelineAConfig(
        x_range=(0.0, h * 0.1), y_range=(0.0, w * 0.1), grid_resolution=(0.1, 0.1),
        capacities=CapacityConfig(max_cells=4096, max_clusters=32, max_tracks=64),
    )
    frames = np.stack([make_frames(3, h, w, seed=s) for s in range(n_streams)])
    b1 = jnp.asarray(frames[:, 0])
    b2 = jnp.asarray(frames[:, 1])

    def rep(x):
        return jnp.broadcast_to(x, (n_streams,) + x.shape)

    base = StepCarry(prev_vx=jnp.zeros((h, w), jnp.float32),
                     prev_vy=jnp.zeros((h, w), jnp.float32),
                     has_prev=jnp.asarray(False),
                     table=tracker_a.new_track_table(cfg.capacities.max_tracks))
    carry = jax.tree.map(rep, base)

    @jax.jit
    def step(a, b, c):
        # one program advancing all streams; sequential per stream rather than
        # vmapped (batched gathers lower pathologically on this backend)
        fn = lambda x, y, cc: _step_impl(x, y, cc, cfg=cfg, fast_warp=True,
                                         use_pallas=False)
        carries, cells = [], []
        for s in range(a.shape[0]):
            cs = jax.tree.map(lambda v: v[s], c)
            nc, outs = fn(a[s], b[s], cs)
            carries.append(nc)
            cells.append(outs.cell_count)
        new_c = jax.tree.map(lambda *vs: jnp.stack(vs), *carries)
        return new_c, jnp.sum(jnp.stack(cells))

    t0 = time.time()
    carry, cells = step(b1, b2, carry)
    _ = int(cells)
    print(f"compile+run: {time.time() - t0:.1f}s; total cells {int(cells)}",
          file=sys.stderr)

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        carry, cells = step(b1, b2, carry)
        _ = int(cells)
    elapsed = time.time() - t0
    agg = n_streams * reps / elapsed

    print(json.dumps({
        "metric": "multistream_datmo_fps_4x1080p_single_chip",
        "value": round(agg, 3),
        "unit": "frames/s aggregate",
        "per_stream_fps": round(agg / n_streams, 3),
    }))


if __name__ == "__main__":
    main()
