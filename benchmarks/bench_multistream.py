"""BASELINE config[4] (single-chip form): 4 concurrent 1080p DATMO streams,
advanced together in one device program on one chip (on a multi-chip slice the
same streams map one per device via parallel.streams.make_multi_stream_step).

Stream mode: each stream carries its previous frame's coefficient pyramid, so
per new frame only that frame's polynomial expansion runs (plus the Pallas
shift-decomposition warp and fused blur/solve).

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

    from datmo_using_optical_flow_tpu.utils.compile_cache import enable as _ec
    _ec()
    import jax.numpy as jnp

    from bench import make_frames
    from datmo_using_optical_flow_tpu.config import CapacityConfig, PipelineAConfig
    from datmo_using_optical_flow_tpu.models.optical_flow_datmo import (
        PipelineA, _stream_step_impl)

    h, w, n_streams = 1080, 1920, 4
    cfg = PipelineAConfig(
        x_range=(0.0, h * 0.1), y_range=(0.0, w * 0.1), grid_resolution=(0.1, 0.1),
        capacities=CapacityConfig(max_cells=4096, max_clusters=32, max_tracks=64),
    )
    # enough frames per sync that the ~27 ms tunnel roundtrip amortizes the way
    # it does in production (streams dispatch asynchronously and only the
    # consumer syncs); 3 frames/sync under-reported aggregate FPS by ~20%
    n_frames = 9
    frames = np.stack([make_frames(n_frames, h, w, seed=s) for s in range(n_streams)])
    dev_frames = [jnp.asarray(frames[:, t]) for t in range(n_frames)]

    pipe = PipelineA(cfg)
    carry0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_streams,) + x.shape),
        pipe.init_stream_carry())

    @jax.jit
    def step(bevs, c):
        # one program advancing all streams by one frame; sequential per stream
        # (a vmapped step lowers the warp/DBSCAN stages pathologically)
        carries, cells = [], []
        for s in range(bevs.shape[0]):
            cs = jax.tree.map(lambda v: v[s], c)
            nc, outs = _stream_step_impl(bevs[s], cs, cfg=cfg, fast_warp=True,
                                         use_pallas=True)
            carries.append(nc)
            cells.append(outs.cell_count)
        new_c = jax.tree.map(lambda *vs: jnp.stack(vs), *carries)
        return new_c, jnp.sum(jnp.stack(cells))

    t0 = time.time()
    carry, cells = step(dev_frames[0], carry0)  # prime the pyramids
    _ = int(cells)
    print(f"compile+prime: {time.time() - t0:.1f}s", file=sys.stderr)

    reps = 3
    done = 0
    elapsed = 0.0
    for _ in range(reps):
        carry, cells = step(dev_frames[0], carry)  # re-prime (not timed)
        _ = int(cells)
        t0 = time.time()
        for t in range(1, n_frames):
            carry, cells = step(dev_frames[t], carry)
            done += n_streams
        _ = int(cells)
        elapsed += time.time() - t0
    agg = done / elapsed
    print(f"{done} stream-frames in {elapsed:.2f}s; cells={int(cells)}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "multistream_datmo_fps_4x1080p_single_chip",
        "value": round(agg, 3),
        "unit": "frames/s aggregate",
        "per_stream_fps": round(agg / n_streams, 3),
    }))


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="multistream_datmo_fps_4x1080p_single_chip", unit="frames/s")
