"""Output-liveness bisection of the DATMO tail at 1080p (diagnostics).

profile_tail measured the full tail at 4.3 ms while each sub-stage in
isolation (with checksummed outputs, which XLA fuses into reductions — no
HBM materialization) measures ~0.  So the cost is in materializing specific
outputs or in cross-stage scheduling.  Technique from diag_gmfa_liveness
(which isolated the +1120 ms icp.fitness pathology): run the REAL tail but
keep only one output (or output group) live at a time.
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
from datmo_using_optical_flow_tpu.models.optical_flow_datmo import (
    PipelineA, _datmo_tail, _stream_step_impl)

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
    print(f"{name:52s} {dt:8.2f} ms   (raw {min(runs):.1f})", flush=True)
    return dt


def checksum(tree):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree))


def main():
    cfg = PipelineAConfig(
        x_range=(0.0, H * 0.1), y_range=(0.0, W * 0.1), grid_resolution=(0.1, 0.1),
        capacities=CapacityConfig(max_cells=4096, max_clusters=32, max_tracks=64),
    )
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

    carry = pipe.init_stream_carry()
    step = jax.jit(lambda b, cr: _stream_step_impl(b, cr, cfg=cfg, fast_warp=True,
                                                   use_pallas=True))
    carry, _ = step(jnp.asarray(frames[0]), carry)
    carry, out = step(jnp.asarray(frames[1]), carry)
    flow = jnp.stack([out.raw_velocity_x / ((cfg.x_range[1] - cfg.x_range[0]) / W),
                      out.raw_velocity_y / ((cfg.y_range[1] - cfg.y_range[0]) / H)],
                     axis=-1)

    def mk(select, label):
        @jax.jit
        def run(f, cr):
            acc = jnp.float32(0)
            for _ in range(REPS):
                c2, o = _datmo_tail(f + acc * 1e-30, jnp.asarray(True),
                                    cr.step, cfg)
                acc = checksum(select(c2, o))
            return acc
        return timed(label, run, flow, carry)

    mk(lambda c, o: (c, o), "FULL (carry + outputs)")
    mk(lambda c, o: c, "carry only")
    mk(lambda c, o: (c.prev_vx, c.prev_vy), "carry grids only (no table)")
    mk(lambda c, o: c.table, "carry table only")
    mk(lambda c, o: o.velocity_x, "out.velocity_x only")
    mk(lambda c, o: (o.velocity_x, o.velocity_y, o.magnitude, o.angular,
                     o.raw_velocity_x, o.raw_velocity_y),
       "out grids only (6 planes)")
    mk(lambda c, o: (o.labels, o.rows, o.cols, o.cell_count),
       "out dbscan results only")
    mk(lambda c, o: o.snapshot, "out tracker snapshot only")
    mk(lambda c, o: o.cell_overflow, "out cell_overflow only")


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_tail_liveness", unit="diagnostic")
