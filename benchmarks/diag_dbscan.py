"""Per-phase cost of the velocity-grid DBSCAN at production load (diagnostics).

diag_tail_liveness put the whole DATMO tail's 4.2 ms in the DBSCAN->tracker
chain.  This isolates the phases on REAL compacted features (4096-cap, real
1080p frame): core-mask construction (one 4096^2 matmul), the label
propagation while_loop at increasing max_rounds (is the per-round cost the
fused 16 MB adjacency read, or a materialized 67 MB select?), and the
compaction top_k over the 2.07M-cell mask (with a per-rep-varying mask so
nothing hoists).
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
    PipelineA, _stream_step_impl)
from datmo_using_optical_flow_tpu.ops import masks as mask_ops
from datmo_using_optical_flow_tpu.ops.dbscan import dbscan
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
    print(f"{name:52s} {dt:8.2f} ms   (raw {min(runs):.1f})", flush=True)
    return dt


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

    carry = pipe.init_stream_carry()
    step = jax.jit(lambda b, cr: _stream_step_impl(b, cr, cfg=cfg, fast_warp=True,
                                                   use_pallas=True))
    carry, _ = step(jnp.asarray(frames[0]), carry)
    carry, out = step(jnp.asarray(frames[1]), carry)
    vxf, vyf = out.velocity_x, out.velocity_y
    valid = out.magnitude > c.velocity_threshold
    print(f"valid cells: {int(jnp.sum(valid))} (cap {c.capacities.max_cells})",
          flush=True)

    h, w = c.grid_shape
    rows = (jnp.arange(h * w, dtype=jnp.int32) // w).astype(jnp.float32)
    cols = (jnp.arange(h * w, dtype=jnp.int32) % w).astype(jnp.float32)

    # --- compaction with per-rep-varying features (top_k can't hoist when the
    # mask varies: flip one far-out cell per rep) ---
    @jax.jit
    def run_compact(vmask, vx, vy):
        acc = jnp.float32(0)
        flat = vmask.reshape(-1)
        for r in range(REPS):
            m = flat.at[r].set(~flat[r])    # per-rep distinct mask
            feats_full = jnp.stack([rows, cols, vx.reshape(-1) + acc * 1e-30,
                                    vy.reshape(-1)], axis=1)
            feats, cmask, count = compact_masked(
                feats_full, m, c.capacities.max_cells, fill_value=3e18)
            acc = (jnp.sum(jnp.where(cmask[:, None], feats, 0.0))
                   + count.astype(jnp.float32)) * 1e-30
        return acc

    timed("compact_masked (varying mask)", run_compact, valid, vxf, vyf)

    feats_full = jnp.stack([rows, cols, vxf.reshape(-1), vyf.reshape(-1)], axis=1)
    feats, cmask, count = compact_masked(feats_full, valid.reshape(-1),
                                         c.capacities.max_cells, fill_value=3e18)

    # --- dbscan phases ---
    def mk_dbscan(max_rounds):
        @jax.jit
        def run(f, m):
            acc = jnp.float32(0)
            for _ in range(REPS):
                labels, core = dbscan(f + acc * 1e-30, m, c.dbscan.eps,
                                      c.dbscan.min_samples, max_rounds=max_rounds)
                acc = (jnp.sum(labels.astype(jnp.float32))
                       + jnp.sum(core.astype(jnp.float32))) * 1e-30
            return acc
        return run

    t1 = timed("dbscan max_rounds=1", mk_dbscan(1), feats, cmask)
    t2 = timed("dbscan max_rounds=2", mk_dbscan(2), feats, cmask)
    t4 = timed("dbscan max_rounds=4", mk_dbscan(4), feats, cmask)
    t64 = timed("dbscan max_rounds=64 (default)", mk_dbscan(64), feats, cmask)
    print(f"  -> per-round slope ~{(t4 - t1) / 3:.2f} ms; "
          f"implied rounds at default ~{(t64 - t1) / max((t4 - t1) / 3, 1e-6) + 1:.1f}",
          flush=True)

    # cluster count sanity
    labels, core = dbscan(feats, cmask, c.dbscan.eps, c.dbscan.min_samples)
    print(f"clusters: {int(jnp.max(labels)) + 1}, cores: {int(jnp.sum(core))}",
          flush=True)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_dbscan", unit="diagnostic")
