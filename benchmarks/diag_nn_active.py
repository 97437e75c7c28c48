"""Decompose the compact-sweep per-call cost at ICP's per-iteration load.

profile_icp + diag_icp_body put the cached-ICP iteration at 7.04 ms of which
the partition costs 1.29 and the loop body algebra ~0.1 — leaving ~5.6 ms in
``nearest_neighbors_active``'s kernel call.  Candidates: the per-iteration
``build_block_table`` (ball+AABB over 400x400 block/tile pairs + a 400-wide
argsort per block), the static 400-block grid (384 of which skip at ~7 us
each), and the true sweep work.  This script times:

* nearest_neighbors_active end-to-end at a realistic 13.5k scattered active
  subset (the ICP steady state);
* build_block_table alone;
* nearest_neighbors_pallas alone with a PREBUILT table at n_active=13.5k
  (compacted src) — isolates grid+sweep;
* the same with n_active=102400 (full) for the variable-cost slope;
* a DYNAMIC grid variant of the same kernel call (grid = cdiv(n_active, 256)
  traced) to price the skipped-block overhead directly.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from datmo_using_optical_flow_tpu.utils.compile_cache import enable as _ec

_ec()
import jax.numpy as jnp
import numpy as np

from datmo_using_optical_flow_tpu.ops import nn_pallas
from datmo_using_optical_flow_tpu.ops.nn import nearest_neighbors_active

N = 102400
REPS = 8
_RT = [0.0]


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timed(name, fn, *args):
    sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, (time.perf_counter() - t0) * 1000)
    dt = (best - _RT[0]) / REPS
    print(f"{name:56s} {dt:8.3f} ms/call", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    # CARLA-like cloud: ground plane + structures, densified-style jitter
    base = rng.uniform([-20, -20, -1], [20, 5, 2], (N // 10, 3))
    pts = np.repeat(base, 10, 0) + rng.normal(0, 0.01, (N, 3))
    src = jnp.asarray(pts, jnp.float32)
    tgt = jnp.asarray(pts + rng.normal(0, 0.02, (N, 3)), jnp.float32)
    tmask = jnp.ones((N,), bool)
    smask = jnp.ones((N,), bool)

    order = jax.jit(nn_pallas.sort_order)(src, smask)
    src_m = src[order]
    index = jax.jit(nn_pallas.build_target_index)(tgt, tmask)

    act = np.zeros(N, bool)
    act[rng.permutation(N)[:13500]] = True     # scattered actives (ICP steady state)
    active = jnp.asarray(act)
    cap2 = jnp.float32((0.1) ** 2)

    tiny = jax.jit(lambda a: a + 1.0)
    sync(tiny(jnp.float32(1)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(tiny(jnp.float32(1)))
        rts.append((time.perf_counter() - t0) * 1000)
    _RT[0] = min(rts)
    print(f"dispatch+readback constant: {_RT[0]:.1f} ms (subtracted; REPS={REPS})",
          flush=True)

    # --- end-to-end active query (partition + table + kernel + unpermute) ---
    @jax.jit
    def run_active(s, a):
        acc = jnp.float32(0)
        for _ in range(REPS):
            _, d2, lo, b2, crd = nearest_neighbors_active(
                s + acc * 1e-30, tgt, tmask, a, index=index, cap2=cap2)
            acc = jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0)) * 1e-30
        return acc

    timed("nearest_neighbors_active 13.5k scattered", run_active, src_m, active)

    # --- end-to-end with the r5 tiered gather/scatter partition ---
    @jax.jit
    def run_active_capped(s, a):
        acc = jnp.float32(0)
        for _ in range(REPS):
            _, d2, lo, b2, crd = nearest_neighbors_active(
                s + acc * 1e-30, tgt, tmask, a, index=index, cap2=cap2,
                active_cap=(16384, 32768))
            acc = jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0)) * 1e-30
        return acc

    timed("nearest_neighbors_active 13.5k capped(16k,32k)", run_active_capped,
          src_m, active)

    # --- the partition pieces alone (top_k + gather + packed scatter) ---
    @jax.jit
    def run_partition(s, a):
        acc = jnp.float32(0)
        N_ = s.shape[0]
        for _ in range(REPS):
            iota = jnp.arange(N_, dtype=jnp.int32)
            sentinel = jnp.int32(-(2 ** 31) + 1)
            keys = jnp.where(a, -iota, sentinel) + (acc * 1e-30).astype(jnp.int32)
            vals, _ = jax.lax.top_k(keys, 16384)
            okay = vals > sentinel
            rows = jnp.where(okay, -vals, 0)
            pre = s[rows]
            packed = jnp.concatenate(
                [jax.lax.bitcast_convert_type(pre, jnp.int32),
                 rows[:, None]], axis=1)
            dest = jnp.where(okay, rows, N_)
            out = jnp.zeros((N_, 4), jnp.int32).at[dest].set(packed, mode="drop")
            acc = jnp.sum(out[:, 3].astype(jnp.float32)) * 1e-30
        return acc

    timed("partition pieces (top_k16k + gather + scatter)", run_partition,
          src_m, active)

    # --- build_block_table alone ---
    @jax.jit
    def run_table(s):
        acc = jnp.float32(0)
        for _ in range(REPS):
            lb, torder = nn_pallas.build_block_table(s + acc * 1e-30, index, N)
            acc = (jnp.sum(jnp.where(jnp.isfinite(lb), lb, 0.0))
                   + jnp.sum(torder.astype(jnp.float32))) * 1e-30
        return acc

    timed("build_block_table (400 blocks x 400 tiles)", run_table, src_m)

    # --- kernel alone, prebuilt table, compacted prefix n_active ---
    csum = jnp.cumsum(active.astype(jnp.int32))
    n_act = csum[-1]
    ar = jnp.arange(N, dtype=jnp.int32)
    pos = jnp.where(active, csum - 1, n_act + (ar - csum))
    src_c = jnp.zeros((N, 3), jnp.float32).at[pos].set(src_m, unique_indices=True)
    table_c = jax.jit(lambda s: nn_pallas.build_block_table(s, index, N))(src_c)

    def mk_kernel(na):
        @jax.jit
        def run(s, tbl):
            acc = jnp.float32(0)
            for _ in range(REPS):
                _, d2, lo, b2, crd = nn_pallas.nearest_neighbors_pallas(
                    s + acc * 1e-30, index, n_active=na, cap2=cap2,
                    block_table=tbl)
                acc = jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0)) * 1e-30
            return acc
        return run

    timed("kernel only, prebuilt table, n_active=13.5k", mk_kernel(jnp.int32(13500)),
          src_c, table_c)
    timed("kernel only, prebuilt table, n_active=102400", mk_kernel(jnp.int32(N)),
          src_c, table_c)

    # --- dyn-grid kernel + capped-prefix table at the r5 production shape ---
    src_pre = src_c[:16384]
    table_pre = jax.jit(
        lambda s: nn_pallas.build_block_table(s, index, 16384))(src_pre)

    @jax.jit
    def run_dyn(s, tbl):
        acc = jnp.float32(0)
        for _ in range(REPS):
            _, d2, lo, b2, crd = nn_pallas.nearest_neighbors_pallas(
                s + acc * 1e-30, index, n_active=jnp.int32(13500), cap2=cap2,
                block_table=tbl, dyn_grid=True)
            acc = jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0)) * 1e-30
        return acc

    timed("kernel only DYN grid, 16k prefix table, n_active=13.5k", run_dyn,
          src_pre, table_pre)

    @jax.jit
    def run_table16(s):
        acc = jnp.float32(0)
        for _ in range(REPS):
            lb, torder = nn_pallas.build_block_table(s + acc * 1e-30, index, 16384)
            acc = (jnp.sum(jnp.where(jnp.isfinite(lb), lb, 0.0))
                   + jnp.sum(torder.astype(jnp.float32))) * 1e-30
        return acc

    timed("build_block_table 16384 prefix (64 x 400)", run_table16, src_pre)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_nn_active", unit="diagnostic")
