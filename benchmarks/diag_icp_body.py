"""Isolate the cached-ICP loop body's ~5 ms/iteration fixed cost (diagnostics).

profile_icp measured the 30-iteration cached ICP at 7.04 ms/iteration while
the 16%-active sweep should cost ~2 ms (linear share of the 12.7 ms full
sweep).  This script times 30-step while_loops whose bodies contain ONLY a
component each, so the fixed cost decomposes:

* svd-only: Kabsch with its 3x3 SVD on fixed correspondences;
* cache-math-only: eval_cached's elementwise certificate/exclusion algebra
  (no NN kernel call);
* partition-only: the cumsum stable partition + un-permute gathers;
* pallas-tiny: a minimal pallas call per step (while-step scheduling);
* empty: carry arithmetic only (while_loop floor).

Each body perturbs its carry so nothing hoists.
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

from datmo_using_optical_flow_tpu.ops.icp import _kabsch

N = 102400
ITERS = 30
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
    dt = best - _RT[0]
    print(f"{name:56s} {dt:8.2f} ms total  {dt / ITERS:6.3f} ms/iter", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-20, 20, (N, 3)), jnp.float32)
    dst = jnp.asarray(rng.uniform(-20, 20, (N, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(0, 1, (N,)) < 0.01, jnp.float32)

    tiny = jax.jit(lambda a: a + 1.0)
    sync(tiny(jnp.float32(1)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(tiny(jnp.float32(1)))
        rts.append((time.perf_counter() - t0) * 1000)
    _RT[0] = min(rts)
    print(f"dispatch+readback constant: {_RT[0]:.1f} ms (subtracted)", flush=True)

    # --- empty loop floor ---
    @jax.jit
    def run_empty(s):
        def body(c):
            i, acc = c
            return i + 1, acc * 1.0000001 + 1.0
        return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                                  (0, jnp.float32(0)))

    timed("empty while_loop (carry arithmetic only)", run_empty, src)

    # --- svd/kabsch only ---
    @jax.jit
    def run_svd(s, d, wgt):
        def body(c):
            i, t = c
            upd = _kabsch(s + t[0, 0] * 1e-30, d, wgt)
            return i + 1, upd @ t
        return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                                  (0, jnp.eye(4)))

    timed("kabsch+svd per step (fixed corr)", run_svd, src, dst, w)

    # --- kabsch without svd: centroids + H matmul only ---
    @jax.jit
    def run_h(s, d, wgt):
        def body(c):
            i, acc = c
            ww = jnp.maximum(jnp.sum(wgt), 1e-12)
            cs = jnp.sum(s * wgt[:, None], axis=0) / ww + acc[0, 0] * 1e-30
            cd = jnp.sum(d * wgt[:, None], axis=0) / ww
            sc = (s - cs) * wgt[:, None]
            dc = d - cd
            h = jnp.matmul(sc.T, dc, precision=jax.lax.Precision.HIGHEST)
            return i + 1, acc + jnp.pad(h, ((0, 1), (0, 1)))
        return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                                  (0, jnp.zeros((4, 4))))

    timed("kabsch H-matmul only (no svd)", run_h, src, dst, w)

    # --- eval_cached elementwise algebra only ---
    @jax.jit
    def run_cache(s, d, wgt):
        lo0 = jnp.abs(s[:, 0]) * 0.1
        qw0 = d
        qpos0 = s
        b20 = jnp.abs(s[:, 1]) * 0.2
        thr2 = jnp.float32(4e-4)

        def body(c):
            i, lo, qw, qpos, b2, acc = c
            t = jnp.eye(3) + acc * 1e-30
            pts = s @ t.T + 0.001
            delta = jnp.linalg.norm(pts - qpos, axis=1) + 1e-4
            lo_new = jnp.sqrt(lo) - delta
            excluded = (lo_new > 0.0) & (lo_new * lo_new > thr2)
            dw2 = jnp.sum((pts - qw) ** 2, axis=1)
            b2_dec = jnp.sqrt(b2) - delta
            certified = ~excluded & (jnp.sqrt(dw2) + 1e-4 < b2_dec)
            need = ~excluded & ~certified
            d2 = jnp.where(need, dw2, jnp.where(certified, dw2, jnp.inf))
            b2n = jnp.where(need, b2, jnp.maximum(b2_dec, 0.0) ** 2)
            lon = jnp.where(need, lo, jnp.where(certified, dw2, lo))
            qposn = jnp.where((need | certified)[:, None], pts, qpos)
            acc2 = jnp.sum(d2 * (d2 < 1e9)) * 1e-30
            return i + 1, lon, qw, qposn, b2n, acc + acc2
        return jax.lax.while_loop(
            lambda c: c[0] < ITERS, body,
            (0, lo0, qw0, qpos0, b20, jnp.float32(0)))

    timed("eval_cached elementwise algebra (no kernel)", run_cache, src, dst, w)

    # --- cumsum partition + gathers only ---
    @jax.jit
    def run_part(s, d, wgt):
        active0 = wgt > 0.5

        def body(c):
            i, acc = c
            active = active0 ^ (i % 2 == 1)
            a32 = active.astype(jnp.int32)
            csum = jnp.cumsum(a32)
            na = csum[-1]
            ar = jnp.arange(N, dtype=jnp.int32)
            pos = jnp.where(active, csum - 1, na + (ar - csum))
            src_c = jnp.zeros((N, 3), jnp.float32).at[pos].set(
                s + acc * 1e-30, unique_indices=True)
            packed = jnp.concatenate([src_c, src_c], axis=1)[pos]
            return i + 1, acc + jnp.sum(packed[:, 0]) * 1e-30
        return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                                  (0, jnp.float32(0)))

    timed("cumsum partition + scatter + gathers", run_part, src, dst, w)

    # --- tiny pallas call per step ---
    from jax.experimental import pallas as pl

    def _k(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    def tiny_pallas(x):
        return pl.pallas_call(
            _k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)

    @jax.jit
    def run_pallas(s, d, wgt):
        def body(c):
            i, x = c
            return i + 1, tiny_pallas(x)
        return jax.lax.while_loop(lambda c: c[0] < ITERS, body,
                                  (0, jnp.zeros((8, 128), jnp.float32)))

    timed("one tiny pallas call per step", run_pallas, src, dst, w)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_icp_body", unit="diagnostic")
