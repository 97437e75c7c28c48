"""Isolate the flow-upsample resize cost at the 1080p workload (diagnostics).

The stream step's final inter-level flow upsample (dx, dy: 324x576 ->
1080x1920 at pyr_scale 0.3) rides the XLA static-index take path
(ops/farneback.resize_bilinear).  Byte floor is ~18 MB -> ~0.25 ms; the
stage-table estimate has it at ~2 ms.  Variants timed here:

* current: per-axis jnp.take (rows then columns — the column take is the
  suspected cost: a minor-axis gather is a lane shuffle per index);
* transposed: rows via take, then transpose -> row-take -> transpose back;
* polyphase: 1080/324 == 1920/576 == 10/3 exactly, so each of 10 output
  phases is a fixed lerp of two stride-3 input slices (interior-exact only
  here — edge rows/cols clip differently; timing probe, not a correctness
  candidate yet);
* matmul: the resize as two banded-matrix products on the MXU at HIGHEST.
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

from datmo_using_optical_flow_tpu.ops.farneback import resize_bilinear

IH, IW = 324, 576
OH, OW = 1080, 1920
REPS = 16
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
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return dt


def _axis_tables(h, out):
    sy = h / out
    fy = (np.arange(out) + 0.5) * sy - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int32), 0, max(h - 2, 0))
    wy = np.clip(fy - y0, 0.0, 1.0).astype(np.float32)
    y1 = np.minimum(y0 + 1, h - 1)
    return y0, y1, wy


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    img2 = jnp.asarray(rng.normal(size=(2, IH, IW)), jnp.float32)

    tiny = jax.jit(lambda a: a + 1.0)
    _sync(tiny(jnp.float32(1)))
    rts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny(jnp.float32(1)))
        rts.append((time.perf_counter() - t0) * 1000)
    _RT[0] = min(rts)
    print(f"dispatch+readback constant: {_RT[0]:.1f} ms", flush=True)

    # --- current path ---
    @jax.jit
    def run_current(im):
        acc = jnp.float32(0)
        for _ in range(REPS):
            out = resize_bilinear(im + acc * 1e-30, OH, OW)
            acc = jnp.sum(out) * 1e-30
        return acc

    timed("resize_bilinear current (take/take)", run_current, img2)

    y0, y1, wy = _axis_tables(IH, OH)
    x0, x1, wx = _axis_tables(IW, OW)

    # --- transpose-based columns ---
    @jax.jit
    def run_transpose(im):
        acc = jnp.float32(0)
        wyj = jnp.asarray(wy)[:, None]
        wxj = jnp.asarray(wx)[:, None]
        for _ in range(REPS):
            a = im + acc * 1e-30
            v = jnp.take(a, y0, axis=-2) * (1 - wyj) \
                + jnp.take(a, y1, axis=-2) * wyj
            vt = jnp.swapaxes(v, -1, -2)
            ot = jnp.take(vt, x0, axis=-2) * (1 - wxj) \
                + jnp.take(vt, x1, axis=-2) * wxj
            out = jnp.swapaxes(ot, -1, -2)
            acc = jnp.sum(out) * 1e-30
        return acc

    timed("transpose columns (take rows both axes)", run_transpose, img2)

    # --- polyphase (10/3), interior-pattern only ---
    # phase p of the output along an axis: fy = q*3 + (p+0.5)*0.3 - 0.5
    L, M = 10, 3
    py0 = [int(np.floor((p + 0.5) * M / L - 0.5)) for p in range(L)]
    pwy = [np.float32((p + 0.5) * M / L - 0.5 - py0[p]) for p in range(L)]

    @jax.jit
    def run_polyphase(im):
        acc = jnp.float32(0)
        for _ in range(REPS):
            a = im + acc * 1e-30                       # (2, IH, IW)
            ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1)))   # slack for offsets -1/+1
            # rows: build (2, L, IH/M? ...) — interior only: q in [0, OH/L)
            rows = []
            for p in range(L):
                o = py0[p] + 1                          # +1 for the pad
                r0 = ap[:, o:o + (OH // L) * M:M, 1:1 + IW]
                r1 = ap[:, o + 1:o + 1 + (OH // L) * M:M, 1:1 + IW]
                rows.append(r0 * (1 - pwy[p]) + r1 * pwy[p])
            v = jnp.stack(rows, axis=2).reshape(2, OH, IW)
            vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1)))
            cols = []
            for p in range(L):
                o = py0[p] + 1
                c0 = vp[:, :, o:o + (OW // L) * M:M]
                c1 = vp[:, :, o + 1:o + 1 + (OW // L) * M:M]
                cols.append(c0 * (1 - pwy[p]) + c1 * pwy[p])
            out = jnp.stack(cols, axis=3).reshape(2, OH, OW)
            acc = jnp.sum(out) * 1e-30
        return acc

    timed("polyphase 10/3 (strided slices, interior)", run_polyphase, img2)

    # --- matmul on MXU ---
    Wy = np.zeros((OH, IH), np.float32)
    Wy[np.arange(OH), y0] += 1 - wy
    Wy[np.arange(OH), y1] += wy
    Wx = np.zeros((IW, OW), np.float32)
    Wx[x0, np.arange(OW)] += 1 - wx
    Wx[x1, np.arange(OW)] += wx
    Wyj = jnp.asarray(Wy)
    Wxj = jnp.asarray(Wx)

    @jax.jit
    def run_matmul(im):
        acc = jnp.float32(0)
        for _ in range(REPS):
            a = im + acc * 1e-30
            v = jnp.einsum("oh,bhw->bow", Wyj, a,
                           precision=jax.lax.Precision.HIGHEST)
            out = jnp.einsum("bow,wq->boq", v, Wxj,
                             precision=jax.lax.Precision.HIGHEST)
            acc = jnp.sum(out) * 1e-30
        return acc

    timed("banded matmul (MXU, HIGHEST)", run_matmul, img2)

    # value agreement (interior) for the polyphase form
    ref = resize_bilinear(img2, OH, OW)
    # recompute polyphase output once for comparison
    a = img2
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1)))
    rows = []
    for p in range(L):
        o = py0[p] + 1
        r0 = ap[:, o:o + (OH // L) * M:M, 1:1 + IW]
        r1 = ap[:, o + 1:o + 1 + (OH // L) * M:M, 1:1 + IW]
        rows.append(r0 * (1 - pwy[p]) + r1 * pwy[p])
    v = jnp.stack(rows, axis=2).reshape(2, OH, IW)
    vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1)))
    cols = []
    for p in range(L):
        o = py0[p] + 1
        c0 = vp[:, :, o:o + (OW // L) * M:M]
        c1 = vp[:, :, o + 1:o + 1 + (OW // L) * M:M]
        cols.append(c0 * (1 - pwy[p]) + c1 * pwy[p])
    poly = jnp.stack(cols, axis=3).reshape(2, OH, OW)
    interior = jnp.max(jnp.abs((poly - ref)[:, 8:-8, 8:-8]))
    edge = jnp.max(jnp.abs(poly - ref))
    print(f"polyphase vs current: interior max|d| {float(interior):.2e}, "
          f"incl. edges {float(edge):.2e}", flush=True)
    mm = jnp.einsum("oh,bhw->bow", Wyj, img2,
                    precision=jax.lax.Precision.HIGHEST)
    mm = jnp.einsum("bow,wq->boq", mm, Wxj,
                    precision=jax.lax.Precision.HIGHEST)
    print(f"matmul vs current: max|d| {float(jnp.max(jnp.abs(mm - ref))):.2e}",
          flush=True)


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_resize", unit="diagnostic")
