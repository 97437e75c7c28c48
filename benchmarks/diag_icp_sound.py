"""Direct soundness probe of the NN kernel's certified lower bound at
reference load (r4: every cached ICP variant converges to a lower-fitness
transform than the exact loop, implying rows are wrongly excluded).

Contract under test (ops/nn_pallas.nearest_neighbors_pallas via
ops/nn.nearest_neighbors_with_bound): for every valid source row,
``lo <= true NN d2`` (sound lower bound), and the returned winner of sub-cap
rows is the true NN.  Checked against an independent exact XLA tiled scan.

Also probes one exclusion step: perturb the cloud by a rigid ~2 mm update
(an ICP-like displacement), apply the reverse-triangle decay, and count rows
the shell would exclude whose TRUE d2 at the new position is inside the
0.02 gate — every such row is a correctness violation.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    from datmo_using_optical_flow_tpu.utils.compile_cache import enable as _ec
    _ec()
    import jax.numpy as jnp

    from datmo_using_optical_flow_tpu.config import CapacityConfig, GMFAConfig
    from datmo_using_optical_flow_tpu.io.frames import pad_points
    from datmo_using_optical_flow_tpu.models.gmfa import GMFAPipeline
    from datmo_using_optical_flow_tpu.ops.nn import nearest_neighbors_with_bound
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
    src, src_m = clouds[0]
    tgt, tgt_m = clouds[1]
    thr = cfg.icp.threshold
    thr2 = thr * thr
    cap = 5.0 * thr
    report = {}

    @jax.jit
    def kernel_sweep(s, t, tm, cap2):
        idx, d2, lo = nearest_neighbors_with_bound(s, t, tm, cap2=cap2)
        return idx, d2, lo

    # f64 KDTree ground truth (the XLA scan fallback's expansion form carries
    # ~1e-3 absolute d2 noise at ROI scale — it is NOT a valid oracle here)
    from scipy.spatial import cKDTree
    tgt_np = np.asarray(tgt, np.float64)
    tm_np = np.asarray(tgt_m)
    valid_idx = np.flatnonzero(tm_np)
    tree = cKDTree(tgt_np[valid_idx])
    src_np = np.asarray(src, np.float64)

    def exact_sweep(pts):
        d, i = tree.query(np.asarray(pts, np.float64), k=1)
        return valid_idx[i], (d * d).astype(np.float64)

    idx_t, d2_t = exact_sweep(src_np)
    sm = np.asarray(src_m)

    for name, cap2 in (("capped", cap * cap), ("uncapped", None)):
        idx_k, d2_k, lo_k = kernel_sweep(src, tgt, tgt_m, cap2)
        idx_k, d2_k, lo_k = (np.asarray(x) for x in (idx_k, d2_k, lo_k))
        # soundness: lo <= true d2 (+tiny f32 tolerance on the exact scan)
        viol = sm & (lo_k > d2_t + 1e-6 + 1e-5 * np.sqrt(d2_t))
        nv = int(viol.sum())
        report[f"{name}_lo_violations"] = nv
        print(f"[{name}] lo > true d2 on {nv} rows", file=sys.stderr)
        if nv:
            rows = np.flatnonzero(viol)[:8]
            for r in rows:
                print(f"    row {r}: lo {lo_k[r]:.6e} true d2 {d2_t[r]:.6e} "
                      f"kernel d2 {d2_k[r]:.6e} idx k/t {idx_k[r]}/{idx_t[r]}",
                      file=sys.stderr)
        # sub-cap exactness: rows with true d2 < cap^2 must return the true NN d2
        sub = sm & (d2_t < (cap * cap if cap2 else np.inf) - 1e-9)
        bad = sub & (np.abs(d2_k - d2_t) > 1e-6)
        nb = int(bad.sum())
        report[f"{name}_subcap_mismatch"] = nb
        print(f"[{name}] sub-cap d2 mismatch on {nb} rows", file=sys.stderr)
        if nb:
            rows = np.flatnonzero(bad)[:8]
            for r in rows:
                print(f"    row {r}: kernel d2 {d2_k[r]:.6e} true {d2_t[r]:.6e} "
                      f"idx k/t {idx_k[r]}/{idx_t[r]}", file=sys.stderr)

    # one exclusion step with an ICP-like 2 mm displacement
    ang = 1e-4
    c, s_ = np.cos(ang), np.sin(ang)
    rot = jnp.asarray(np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1]], np.float32))
    pts1 = src @ rot.T + jnp.asarray(np.array([0.002, -0.001, 0.0005], np.float32))
    _, _, lo0 = kernel_sweep(src, tgt, tgt_m, cap * cap)
    delta = jnp.linalg.norm(pts1 - src, axis=1) + 1e-4
    lo_new = jnp.sqrt(lo0) - delta
    excluded = np.asarray((lo_new > 0.0) & (lo_new * lo_new > thr2)) & sm
    _, d2_t1 = exact_sweep(np.asarray(pts1))
    viol_ex = excluded & (d2_t1 <= thr2)
    report["exclusion_violations"] = int(viol_ex.sum())
    report["excluded_total"] = int(excluded.sum())
    print(f"exclusion step: {int(excluded.sum())} excluded, "
          f"{int(viol_ex.sum())} violations (true d2 inside gate)", file=sys.stderr)

    print(json.dumps({"metric": "diag_icp_sound",
                      "value": report.get("exclusion_violations"),
                      "unit": "violations", "detail": report}))


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="diag_icp_sound", unit="violations")
