"""From-points end-to-end throughput (VERDICT r2 item 5): PCD decode ->
preprocess (flip -> RANSAC ground removal -> ROI -> x10 densify -> 200x200
BEV) -> stream step (pyramidal Farnebäck + masks + DBSCAN + EKF tracking) ->
saving_utils-parity artifact mirroring, measured as one stream at the
reference's production shape: CARLA-spec ~56k raw points/frame
(``single_target_simultion.py:63-70``), x10 densification
(``Optical_flow/main.py:87``), 200x200 BEV at 0.2 m
(``Optical_flow/config.yaml:3-5``).

Unlike bench.py's grid-fed 1080p headline, nothing is pre-formed here: the
measured loop starts from .pcd bytes on disk and ends with artifacts on disk
(the same boundary as the reference's ``process_multiple_frames``,
``Optical_flow/main.py:541``).  Prints ONE JSON line
{"metric": "from_pcd_fps", ...} with the per-stage breakdown.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


N_FRAMES = 25


def main() -> None:
    import jax

    from datmo_using_optical_flow_tpu.utils.compile_cache import enable as _ec
    _ec()

    from datmo_using_optical_flow_tpu.config import CapacityConfig, PipelineAConfig
    from datmo_using_optical_flow_tpu.models.optical_flow_datmo import PipelineA
    from datmo_using_optical_flow_tpu.sim.synthetic import (BoxTarget,
                                                            SyntheticScene,
                                                            write_synthetic_sequence)

    log(f"devices: {jax.devices()}")

    # Tunnel byte-rate probe (r4): at the production shape the measured loop
    # is HOST-LINK-bound, not compute-bound (device stages ~6 ms/frame vs
    # ~1.2 MB/frame of irreducible H2D raw points + D2H artifacts).  Record
    # the link rates so the roofline is explicit in every capture.
    import jax.numpy as jnp
    import numpy as np
    mb4 = np.zeros((1 << 20,), np.float32)  # 4 MB
    dev = jax.device_put(mb4)
    float(jnp.sum(dev))  # warm
    t0 = time.time()
    for _ in range(3):
        d = jax.device_put(mb4)
        float(jnp.sum(d))
    h2d = 3 * mb4.nbytes / (time.time() - t0) / 1e6
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(dev)
    d2h = 3 * mb4.nbytes / (time.time() - t0) / 1e6
    log(f"tunnel rates: H2D ~{h2d:.1f} MB/s, D2H ~{d2h:.1f} MB/s")

    cfg = PipelineAConfig(  # defaults = reference scale: 200x200 grid @ 0.2 m
        capacities=CapacityConfig(max_raw_points=65536, max_roi_points=8192,
                                  max_cells=4096, max_clusters=32, max_tracks=64))
    assert cfg.grid_shape == (200, 200)
    scene = SyntheticScene(
        ground_points=48000, ground_extent=20.0,
        static_boxes=(BoxTarget(center0=(7.0, 7.0, 1.0), velocity=(0, 0),
                                points_per_frame=2000),),
        targets=(BoxTarget(center0=(-4.0, -2.0, 0.75), velocity=(0.55, 0.3),
                           points_per_frame=3000),
                 BoxTarget(center0=(4.0, 3.0, 0.75), velocity=(-0.4, -0.45),
                           size=(3.0, 1.6, 1.4), points_per_frame=3000)),
        seed=77,
    )
    with tempfile.TemporaryDirectory() as tmp:
        seq_dir = os.path.join(tmp, "seq")
        paths = write_synthetic_sequence(scene, seq_dir, N_FRAMES)
        pipe = PipelineA(cfg)

        log("warmup pass (compiles preprocess + stream step)...")
        t0 = time.time()
        pipe.process_files(paths[:3], output_dir=os.path.join(tmp, "warm"))
        log(f"warmup: {time.time() - t0:.1f}s")

        out_dir = os.path.join(tmp, "out")
        t0 = time.time()
        summary = pipe.process_files(paths, output_dir=out_dir)
        elapsed = time.time() - t0
        fps = N_FRAMES / elapsed
        t = summary["timings"]
        log(f"{N_FRAMES} frames ({summary['pairs']} pairs) in {elapsed:.2f}s; "
            f"tracks={len(summary['tracks'])}")
        breakdown = {k: round(v / N_FRAMES * 1000, 2) for k, v in t.items()}
        # artifacts run on the background writer thread (overlapped with the
        # enqueue loop), so they don't sum with the loop-side stages
        other = (elapsed / N_FRAMES * 1000
                 - breakdown["preprocess"] - breakdown["step"])
        breakdown["io_decode_other"] = round(other, 2)
        log(f"per-frame breakdown (ms): {breakdown}")

        # q16 H2D mode (VERDICT r4 item 5): raw points ship as int16 fixed
        # point (2^-10 m/LSB) — half the bytes over the ~42 MB/s tunnel link
        # that binds this benchmark; dequantized exactly on device
        log("q16 warmup (compiles the int16-input preprocess)...")
        pipe.process_files(paths[:3], output_dir=os.path.join(tmp, "warm_q"),
                           h2d_q16=True)
        t0 = time.time()
        summary_q = pipe.process_files(paths, output_dir=os.path.join(tmp, "out_q"),
                                       h2d_q16=True)
        elapsed_q = time.time() - t0
        fps_q = N_FRAMES / elapsed_q
        log(f"q16: {N_FRAMES} frames in {elapsed_q:.2f}s "
            f"({fps_q:.2f} FPS; tracks={len(summary_q['tracks'])})")

        print(json.dumps({
            "metric": "from_pcd_fps",
            "value": round(max(fps, fps_q), 3),
            "unit": "frames/s",
            "raw_points_per_frame": 56000,
            "grid": "200x200",
            "vs_baseline": round(max(fps, fps_q) / 30.0, 4),
            "fps_f32_h2d": round(fps, 3),
            "fps_q16_h2d": round(fps_q, 3),
            "breakdown_ms_per_frame": breakdown,
            "tunnel_mb_s": {"h2d": round(h2d, 1), "d2h": round(d2h, 1)},
        }))


if __name__ == "__main__":
    from datmo_using_optical_flow_tpu.utils.backend_probe import guard_main
    guard_main(main, metric="from_pcd_fps", unit="frames/s")
