"""Deterministic synthetic LiDAR scene generator.

Replaces CARLA (reference ``single_target_simultion.py``) for tests and benchmarks:
a ground plane + one or more moving box targets + static obstacles + noise, with
known ground-truth velocities.  Every frame is a function of (seed, frame index),
so test data is reproducible without a simulator (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class BoxTarget:
    """A moving box (vehicle-like) target with constant velocity."""

    center0: tuple[float, float, float] = (5.0, 0.0, 0.75)
    size: tuple[float, float, float] = (4.0, 2.0, 1.5)
    velocity: tuple[float, float] = (2.0, 0.5)  # m/s in x, y
    points_per_frame: int = 600


@dataclass
class SyntheticScene:
    """Scene description: ground plane z=0 plus targets and static clutter."""

    ground_points: int = 4000
    ground_extent: float = 20.0
    ground_noise: float = 0.02
    static_boxes: tuple[BoxTarget, ...] = field(default_factory=tuple)
    targets: tuple[BoxTarget, ...] = field(
        default_factory=lambda: (BoxTarget(),)
    )
    sensor_noise: float = 0.01
    seed: int = 0


def _box_surface_points(rng: np.random.Generator, center: np.ndarray,
                        size: np.ndarray, n: int) -> np.ndarray:
    """Sample points on the surface of an axis-aligned box (LiDAR hits faces)."""
    # pick faces proportional to area
    sx, sy, sz = size
    areas = np.array([sy * sz, sy * sz, sx * sz, sx * sz, sx * sy])  # ±x, ±y, top
    faces = rng.choice(5, size=n, p=areas / areas.sum())
    u = rng.uniform(-0.5, 0.5, size=(n, 2))
    pts = np.zeros((n, 3))
    for f in range(5):
        m = faces == f
        k = int(m.sum())
        if k == 0:
            continue
        if f in (0, 1):
            pts[m, 0] = (0.5 if f == 0 else -0.5) * sx
            pts[m, 1] = u[m, 0] * sy
            pts[m, 2] = u[m, 1] * sz
        elif f in (2, 3):
            pts[m, 0] = u[m, 0] * sx
            pts[m, 1] = (0.5 if f == 2 else -0.5) * sy
            pts[m, 2] = u[m, 1] * sz
        else:  # top
            pts[m, 0] = u[m, 0] * sx
            pts[m, 1] = u[m, 1] * sy
            pts[m, 2] = 0.5 * sz
    return pts + center


def synthetic_frame(scene: SyntheticScene, frame_index: int, dt: float = 1.0) -> np.ndarray:
    """Generate the (N, 3) point cloud for a frame.

    Ground z≈0 (so RANSAC must find and remove it); targets translate by
    ``velocity * dt`` per frame.  Deterministic in (scene.seed, frame_index).
    """
    rng = np.random.default_rng(np.random.SeedSequence([scene.seed, frame_index]))
    parts = []
    g = rng.uniform(-scene.ground_extent, scene.ground_extent, size=(scene.ground_points, 2))
    gz = rng.normal(scale=scene.ground_noise, size=(scene.ground_points, 1))
    parts.append(np.concatenate([g, gz], axis=1))
    for box in scene.static_boxes:
        c = np.array(box.center0)
        parts.append(_box_surface_points(rng, c, np.array(box.size), box.points_per_frame))
    for box in scene.targets:
        c = np.array(box.center0) + np.array([box.velocity[0], box.velocity[1], 0.0]) * dt * frame_index
        parts.append(_box_surface_points(rng, c, np.array(box.size), box.points_per_frame))
    pts = np.concatenate(parts, axis=0)
    pts += rng.normal(scale=scene.sensor_noise, size=pts.shape)
    return pts


def write_synthetic_sequence(scene: SyntheticScene, out_dir: str, num_frames: int,
                             dt: float = 1.0) -> list[str]:
    """Write a sequence of synthetic frames as PCD files; returns the paths."""
    import os

    from datmo_using_optical_flow_tpu.io.pcd import write_pcd

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(num_frames):
        p = os.path.join(out_dir, f"lidar_frame_{i * 30}.pcd")
        write_pcd(p, synthetic_frame(scene, i, dt))
        paths.append(p)
    return paths
