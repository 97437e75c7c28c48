"""CPU oracle for pipeline B (reference ``GMFA/GMFA.py``).

Numpy/scipy re-implementations of the GMFA behaviors (file:line cited per
function).  Open3D is unavailable here, so the ICP oracle uses the same
point-to-point algorithm with a scipy cKDTree — validated on synthetic rigid
motions rather than bit-compared to Open3D.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def icp_point_to_point(source: np.ndarray, target: np.ndarray, threshold: float = 0.02,
                       max_iterations: int = 30, relative_fitness: float = 1e-6,
                       relative_rmse: float = 1e-6,
                       return_iterations: bool = False) -> np.ndarray:
    """Point-to-point ICP with identity init (``GMFA.py:297-309`` semantics).

    ``return_iterations``: also return the number of NN/fitness evaluations
    performed (for early-exit regime tests, where the relative-fitness/rmse
    criteria fire before ``max_iterations``)."""
    transform = np.eye(4)
    tree = cKDTree(target)
    prev_f, prev_r = np.inf, np.inf
    iters = 0
    for _ in range(max_iterations):
        iters += 1
        pts = source @ transform[:3, :3].T + transform[:3, 3]
        dist, idx = tree.query(pts, k=1)
        corr = dist <= threshold
        cnt = corr.sum()
        fitness = cnt / max(len(source), 1)
        rmse = np.sqrt((dist[corr] ** 2).mean()) if cnt else 0.0
        if abs(prev_f - fitness) < relative_fitness and abs(prev_r - rmse) < relative_rmse:
            break
        prev_f, prev_r = fitness, rmse
        if cnt < 3:
            break
        s = pts[corr]
        d = target[idx[corr]]
        cs, cd = s.mean(axis=0), d.mean(axis=0)
        h = (s - cs).T @ (d - cd)
        u, _, vt = np.linalg.svd(h)
        det = np.linalg.det(vt.T @ u.T)
        r = vt.T @ np.diag([1.0, 1.0, det]) @ u.T
        t = cd - r @ cs
        step = np.eye(4)
        step[:3, :3] = r
        step[:3, 3] = t
        transform = step @ transform
    if return_iterations:
        return transform, iters
    return transform


def align_and_residuals(points: np.ndarray, previous_points: np.ndarray,
                        transformation: np.ndarray) -> np.ndarray:
    """``compute_motion_residuals`` (``GMFA.py:72-95``): transform prev, NN-align
    when sizes differ (index-wise otherwise), euclidean residuals."""
    prev_t = previous_points @ transformation[:3, :3].T + transformation[:3, 3]
    if len(points) != len(prev_t):
        tree = cKDTree(prev_t)
        _, idx = tree.query(points, k=1)
        prev_t = prev_t[idx]
    return np.linalg.norm(points - prev_t, axis=1)


def classify_points(points: np.ndarray, previous_points: np.ndarray,
                    transformation: np.ndarray, static_threshold: float,
                    moving_threshold: float) -> np.ndarray:
    """Class labels 3=static / 2=moving / 1=uncertain (``GMFA.py:97-131``)."""
    res = align_and_residuals(points, previous_points, transformation)
    return np.where(res < static_threshold, 3, np.where(res > moving_threshold, 2, 1))


def filter_moving_points_in_roi(points: np.ndarray, classifications: np.ndarray,
                                roi_bounds) -> np.ndarray:
    """``GMFA.py:371-381``: class-2 points inside the (x, y) box."""
    x_min, x_max, y_min, y_max = roi_bounds
    mv = points[np.asarray(classifications) == 2]
    keep = ((mv[:, 0] >= x_min) & (mv[:, 0] <= x_max)
            & (mv[:, 1] >= y_min) & (mv[:, 1] <= y_max))
    return mv[keep]


def update_som(som: np.ndarray, moving_points: np.ndarray, residuals: np.ndarray,
               static_threshold: float, moving_threshold: float, grid_size: int,
               cell_resolution) -> np.ndarray:
    """``update_som_with_gmfa`` (``GMFA.py:134-142``) including the caller's
    misaligned zip pairing (moving point k <-> full-cloud residual k)."""
    som = som.copy()
    rx, ry = cell_resolution
    for point, residual in zip(moving_points, residuals):
        row = int((point[0] + grid_size * rx / 2) // rx)
        col = int((point[1] + grid_size * ry / 2) // ry)
        if 0 <= row < grid_size and 0 <= col < grid_size:
            if residual < static_threshold:
                som[row, col] = min(som[row, col] + 0.1, 0.95)
            elif residual > moving_threshold:
                som[row, col] = max(som[row, col] - 0.1, 0.05)
    return som


def feature_vector(cluster_points: np.ndarray) -> np.ndarray:
    """``calculate_feature_vector`` (``GMFA.py:164-169``)."""
    centroid = cluster_points.mean(axis=0)
    cov = np.cov(cluster_points, rowvar=False)
    eig = np.linalg.eigvalsh(cov)
    return np.array([centroid[0], centroid[1], eig.max(), eig.min()])


def assign_clusters_to_tracks(tracks: list[dict], clusters: list[np.ndarray],
                              cost_threshold: float = 1.0):
    """Hungarian association (``GMFA.py:182-213``)."""
    from scipy.optimize import linear_sum_assignment
    from scipy.spatial.distance import cdist

    if not tracks or not clusters:
        return {}, set(range(len(clusters)))
    prev = np.array([t["features"] for t in tracks])
    cur = np.array([feature_vector(c) for c in clusters])
    cost = cdist(np.atleast_2d(prev), np.atleast_2d(cur))
    rows, cols = linear_sum_assignment(cost)
    assignments = {}
    unassigned = set(range(len(clusters)))
    for i, j in zip(rows, cols):
        if cost[i, j] < cost_threshold:
            assignments[i] = j
            unassigned.discard(j)
    return assignments, unassigned


def update_tracks(tracks: list[dict], assignments: dict, clusters: list[np.ndarray],
                  dt: float = 0.1) -> list[dict]:
    """``GMFA.py:216-232``: matched tracks get centroid position + finite-diff
    velocity; unmatched tracks are dropped (only assigned ones survive)."""
    updated = []
    for ti, ci in assignments.items():
        f = feature_vector(clusters[ci])
        pos = f[:2]
        tr = tracks[ti]
        vel = (pos - tr["state"][:2].flatten()) / dt
        tr["features"] = f
        tr["state"][:2] = pos.reshape(-1, 1)
        tr["state"][2:] = vel.reshape(-1, 1)
        tr["age"] += 1
        updated.append(tr)
    return updated


def initialize_new_tracks(unassigned: set, clusters: list[np.ndarray],
                          previous_positions: dict | None, dt: float = 0.1,
                          rng: np.random.Generator | None = None) -> list[dict]:
    """``GMFA.py:235-258`` with injectable RNG for the random ids (:252)."""
    rng = rng or np.random.default_rng(0)
    out = []
    for ci in sorted(unassigned):
        pts = clusters[ci]
        if pts.size == 0:
            continue
        f = feature_vector(pts)
        pos = f[:2]
        if previous_positions is not None and ci in previous_positions:
            vel = (pos - previous_positions[ci]) / dt
        else:
            vel = np.zeros(2)
        out.append({
            "id": int(rng.integers(0, 100000)),
            "features": f,
            "state": np.hstack([pos, vel]).reshape(-1, 1),
            "covariance": np.eye(4) * 0.1,
            "age": 1,
        })
    return out


def kf_predict(x: np.ndarray, p: np.ndarray, dt: float):
    """``ekf_predict`` (``GMFA.py:145-155``): linear CV model."""
    f = np.array([[1, 0, dt, 0], [0, 1, 0, dt], [0, 0, 1, 0], [0, 0, 0, 1]], float)
    q = np.diag([0.1, 0.1, 0.01, 0.01])
    return f @ x, f @ p @ f.T + q


def kf_update(x: np.ndarray, p: np.ndarray, z: np.ndarray, h: np.ndarray,
              r: np.ndarray):
    """``ekf_update`` (``GMFA.py:157-163``)."""
    y = z - h @ x
    s = h @ p @ h.T + r
    k = p @ h.T @ np.linalg.inv(s)
    return x + k @ y, (np.eye(len(p)) - k @ h) @ p
