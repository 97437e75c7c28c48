"""Wavefront multi-iteration flow kernel vs chained per-iteration fused
kernels: identical arithmetic, different schedule (ops/flow_wavefront.py;
reference kernel cv2.calcOpticalFlowFarneback, Optical_flow/main.py:132-142)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from datmo_using_optical_flow_tpu.ops import flow_pallas, flow_wavefront, warp_pallas
from datmo_using_optical_flow_tpu.ops.farneback import build_pyramid


def _coeff_planes(h, w, seed):
    """Realistic polynomial-expansion planes from a synthetic image pair."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, size=(h + 8, w + 8)).astype(np.float32)
    im1 = base[:h, :w]
    im2 = base[3:3 + h, 2:2 + w]  # shifted content: nonzero true flow
    p1 = build_pyramid(jnp.asarray(im1), 0.5, 1, 5, 1.1)
    p2 = build_pyramid(jnp.asarray(im2), 0.5, 1, 5, 1.1)
    # [-1] is the FINEST (full-resolution) level
    assert p1[-1].shape == (5, h, w), p1[-1].shape
    return p1[-1], p2[-1]


@pytest.mark.parametrize("iters,h,w", [(1, 160, 256), (2, 160, 256),
                                       (5, 160, 256), (3, 130, 300)])
def test_wavefront_matches_chained_fused(iters, h, w):
    R0, R1 = _coeff_planes(h, w, seed=7)
    rng = np.random.default_rng(1)
    dx = jnp.asarray(rng.uniform(-2, 2, size=(h, w)).astype(np.float32))
    dy = jnp.asarray(rng.uniform(-2, 2, size=(h, w)).astype(np.float32))
    r1p = warp_pallas._pad_r1(R1, s=flow_pallas.FS)

    ex, ey = dx, dy
    for _ in range(iters):
        ex, ey = flow_pallas.fused_iteration(R0, r1p, ex, ey, 15, False)

    gx, gy, exceeded = flow_wavefront.wavefront_iterations(
        R0, r1p, dx, dy, 15, iters, False)
    assert not bool(exceeded)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex), rtol=2e-6,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ey), rtol=2e-6,
                               atol=2e-6)


def test_wavefront_gaussian_window():
    h, w = 128, 256
    R0, R1 = _coeff_planes(h, w, seed=3)
    dx = jnp.zeros((h, w), jnp.float32)
    dy = jnp.zeros((h, w), jnp.float32)
    r1p = warp_pallas._pad_r1(R1, s=flow_pallas.FS)
    ex, ey = dx, dy
    for _ in range(3):
        ex, ey = flow_pallas.fused_iteration(R0, r1p, ex, ey, 15, True)
    gx, gy, exceeded = flow_wavefront.wavefront_iterations(
        R0, r1p, dx, dy, 15, 3, True)
    assert not bool(exceeded)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex), rtol=2e-6,
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(gy), np.asarray(ey), rtol=2e-6,
                               atol=2e-6)


def test_wavefront_two_strips():
    """Minimum strip count (production gates at >= 4, but the schedule must
    stay sound when windows immediately reach the padded tail strip)."""
    h, w = 64, 256
    R0, R1 = _coeff_planes(h, w, seed=11)
    rng = np.random.default_rng(2)
    dx = jnp.asarray(rng.uniform(-1, 1, size=(h, w)).astype(np.float32))
    dy = jnp.asarray(rng.uniform(-1, 1, size=(h, w)).astype(np.float32))
    r1p = warp_pallas._pad_r1(R1, s=flow_pallas.FS)
    ex, ey = dx, dy
    for _ in range(2):
        ex, ey = flow_pallas.fused_iteration(R0, r1p, ex, ey, 15, False)
    gx, gy, exceeded = flow_wavefront.wavefront_iterations(
        R0, r1p, dx, dy, 15, 2, False)
    assert not bool(exceeded)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ex), rtol=2e-6,
                               atol=2e-6)


def test_wavefront_full_flow_matches_default_path(monkeypatch):
    """End-to-end pyramidal flow with the wavefront enabled equals the
    default per-iteration Pallas path (no exceeded flags on this scene)."""
    from datmo_using_optical_flow_tpu.config import FarnebackConfig
    from datmo_using_optical_flow_tpu.ops import farneback

    rng = np.random.default_rng(9)
    base = rng.uniform(0, 255, size=(200, 280)).astype(np.float32)
    im1 = jnp.asarray(base[:192, :256])
    im2 = jnp.asarray(base[4:196, 3:259])
    cfg = FarnebackConfig(pyr_scale=0.5, levels=2, winsize=15, iterations=3,
                          poly_n=5, poly_sigma=1.1)
    ref = np.asarray(farneback.farneback_flow(im1, im2, cfg, use_pallas=True))
    monkeypatch.setattr(flow_wavefront, "ENABLED", True)
    jax.clear_caches()  # ENABLED is read at trace time; drop stale executables
    try:
        got = np.asarray(farneback.farneback_flow(im1, im2, cfg, use_pallas=True))
    finally:
        # drop the wavefront-traced executables too, or later tests calling
        # the same jitted signature would silently run the wavefront path
        # after the monkeypatch restores ENABLED=False
        jax.clear_caches()
    epe = np.linalg.norm(got - ref, axis=-1)
    assert epe.max() < 1e-4, epe.max()


def test_wavefront_flags_out_of_window_flow():
    """A flow beyond the warp window's vertical reach must set the exceeded
    flag (the caller then falls back to the exact path)."""
    h, w = 128, 256
    R0, R1 = _coeff_planes(h, w, seed=5)
    big = float(warp_pallas.YOFF + 4)
    dx = jnp.zeros((h, w), jnp.float32)
    dy = jnp.full((h, w), big, jnp.float32)
    r1p = warp_pallas._pad_r1(R1, s=flow_pallas.FS)
    _, _, exceeded = flow_wavefront.wavefront_iterations(
        R0, r1p, dx, dy, 15, 1, False)
    assert bool(exceeded)
