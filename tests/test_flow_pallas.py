"""Pallas fused blur+solve kernel parity (interpret mode on the CPU backend;
the compiled path runs on TPU via bench/examples)."""

import cv2
import jax.numpy as jnp
import numpy as np

from datmo_using_optical_flow_tpu.config import FarnebackConfig
from datmo_using_optical_flow_tpu.ops import farneback as fb
from datmo_using_optical_flow_tpu.ops.flow_pallas import box_blur_solve


def _realistic_planes(shape, seed=0):
    rng = np.random.default_rng(seed)
    r4, r5, r2, r3 = (rng.normal(size=shape).astype(np.float32) for _ in range(4))
    r6 = rng.normal(size=shape).astype(np.float32) * 0.3
    return jnp.asarray(np.stack([r4 * r4 + r6 * r6, (r4 + r5) * r6,
                                 r5 * r5 + r6 * r6, r4 * r2 + r6 * r3,
                                 r6 * r2 + r5 * r3]))


def test_box_blur_solve_matches_jnp_path():
    M = _realistic_planes((100, 130))
    dx1, dy1 = box_blur_solve(M, 15)
    dx2, dy2 = fb.solve_flow(fb.box_blur5(M, 15))
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy1), np.asarray(dy2), atol=1e-5)


def test_box_blur_solve_small_and_unaligned():
    for shape, win in (((17, 33), 7), ((64, 128), 15), ((30, 41), 31)):
        M = _realistic_planes(shape, seed=shape[0])
        dx1, dy1 = box_blur_solve(M, win)
        dx2, dy2 = fb.solve_flow(fb.box_blur5(M, win))
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-4)
        np.testing.assert_allclose(np.asarray(dy1), np.asarray(dy2), atol=1e-4)


def test_farneback_with_pallas_matches_cv2():
    rng = np.random.default_rng(0)
    img1 = cv2.GaussianBlur(rng.uniform(0, 255, (64, 80)).astype(np.float32), (0, 0), 3)
    img2 = cv2.warpAffine(img1, np.float32([[1, 0, 1.3], [0, 1, -0.8]]), (80, 64))
    cfg = FarnebackConfig()
    ours = fb.farneback_flow(jnp.asarray(img1), jnp.asarray(img2), cfg, use_pallas=True)
    theirs = cv2.calcOpticalFlowFarneback(img1, img2, None, 0.3, 5, 15, 5, 5, 5, 0)
    epe = np.linalg.norm(np.asarray(ours) - theirs, axis=-1)
    assert epe.max() < 0.02, epe.max()  # pallas level uses packed bf16 warp
