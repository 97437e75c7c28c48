"""Farnebäck flow parity tests vs cv2.calcOpticalFlowFarneback — the reference's
actual kernel (``Optical_flow/main.py:132-142``).  BASELINE.md target: EPE <= 0.1 px;
the implementation lands ~1e-5 px (exact mode); fast_warp worst-case ~6e-2 px."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from datmo_using_optical_flow_tpu.config import FarnebackConfig
from datmo_using_optical_flow_tpu.ops import farneback as fb
from datmo_using_optical_flow_tpu.oracle import np_farneback as npf


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    img1 = cv2.GaussianBlur(rng.uniform(0, 255, (64, 80)).astype(np.float32), (0, 0), 3)
    img2 = cv2.warpAffine(img1, np.float32([[1, 0, 1.3], [0, 1, -0.8]]), (80, 64))
    return img1, img2


def _epe(ours, theirs):
    return np.linalg.norm(np.asarray(ours) - theirs, axis=-1)


CONFIGS = [
    dict(),  # reference params: 0.3/5/15/5/5/5.0
    dict(pyr_scale=0.5, levels=2, iterations=2),
    dict(pyr_scale=0.7, levels=3, iterations=3, poly_n=7, poly_sigma=1.5),
]


@pytest.mark.parametrize("kw", CONFIGS)
def test_flow_matches_cv2(pair, kw):
    img1, img2 = pair
    cfg = FarnebackConfig(**kw)
    ours = fb.farneback_flow(jnp.asarray(img1), jnp.asarray(img2), cfg)
    theirs = cv2.calcOpticalFlowFarneback(img1, img2, None, cfg.pyr_scale, cfg.levels,
                                          cfg.winsize, cfg.iterations, cfg.poly_n,
                                          cfg.poly_sigma, 0)
    epe = _epe(ours, theirs)
    assert epe.max() < 1e-3, f"max EPE {epe.max()}"


def test_flow_fast_warp_within_budget(pair):
    img1, img2 = pair
    cfg = FarnebackConfig()
    ours = fb.farneback_flow(jnp.asarray(img1), jnp.asarray(img2), cfg, fast_warp=True)
    theirs = cv2.calcOpticalFlowFarneback(img1, img2, None, 0.3, 5, 15, 5, 5, 5, 0)
    epe = _epe(ours, theirs)
    assert epe.max() < 0.02, f"max EPE {epe.max()}"  # budget is 0.1 px


def test_flow_batched(pair):
    img1, img2 = pair
    outs = fb.farneback_flow_batched(jnp.stack([img1, img2]), jnp.stack([img2, img1]))
    t0 = cv2.calcOpticalFlowFarneback(img1, img2, None, 0.3, 5, 15, 5, 5, 5, 0)
    t1 = cv2.calcOpticalFlowFarneback(img2, img1, None, 0.3, 5, 15, 5, 5, 5, 0)
    assert _epe(outs[0], t0).max() < 1e-3
    assert _epe(outs[1], t1).max() < 1e-3


def test_numpy_model_matches_cv2(pair):
    """The transparent numpy model (debugging oracle) is itself cv2-exact."""
    img1, img2 = pair
    ours = npf.calc_flow(img1, img2)
    theirs = cv2.calcOpticalFlowFarneback(img1, img2, None, 0.3, 5, 15, 5, 5, 5, 0)
    assert _epe(ours, theirs).max() < 1e-3


def test_gaussian_blur_matches_cv2():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (40, 56)).astype(np.float32)
    for ksize, sigma in ((3, 0.0), (7, 1.3), (11, 2.0)):
        ours = np.asarray(fb.gaussian_blur(jnp.asarray(img), ksize, sigma))
        theirs = cv2.GaussianBlur(img, (ksize, ksize), sigma)
        np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_resize_matches_cv2():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    for out_hw in ((14, 19), (96, 128), (48, 64), (33, 47)):
        ours = np.asarray(fb.resize_bilinear(jnp.asarray(img), *out_hw))
        theirs = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(ours, theirs, atol=1e-3)


def test_box_blur_matches_oracle():
    rng = np.random.default_rng(3)
    M = rng.normal(size=(24, 30, 5)).astype(np.float32)
    ours = np.asarray(fb.box_blur5(jnp.asarray(np.moveaxis(M, -1, 0)), 7))
    theirs = np.moveaxis(npf.box_blur5(M, 7), -1, 0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_poly_exp_matches_oracle():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, (32, 40)).astype(np.float32)
    ours = np.asarray(fb.poly_exp(jnp.asarray(img), 5, 5.0))
    theirs = np.moveaxis(npf.poly_exp(img, 5, 5.0), -1, 0)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-3)


def test_level_sizes_schedule():
    """OpenCV clamps levels so the smallest level stays >= 32 px."""
    # 200x200 @ pyr_scale 0.3: only one downscaled level survives (60 px)
    sizes = npf.level_sizes(200, 200, 0.3, 5)
    assert [s[0] for s in sizes] == [1, 0]
    assert sizes[0][2:] == (60, 60)
    # 1080p: three downscaled levels (324, 97, 29->stop at 97)
    sizes = npf.level_sizes(1080, 1920, 0.3, 5)
    assert [s[0] for s in sizes] == [2, 1, 0]


def test_flow_gaussian_aggregation_matches_cv2(pair):
    """OPTFLOW_FARNEBACK_GAUSSIAN path (flags=256)."""
    img1, img2 = pair
    cfg = FarnebackConfig(pyr_scale=0.5, levels=2, iterations=3, poly_sigma=1.2,
                          flags=cv2.OPTFLOW_FARNEBACK_GAUSSIAN)
    ours = fb.farneback_flow(jnp.asarray(img1), jnp.asarray(img2), cfg)
    theirs = cv2.calcOpticalFlowFarneback(img1, img2, None, 0.5, 2, 15, 3, 5, 1.2,
                                          cv2.OPTFLOW_FARNEBACK_GAUSSIAN)
    assert _epe(ours, theirs).max() < 1e-3


def test_flow_initial_flow_matches_cv2(pair):
    """OPTFLOW_USE_INITIAL_FLOW path (flags=4)."""
    img1, img2 = pair
    init = np.full(img1.shape + (2,), 1.0, np.float32)
    cfg = FarnebackConfig(pyr_scale=0.5, levels=2, iterations=3, poly_sigma=1.2,
                          flags=cv2.OPTFLOW_USE_INITIAL_FLOW)
    ours = fb.farneback_flow(jnp.asarray(img1), jnp.asarray(img2), cfg,
                             flow0=jnp.asarray(init))
    theirs = cv2.calcOpticalFlowFarneback(img1, img2, init.copy(), 0.5, 2, 15, 3,
                                          5, 1.2, cv2.OPTFLOW_USE_INITIAL_FLOW)
    assert _epe(ours, theirs).max() < 1e-3


def test_flow_initial_flow_requires_flow0(pair):
    import pytest

    img1, img2 = pair
    cfg = FarnebackConfig(flags=cv2.OPTFLOW_USE_INITIAL_FLOW)
    with pytest.raises(ValueError, match="flow0"):
        fb.farneback_flow(jnp.asarray(img1), jnp.asarray(img2), cfg)
