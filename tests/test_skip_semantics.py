"""Failure-handling semantics: a bad frame pair is a masked no-op, never a crash
(the reference's per-pair try/except + None-BEV skip, ``Optical_flow/main.py:
565-637``; GMFA's no-moving-points ``continue``, ``GMFA.py:475-477``)."""

import jax
import jax.numpy as jnp
import numpy as np

from datmo_using_optical_flow_tpu.config import CapacityConfig, PipelineAConfig
from datmo_using_optical_flow_tpu.models.optical_flow_datmo import PipelineA


def _cfg():
    return PipelineAConfig(
        capacities=CapacityConfig(max_raw_points=1024, max_roi_points=256,
                                  max_cells=256, max_clusters=4, max_tracks=8))


def test_zero_bev_pair_is_noop():
    cfg = _cfg()
    pipe = PipelineA(cfg, fast_warp=False)
    h, w = cfg.grid_shape
    rng = np.random.default_rng(0)
    good = jnp.asarray(rng.integers(1, 255, size=(h, w)).astype(np.uint8))
    zero = jnp.zeros((h, w), jnp.uint8)

    carry = pipe.init_carry()
    carry, out = pipe.step(good, good, carry)
    assert not bool(out.skip)
    ref_vx = np.asarray(carry.prev_vx)

    # empty-BEV pair: carry must be untouched
    carry2, out2 = pipe.step(good, zero, carry)
    assert bool(out2.skip)
    np.testing.assert_array_equal(np.asarray(carry2.prev_vx), ref_vx)
    np.testing.assert_array_equal(np.asarray(carry2.table.alive),
                                  np.asarray(carry.table.alive))

    # stream continues fine afterwards
    carry3, out3 = pipe.step(good, good, carry2)
    assert not bool(out3.skip)


def test_empty_roi_preprocess_yields_zero_bev():
    cfg = _cfg()
    pipe = PipelineA(cfg)
    # points far outside the ROI -> zero BEV (the reference's None analogue)
    pts = jnp.full((64, 3), 500.0)
    mask = jnp.ones((64,), bool)
    bev = pipe.preprocess(pts, mask, jax.random.PRNGKey(0))
    assert int(jnp.sum(bev)) == 0
