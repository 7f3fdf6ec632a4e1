"""Native (C++/ctypes) host kernels vs their NumPy fallbacks."""

import numpy as np
import pytest

from beam_slam_tpu.lidar import cloud
from beam_slam_tpu.ops import native


def test_native_library_builds():
    assert native.native_available(), \
        "g++ toolchain present but native build failed"


def test_organize_scan_native_matches_python(rng):
    n = 5000
    pts = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    rings = rng.integers(0, 16, n).astype(np.int32)
    times = rng.uniform(0, 0.1, n).astype(np.float32)

    grid_native = cloud.organize_scan(pts, rings, times, 16, 512)
    assert int(np.asarray(grid_native.valid).sum()) == n

    # force the python fallback
    old = native._lib, native._build_failed
    native._lib, native._build_failed = None, True
    try:
        grid_py = cloud.organize_scan(pts, rings, times, 16, 512)
    finally:
        native._lib, native._build_failed = old

    np.testing.assert_allclose(np.asarray(grid_native.xyz),
                               np.asarray(grid_py.xyz), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(grid_native.valid),
                                  np.asarray(grid_py.valid))
    np.testing.assert_allclose(np.asarray(grid_native.time),
                               np.asarray(grid_py.time), atol=1e-6)


def test_voxel_downsample_reduces_and_preserves_structure(rng):
    # dense plane: downsample must keep coverage with far fewer points
    g = np.stack(np.meshgrid(np.linspace(0, 4, 200),
                             np.linspace(0, 4, 200)), -1).reshape(-1, 2)
    pts = np.concatenate([g, np.zeros((len(g), 1))], axis=1).astype(np.float32)
    out = native.voxel_downsample(pts, voxel=0.5)
    assert 50 <= len(out) <= 100   # ~9x9 voxels with 8x8 interior
    # centroids stay inside the occupied region
    assert out[:, 0].min() >= -0.01 and out[:, 0].max() <= 4.01
    # native and fallback agree on the centroid set (order-insensitive)
    old = native._lib, native._build_failed
    native._lib, native._build_failed = None, True
    try:
        out_py = native.voxel_downsample(pts, voxel=0.5)
    finally:
        native._lib, native._build_failed = old
    a = np.asarray(sorted(map(tuple, np.round(out, 4))))
    b = np.asarray(sorted(map(tuple, np.round(out_py, 4))))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_interp_positions_matches_numpy(rng):
    tt = np.sort(rng.uniform(0, 10, 50))
    tp = rng.standard_normal((50, 3)).astype(np.float32)
    qt = rng.uniform(0, 10, 200)
    out = native.interp_positions(tt, tp, qt)
    ref = np.stack([np.interp(qt, tt, tp[:, k]) for k in range(3)], axis=1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_native_log_index_and_imu_batch(tmp_path):
    """Native data-loader path: C++ log indexer + bulk IMU decoder agree
    with the pure-Python framing."""
    import os
    from beam_slam_tpu.pipeline import sensor_log as sl
    from beam_slam_tpu.ops import native as native_mod

    path = os.path.join(tmp_path, "x.bslg")
    with sl.SensorLogWriter(path) as w:
        for i in range(50):
            w.add_imu(0.01 * i, [0.1, 0.2, 0.3 + i], [1.0, 2.0, 3.0 - i])
        w.add_pose(0.5, [1, 0, 0, 0], [1.0, 2, 3])
    types, stamps, offsets, sizes, buf = sl.index_log(path)
    assert (types == sl.T_IMU).sum() == 50
    assert (types == sl.T_POSE).sum() == 1
    # streamed records agree with the indexed view
    streamed = list(sl._read_log_streaming(path))
    assert len(streamed) == len(types)
    for (rt, st, _), ti, si in zip(streamed, types, stamps):
        assert rt == ti and abs(st - si) < 1e-12
    # bulk IMU decode
    t, wvals, avals = sl.imu_batch(path)
    assert t.shape == (50,)
    np.testing.assert_allclose(wvals[:, 2], 0.3 + np.arange(50), rtol=1e-6)
    np.testing.assert_allclose(avals[:, 2], 3.0 - np.arange(50), rtol=1e-6)
    if native_mod.native_available():
        # the native indexer really ran (same answers as fallback already
        # asserted above)
        out = native_mod.index_log_native(buf)
        assert out is not None and len(out[0]) == len(types)
