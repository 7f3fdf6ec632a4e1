"""Sensor log round-trip + replay into a LIO mapper."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
from beam_slam_tpu.pipeline import sensor_log as slog
from beam_slam_tpu.pipeline.config import (CalibrationConfig,
                                           LocalMapperConfig)
from beam_slam_tpu.models.slam_initialization import InitParams
from beam_slam_tpu.pipeline.local_mapper import LocalMapper
from beam_slam_tpu.utils import sim

SCENE = synthetic_structured_scene(n_rings=16, width=504)


def test_log_roundtrip(tmp_path, rng):
    path = str(tmp_path / "run.bslg")
    with slog.SensorLogWriter(path) as w:
        w.add_imu(0.01, [0.1, 0.2, 0.3], [0, 0, 9.8])
        w.add_scan(0.05, SCENE)
        w.add_camera(0.06, [3, 7, 12], [[10.0, 20.0], [30, 40], [50, 60]])
        w.add_pose(0.07, [1, 0, 0, 0], [1, 2, 3])
        assert w.counts[slog.T_IMU] == 1

    recs = list(slog.read_log(path))
    assert [r[0] for r in recs] == [slog.T_IMU, slog.T_SCAN, slog.T_CAMERA,
                                    slog.T_POSE]
    _, t, (wv, av) = recs[0]
    np.testing.assert_allclose(wv, [0.1, 0.2, 0.3], atol=1e-7)
    grid = recs[1][2]
    np.testing.assert_allclose(np.asarray(grid.xyz), np.asarray(SCENE.xyz),
                               atol=0)
    np.testing.assert_array_equal(np.asarray(grid.valid),
                                  np.asarray(SCENE.valid))
    ids, pix = recs[2][2]
    np.testing.assert_array_equal(ids, [3, 7, 12])
    q, p = recs[3][2]
    np.testing.assert_allclose(p, [1, 2, 3], atol=1e-7)


def test_log_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.bslg")
    with open(path, "wb") as f:
        f.write(b"NOTALOG!!!")
    with pytest.raises(ValueError, match="not a sensor log"):
        list(slog.read_log(path))


def test_replay_drives_lio_mapper(tmp_path):
    """Record a short LIO session to disk, then replay it through a fresh
    LocalMapper — initialization and tracking must work from the log alone."""
    traj = sim.AnalyticTrajectory(amp_p=(0.6, 0.5, 0.2),
                                  v_drift=(0.35, 0.05, 0.0))
    path = str(tmp_path / "lio.bslg")
    imu_rate, scan_rate, T = 200.0, 5.0, 6.0
    with slog.SensorLogWriter(path) as w:
        n = int(T * imu_rate)
        tm = (np.arange(n) + 0.5) / imu_rate
        s = traj.sample(jnp.asarray(tm, jnp.float32))
        scan_i = 1
        for i in range(n):
            w.add_imu(float(tm[i]), np.asarray(s.w_body[i]),
                      np.asarray(s.a_body[i]))
            t_scan = scan_i / scan_rate
            if tm[i] >= t_scan:
                g = traj.sample(jnp.asarray([t_scan], jnp.float32))
                xyz = lie.quat_rotate(lie.quat_conj(g.q[0])[None, None],
                                      SCENE.xyz - g.p[0])
                w.add_scan(round(t_scan, 6), SCENE._replace(
                    xyz=jnp.where(SCENE.valid[..., None], xyz, 0.0)))
                scan_i += 1

    cfg = LocalMapperConfig(
        mode="LIO", lag_duration=5.0, max_states=32,
        init=InitParams(mode="LIDAR", min_trajectory_length_m=1.5,
                        min_observability=0.1))
    # deterministic oracle: pin the sync/host path (the async + pipelined
    # deployment defaults carry a measured one-tick-staleness accuracy
    # cost covered by tests/test_async_pipeline_e2e.py; this test asserts
    # the tightest host-path bound on real scan data)
    cfg.async_solve = False
    cfg.pipelined_registration = False
    mapper = LocalMapper(cfg)
    n_rec = slog.replay(path, mapper)
    assert n_rec > 1000
    assert mapper.initialized
    stamps = mapper.smoother.current_stamps()
    assert len(stamps) >= 5
    # trajectory sane: ATE vs GT after SE(3) alignment
    from beam_slam_tpu.utils.evaluation import ate_rmse
    est = np.stack([mapper.smoother.get_state(t)["p"] for t in stamps])
    gt = traj.sample(jnp.asarray(stamps, jnp.float32))
    assert ate_rmse(est, np.asarray(gt.p), align="se3") < 0.05
