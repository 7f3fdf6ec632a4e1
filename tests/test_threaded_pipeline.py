"""Threaded pipeline runtime (per-sensor spinner threads + optimizer
thread — the fuse AsyncSensorModel/optimizer-thread model-parallelism of
the reference, SURVEY.md §2.7 component #71): a threaded LIO session must
produce the same trajectory quality as the synchronous LocalMapper on the
same data, with all events processed off the producer thread."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar.cloud import synthetic_structured_scene
from beam_slam_tpu.models.slam_initialization import InitParams
from beam_slam_tpu.pipeline.config import (CalibrationConfig,
                                           LocalMapperConfig)
from beam_slam_tpu.pipeline.local_mapper import LocalMapper
from beam_slam_tpu.pipeline.threaded import ThreadedLocalMapper
from beam_slam_tpu.utils import sim

Q_BL = np.array([1, 0, 0, 0], np.float32)
P_BL = np.asarray([0.05, 0.0, -0.08], np.float32)
SCENE = synthetic_structured_scene(n_rings=16, width=504)


def scan_from_pose(q_wb, p_wb):
    q_wl = lie.quat_mul(jnp.asarray(q_wb), jnp.asarray(Q_BL))
    p_wl = jnp.asarray(p_wb) + lie.quat_rotate(jnp.asarray(q_wb),
                                               jnp.asarray(P_BL))
    xyz = lie.quat_rotate(lie.quat_conj(q_wl)[None, None], SCENE.xyz - p_wl)
    return SCENE._replace(xyz=jnp.where(SCENE.valid[..., None], xyz, 0.0))


def _cfg():
    return LocalMapperConfig(
        mode="LIO", lag_duration=3.0, max_states=32, max_iterations=6,
        init=InitParams(mode="LIDAR", min_trajectory_length_m=1.5,
                        min_observability=0.1),
        calibration=CalibrationConfig(q_baselink_lidar=Q_BL,
                                      p_baselink_lidar=P_BL))


def _feed(mapper, T=6.0, imu_rate=100.0, lidar_rate=5.0, tick=None):
    traj = sim.AnalyticTrajectory(amp_p=(0.6, 0.5, 0.2),
                                  v_drift=(0.35, 0.05, 0.0),
                                  amp_r=(0.1, 0.1, 0.15))
    n_seg = int(T * lidar_rate)
    per = int(imu_rate / lidar_rate)
    t_prev = 0.0
    for k in range(1, n_seg + 1):
        t = k / lidar_rate
        tm = t_prev + (np.arange(per) + 0.5) / imu_rate
        s = traj.sample(jnp.asarray(tm, jnp.float32))
        for i in range(per):
            mapper.on_imu(float(tm[i]), np.asarray(s.w_body[i]),
                          np.asarray(s.a_body[i]))
        g = traj.sample(jnp.asarray([t], jnp.float32))
        mapper.on_scan(round(t, 6), scan_from_pose(g.q[0], g.p[0]))
        if tick:
            tick()
        t_prev = t
    return traj


@pytest.mark.slow
def test_threaded_matches_synchronous():
    from beam_slam_tpu.utils.evaluation import ate_rmse

    # synchronous reference run
    sync = LocalMapper(_cfg())
    traj = _feed(sync, tick=sync.tick)
    assert sync.initialized

    # threaded run on identical data; producer never blocks
    tm = ThreadedLocalMapper(_cfg()).start()
    _feed(tm)
    tm.join(timeout=600.0)
    tm.stop()
    assert tm.initialized
    assert all(v == 0 for v in tm.dropped.values()), tm.dropped

    def final_ate(mapper):
        stamps = mapper.smoother.current_stamps()
        est = np.stack([mapper.smoother.get_state(t)["p"] for t in stamps])
        gt = traj.sample(jnp.asarray(stamps, jnp.float32))
        return ate_rmse(est, np.asarray(gt.p), align="se3")

    r_sync = final_ate(sync)
    r_thr = final_ate(tm)
    assert r_sync < 0.05, r_sync
    assert r_thr < 0.05, r_thr
    # same factor flow (threaded ordering may differ by one tick)
    assert tm.smoother.arena_imu.active.sum() >= 3
    assert tm.smoother.arena_rel.active.sum() >= 3
    assert tm.smoother.solve_count >= 3


def test_queue_drop_oldest():
    tm = ThreadedLocalMapper(_cfg(), queue_size=4)  # not started
    for i in range(10):
        tm.on_pose(float(i), np.array([1, 0, 0, 0]), np.zeros(3))
    assert tm.dropped["pose"] == 6
    assert tm._queues["pose"].qsize() == 4


def test_stop_before_start_is_noop():
    tm = ThreadedLocalMapper(_cfg())
    tm.stop()
