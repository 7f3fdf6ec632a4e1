"""Unicycle3D constant-velocity motion model.

Re-implements the reference ``Unicycle3D`` plugin (bs_models/src/
unicycle_3d.cpp:26-60: a fuse AsyncMotionModel whose TimestampManager
generates kinematic segment constraints on demand for every transaction —
applyCallback :33-51). Here the model is registered with the smoother as a
motion-model hook: for every new state stamp in an incoming transaction it
chains a constant-velocity factor to the temporally closest existing stamp
(the TimestampManager segment logic).

The kinematic residual lives in
:class:`beam_slam_tpu.core.factors.ConstantVelocityFactors` (see its
docstring for the reduced-state mapping vs the reference's 5-block
unicycle_3d_state_cost_functor).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from beam_slam_tpu.solver.smoother import FixedLagSmoother, Transaction


@dataclasses.dataclass
class Unicycle3DParams:
    """process_noise_diagonal (unicycle_3d.yaml): per-unit-time stddevs for
    [rotation(3), position(3), velocity(3)]."""

    sigma_rot: float = 0.5
    sigma_pos: float = 0.1
    sigma_vel: float = 0.5
    max_segment_dt: float = 2.0


class Unicycle3D:
    def __init__(self, smoother: FixedLagSmoother,
                 params: Unicycle3DParams = Unicycle3DParams()):
        self.smoother = smoother
        self.params = params
        self._known_stamps: List[float] = []
        smoother.register_motion_model(self.apply)

    def _sqrt_info(self, dt: float) -> np.ndarray:
        dt = max(dt, 1e-3)
        s = np.concatenate([
            np.full(3, self.params.sigma_rot * np.sqrt(dt)),
            np.full(3, self.params.sigma_pos * np.sqrt(dt)),
            np.full(3, self.params.sigma_vel * np.sqrt(dt))])
        return np.diag(1.0 / s).astype(np.float32)

    def apply(self, txn: Transaction, smoother: FixedLagSmoother):
        """applyCallback: add a kinematic segment for each new stamp."""
        existing = sorted(set(smoother.slot_of_stamp.keys())
                          | set(self._known_stamps))
        for st in txn.imu_states:
            t = st.stamp
            prior_stamps = [s for s in existing if s < t]
            if prior_stamps:
                t_prev = prior_stamps[-1]
                dt = t - t_prev
                if 0 < dt <= self.params.max_segment_dt:
                    txn.add_constant_velocity(t_prev, t, self._sqrt_info(dt))
            existing.append(t)
            existing.sort()
            self._known_stamps.append(t)
        # bound host bookkeeping
        if len(self._known_stamps) > 1024:
            self._known_stamps = self._known_stamps[-512:]
