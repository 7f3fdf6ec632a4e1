"""Online reloc: the local mapper asks the global mapper for a pose
correction (RelocRequestMsg flow)."""

import numpy as np
import pytest

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.global_mapping.global_map import GlobalMapParams
from beam_slam_tpu.global_mapping.reloc import EuclideanCandidateSearch
from beam_slam_tpu.models.global_mapper import GlobalMapper
from test_global_mapping import chunk_at, features_from


def test_reloc_request_corrects_drifted_pose():
    g = GlobalMapper(GlobalMapParams(submap_size_m=100.0,
                                     loop_closure=False))
    g.map.candidate_search = EuclideanCandidateSearch(max_distance_m=20.0,
                                                      skip_recent=0)
    # build one submap from several true-pose keyframes
    for i, x in enumerate([0.0, 1.0, 2.0]):
        g.process_slam_chunk(chunk_at(float(i), [1, 0, 0, 0], [x, 0, 0]))

    # the local mapper revisits x=1 but its estimate drifted by (0.3, 0.4)
    p_true = np.array([1.0, 0.0, 0.0], np.float32)
    p_est = p_true + np.array([0.3, 0.4, 0.0], np.float32)
    fc = features_from(lie.quat_identity(), p_true)
    out = g.process_reloc_request(99.0, fc, np.array([1, 0, 0, 0], np.float32),
                                  p_est)
    assert out is not None
    q_corr, p_corr = out
    assert np.linalg.norm(p_corr - p_true) < 0.1, p_corr
    dth = lie.so3_log(jnp.asarray(q_corr, jnp.float32))
    assert float(jnp.linalg.norm(dth)) < 0.05


def test_reloc_request_empty_map():
    g = GlobalMapper(GlobalMapParams())
    fc = features_from(lie.quat_identity(), np.zeros(3, np.float32))
    assert g.process_reloc_request(0.0, fc, np.array([1, 0, 0, 0]),
                                   np.zeros(3)) is None
