"""ActiveSubmap client — the local-mapper-side cache of the global mapper's
current submap.

Re-implements ``bs_models::experimental::ActiveSubmap``
(bs_models/experimental/include/global_mapping/active_submap.h +
src/lib/global_mapping/active_submap.cpp:1-155): the global mapper publishes
its active submap (lidar map + LOAM feature map + visual map points) as a
SubmapMsg; local models (LidarTracker, VO global localization) query the
cached maps to register against the GLOBAL map frame. Unlike the reference's
singleton, this is an explicit state object fed by a direct callback
(SURVEY.md §2.7 'Singletons → explicit state objects').
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp

from beam_slam_tpu.core import lie
from beam_slam_tpu.lidar.cloud import FeatureCloud


class ActiveSubmap:
    """World-frame caches of the current submap's maps."""

    def __init__(self):
        self._edges: Optional[jnp.ndarray] = None    # [E,3] world frame
        self._edges_valid: Optional[jnp.ndarray] = None
        self._surfs: Optional[jnp.ndarray] = None
        self._surfs_valid: Optional[jnp.ndarray] = None
        self._visual_pts: np.ndarray = np.zeros((0, 3), np.float32)
        self.updates = 0

    @property
    def empty(self) -> bool:
        return self._edges is None

    def update_from_submap(self, submap) -> None:
        """ActiveSubmapCallback: rebuild the world-frame maps from a
        :class:`~beam_slam_tpu.global_mapping.submap.Submap` (keyframe
        features are stored in the submap frame; T_WORLD_SUBMAP applies)."""
        es, evs, ss, svs = [], [], [], []
        q_ws = jnp.asarray(submap.q)
        p_ws = jnp.asarray(submap.p)
        for kf in submap.lidar_keyframes:
            q_w, p_w = submap.submap_to_world(kf.q, kf.p)
            fcw = kf.features.transform(jnp.asarray(q_w), jnp.asarray(p_w))
            es.append(jnp.concatenate([fcw.edge_strong, fcw.edge_weak]))
            evs.append(jnp.concatenate([kf.features.edge_strong_valid,
                                        kf.features.edge_weak_valid]))
            ss.append(jnp.concatenate([fcw.surf_strong, fcw.surf_weak]))
            svs.append(jnp.concatenate([kf.features.surf_strong_valid,
                                        kf.features.surf_weak_valid]))
        if es:
            self._edges = jnp.concatenate(es)
            self._edges_valid = jnp.concatenate(evs)
            self._surfs = jnp.concatenate(ss)
            self._surfs_valid = jnp.concatenate(svs)
        # visual map points → world frame (GetVisualMapPoints): the
        # submap's landmark container
        self._visual_pts = submap.landmarks_world()
        self.updates += 1

    def get_loam_map(self) -> Tuple[jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray, jnp.ndarray]:
        """(edges, edges_valid, surfs, surfs_valid) world-frame arrays —
        GetLoamMapPtr; raises if empty (callers check ``empty`` first,
        matching the reference's warn-and-skip)."""
        if self.empty:
            raise RuntimeError("active submap is empty")
        return self._edges, self._edges_valid, self._surfs, self._surfs_valid

    def get_lidar_map(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Flat world-frame point cloud (GetLidarMap): edges+surfs."""
        e, ev, s, sv = self.get_loam_map()
        return (jnp.concatenate([e, s]), jnp.concatenate([ev, sv]))

    def set_visual_map_points(self, pts_world: np.ndarray) -> None:
        """Directly publish visual landmark positions (the SubmapMsg carries
        the visual map separately from the camera keyframes)."""
        self._visual_pts = np.asarray(pts_world, np.float32).reshape(-1, 3)

    def get_visual_map_points(self) -> np.ndarray:
        """[N,3] world-frame visual landmark positions."""
        return self._visual_pts

    def get_visual_map_points_in_camera_frame(self, q_wc, p_wc) -> np.ndarray:
        """GetVisualMapVectorInCameraFrame."""
        if not len(self._visual_pts):
            return self._visual_pts
        X = lie.quat_rotate(lie.quat_conj(jnp.asarray(q_wc))[None],
                            jnp.asarray(self._visual_pts)
                            - jnp.asarray(p_wc))
        return np.asarray(X)

    def remove_visual_map_point(self, index: int) -> None:
        """RemoveVisualMapPoint (outlier pruning by VO)."""
        self._visual_pts = np.delete(self._visual_pts, index, axis=0)
