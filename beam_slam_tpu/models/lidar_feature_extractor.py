"""LidarFeatureExtractor — standalone feature-extraction model.

Re-implements the experimental ``bs_models::experimental::
LidarFeatureExtractor`` (bs_models/experimental/src/
lidar_feature_extractor.cpp): subscribes to a pointcloud stream, runs the
LOAM feature extractor, and publishes a LidarMeasurement (points + LOAM
edges/surfaces strong/weak — bs_common/msg/LidarMeasurementMsg.msg) for
downstream consumers (e.g. the global mapper or an offline recorder).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import numpy as np

from beam_slam_tpu.lidar import features as feat
from beam_slam_tpu.lidar import filters as lfil
from beam_slam_tpu.lidar.cloud import FeatureCloud, RingGrid


@dataclasses.dataclass
class LidarMeasurement:
    """bs_common/msg/LidarMeasurementMsg.msg equivalent: the frame id plus
    the LOAM feature sets of one scan (lidar frame)."""

    stamp: float
    frame_id: str
    features: FeatureCloud

    def counts(self) -> dict:
        return dict(
            edge_strong=int(np.asarray(
                self.features.edge_strong_valid).sum()),
            edge_weak=int(np.asarray(self.features.edge_weak_valid).sum()),
            surf_strong=int(np.asarray(
                self.features.surf_strong_valid).sum()),
            surf_weak=int(np.asarray(self.features.surf_weak_valid).sum()))


class LidarFeatureExtractor:
    def __init__(self, loam_cfg: feat.LoamConfig = feat.LoamConfig(),
                 frame_id: str = "lidar",
                 publish_cb: Optional[Callable[[LidarMeasurement],
                                               None]] = None,
                 input_filters=()):
        self.loam_cfg = loam_cfg
        self.frame_id = frame_id
        self.publish_cb = publish_cb
        self.input_filters = tuple(input_filters)
        self.published: List[LidarMeasurement] = []

    def process_pointcloud(self, stamp: float,
                           grid: RingGrid) -> LidarMeasurement:
        """ProcessPointcloud: filter → extract → publish."""
        if self.input_filters:
            grid = lfil.apply_filters(grid, self.input_filters)
        fc = feat.extract_features(grid, self.loam_cfg)
        meas = LidarMeasurement(float(stamp), self.frame_id, fc)
        if self.publish_cb is not None:
            self.publish_cb(meas)
        else:
            self.published.append(meas)
        return meas
