"""Visual feature tracker model: image stream → per-landmark pixel tracks.

Re-implements the reference ``VisualFeatureTracker`` plugin
(bs_models/src/visual_feature_tracker.cpp, header :18-93): detector +
tracker producing CameraMeasurementMsg-equivalents (landmark id + pixel per
feature). The beam_cv FASTSSC/ORB/KLT stack maps to the batched FAST +
pyramidal-LK kernels (:mod:`beam_slam_tpu.vision.detector` /
:mod:`beam_slam_tpu.vision.tracker`); descriptor extraction is not needed for
the LK pipeline (descriptors return with the reloc/ImageDatabase layer).

Host-side bookkeeping (ids, replenishment) wraps the jitted kernels; the
feature table has fixed capacity = one feature per detector grid cell.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from beam_slam_tpu.vision import detector as det
from beam_slam_tpu.vision import tracker as trk
from beam_slam_tpu.vision.camera import PinholeRadtan


class CameraMeasurement(NamedTuple):
    """One frame's tracked features (CameraMeasurementMsg equivalent,
    bs_common/msg/CameraMeasurementMsg.msg)."""

    stamp: float
    ids: np.ndarray        # [M] landmark ids
    pixels: np.ndarray     # [M, 2] raw pixels
    pixels_undistorted: np.ndarray  # [M, 2]


class VisualFeatureTracker:
    def __init__(self, camera: PinholeRadtan,
                 fast_cfg: det.FastConfig = det.FastConfig(threshold=15.0),
                 lk_cfg: trk.LKConfig = trk.LKConfig(),
                 min_features: int = 40):
        self.camera = camera
        self.fast_cfg = fast_cfg
        self.lk_cfg = lk_cfg
        self.min_features = min_features
        self.prev_pyr = None
        self.xy = None          # [N, 2]
        self.ids = None         # [N]
        self.valid = None       # [N]
        self.next_id = 0

    def _replenish(self, image: jnp.ndarray):
        """Fill empty feature slots with fresh detections in unoccupied
        cells (the spatial-suppression role of FASTSSC)."""
        xy_new, score, det_valid = det.detect(image, self.fast_cfg)
        xy_new = np.asarray(xy_new)
        det_valid = np.asarray(det_valid).copy()
        c = self.fast_cfg.cell_size
        W = int(image.shape[1])
        n_wc = W // c
        occupied = set()
        for i in range(len(self.xy)):
            if self.valid[i]:
                cell = (int(self.xy[i, 1]) // c) * n_wc + int(self.xy[i, 0]) // c
                occupied.add(cell)
        for j in range(len(xy_new)):
            if not det_valid[j]:
                continue
            cell = (int(xy_new[j, 1]) // c) * n_wc + int(xy_new[j, 0]) // c
            if cell in occupied:
                continue
            # place into a free table slot
            free = np.nonzero(~self.valid)[0]
            if len(free) == 0:
                break
            s = free[0]
            self.xy[s] = xy_new[j]
            self.ids[s] = self.next_id
            self.next_id += 1
            self.valid[s] = True
            occupied.add(cell)

    def process_image(self, stamp: float, image) -> CameraMeasurement:
        image = jnp.asarray(image, jnp.float32)
        pyr = tuple(trk.build_pyramid(image, self.lk_cfg.levels))
        if self.prev_pyr is None:
            H, W = image.shape
            c = self.fast_cfg.cell_size
            n = (H // c) * (W // c)
            self.xy = np.zeros((n, 2), np.float32)
            self.ids = np.full(n, -1, np.int64)
            self.valid = np.zeros(n, bool)
        else:
            new_xy, ok = trk.track(self.prev_pyr, pyr,
                                   jnp.asarray(self.xy),
                                   jnp.asarray(self.valid), self.lk_cfg)
            self.xy = np.array(new_xy)
            self.valid = self.valid & np.asarray(ok)
        if int(self.valid.sum()) < max(self.min_features,
                                       0 if self.prev_pyr is None else 0):
            pass
        self._replenish(image)
        self.prev_pyr = pyr

        sel = self.valid
        pix = self.xy[sel]
        und = np.asarray(self.camera.undistort_pixel(jnp.asarray(pix))) \
            if len(pix) else pix
        return CameraMeasurement(stamp=stamp, ids=self.ids[sel].copy(),
                                 pixels=pix.copy(),
                                 pixels_undistorted=np.asarray(und))
