"""Binary sensor log: the rosbag-style record/replay layer.

The reference consumes live ROS topics; offline runs replay bags. Here the
equivalent is a single-file framed binary log (zlib-compressed scan payloads)
with a streaming writer/reader and a replay driver that feeds a
:class:`~beam_slam_tpu.pipeline.local_mapper.LocalMapper` in timestamp order
(SURVEY.md §7.7 'data loaders for rosbag-style logs').

Record types: IMU (w, a), SCAN (ring grid), CAMERA (id/pixel measurement
set), POSE (external/ground-truth pose, e.g. for FRAMEINIT or evaluation).
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from beam_slam_tpu.lidar.cloud import RingGrid

MAGIC = b"BSLG"
VERSION = 1

T_IMU = 1
T_SCAN = 2
T_CAMERA = 3
T_POSE = 4


class SensorLogWriter:
    def __init__(self, path: str):
        self.f = open(path, "wb")
        self.f.write(MAGIC + struct.pack("<H", VERSION))
        self.counts = {T_IMU: 0, T_SCAN: 0, T_CAMERA: 0, T_POSE: 0}

    def _rec(self, rtype: int, stamp: float, payload: bytes):
        self.f.write(struct.pack("<Bd I", rtype, stamp, len(payload)))
        self.f.write(payload)
        self.counts[rtype] += 1

    def add_imu(self, t: float, w, a):
        self._rec(T_IMU, t, np.asarray([*w, *a], np.float32).tobytes())

    def add_scan(self, t: float, grid: RingGrid):
        xyz = np.asarray(grid.xyz, np.float32)
        tm = np.asarray(grid.time, np.float32)
        valid = np.asarray(grid.valid, np.uint8)
        R, W = valid.shape
        raw = (struct.pack("<HH", R, W) + xyz.tobytes() + tm.tobytes()
               + valid.tobytes())
        self._rec(T_SCAN, t, zlib.compress(raw, 1))

    def add_camera(self, t: float, ids, pixels):
        ids = np.asarray(ids, np.int64)
        pixels = np.asarray(pixels, np.float32)
        payload = (struct.pack("<I", len(ids)) + ids.tobytes()
                   + pixels.tobytes())
        self._rec(T_CAMERA, t, payload)

    def add_pose(self, t: float, q, p):
        self._rec(T_POSE, t,
                  np.asarray([*q, *p], np.float32).tobytes())

    def close(self):
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _decode(rtype: int, payload: bytes):
    if rtype == T_IMU:
        v = np.frombuffer(payload, np.float32)
        return (v[:3], v[3:6])
    if rtype == T_SCAN:
        raw = zlib.decompress(payload)
        R, W = struct.unpack("<HH", raw[:4])
        o = 4
        xyz = np.frombuffer(raw, np.float32, R * W * 3, o).reshape(R, W, 3)
        o += R * W * 3 * 4
        tm = np.frombuffer(raw, np.float32, R * W, o).reshape(R, W)
        o += R * W * 4
        valid = np.frombuffer(raw, np.uint8, R * W, o).reshape(R, W) \
            .astype(bool)
        return RingGrid(xyz=jnp.asarray(xyz), time=jnp.asarray(tm),
                        valid=jnp.asarray(valid))
    if rtype == T_CAMERA:
        m = struct.unpack("<I", payload[:4])[0]
        ids = np.frombuffer(payload, np.int64, m, 4)
        pixels = np.frombuffer(payload, np.float32, m * 2,
                               4 + m * 8).reshape(m, 2)
        return (ids, pixels)
    if rtype == T_POSE:
        v = np.frombuffer(payload, np.float32)
        return (v[:4], v[4:7])
    raise ValueError(f"unknown record type {rtype}")


def index_log(path: str):
    """Random-access index: (types u8[N], stamps f64[N], offsets, sizes) +
    the raw buffer — built by the native C++ indexer when available (one
    pass, no per-record Python; the rosbag-index analog), NumPy/struct
    fallback otherwise."""
    from beam_slam_tpu.ops import native as native_mod
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError(f"{path}: not a sensor log")
    out = native_mod.index_log_native(buf)
    if out is not None:
        return (*out, buf)
    types, stamps, offsets, sizes = [], [], [], []
    pos = 6
    while pos + 13 <= len(buf):
        rtype, stamp, n = struct.unpack_from("<Bd I", buf, pos)
        if pos + 13 + n > len(buf):
            break
        types.append(rtype)
        stamps.append(stamp)
        offsets.append(pos + 13)
        sizes.append(n)
        pos += 13 + n
    return (np.asarray(types, np.uint8), np.asarray(stamps),
            np.asarray(offsets, np.int64), np.asarray(sizes, np.int64), buf)


def read_log(path: str) -> Iterator[Tuple[int, float, object]]:
    """Stream records in file order (via the index). Payloads:
    IMU → (w [3], a [3]); SCAN → RingGrid; CAMERA → (ids, pixels);
    POSE → (q, p)."""
    types, stamps, offsets, sizes, buf = index_log(path)
    for i in range(len(types)):
        rtype = int(types[i])
        payload = buf[offsets[i]:offsets[i] + sizes[i]]
        yield rtype, float(stamps[i]), _decode(rtype, payload)


def _read_log_streaming(path: str) -> Iterator[Tuple[int, float, object]]:
    """Pure-streaming reader (no whole-file buffer) — kept for very large
    logs / tests of the framing itself."""
    with open(path, "rb") as f:
        head = f.read(6)
        if head[:4] != MAGIC:
            raise ValueError(f"{path}: not a sensor log")
        while True:
            hdr = f.read(13)
            if len(hdr) < 13:
                return
            rtype, stamp, n = struct.unpack("<Bd I", hdr)
            payload = f.read(n)
            yield rtype, stamp, _decode(rtype, payload)


def replay(path: str, mapper, tick_on_keyframe: bool = True,
           progress_cb=None) -> int:
    """Feed a log through a LocalMapper in record order; returns #records.
    Camera records are delivered as pre-tracked measurements (ids+pixels)."""
    from beam_slam_tpu.models.visual_feature_tracker import CameraMeasurement
    n = 0
    for rtype, stamp, payload in read_log(path):
        n += 1
        if rtype == T_IMU:
            w, a = payload
            mapper.on_imu(stamp, w, a)
        elif rtype == T_SCAN:
            mapper.on_scan(stamp, payload)
            mapper.tick()
        elif rtype == T_CAMERA:
            ids, pixels = payload
            mapper.on_camera_measurement(
                CameraMeasurement(stamp, ids, pixels, pixels))
            mapper.tick()
        elif rtype == T_POSE:
            q, p = payload
            mapper.on_pose(stamp, q, p)
        if progress_cb is not None and n % 1000 == 0:
            progress_cb(n, stamp)
    return n


def imu_batch(path: str):
    """All IMU samples as contiguous arrays (t [N], w [N,3], a [N,3]) —
    bulk 200 Hz ingestion through the native batch decoder."""
    from beam_slam_tpu.ops import native as native_mod
    types, stamps, offsets, sizes, buf = index_log(path)
    sel = types == T_IMU
    offs = offsets[sel]
    wa = native_mod.decode_imu_batch_native(buf, offs)
    if wa is None:
        wa = np.stack([np.frombuffer(buf, np.float32, 6, int(o))
                       for o in offs]) if len(offs) else \
            np.zeros((0, 6), np.float32)
    return stamps[sel], wa[:, :3], wa[:, 3:6]
