"""Shared utilities: logging, seeding, timing, small geometry helpers.

Counterpart of reference common_utils
(/root/reference/core/pcdet/utils/common_utils.py), minus the torch
/NCCL machinery: distributed init is replaced by JAX process/mesh
setup in de6d_tpu.parallel.
"""

from __future__ import annotations

import logging
import random
import time

import numpy as np


# ---------------------------------------------------------------------------
# geometry helpers (numpy; jnp twins live in de6d_tpu.ops.geometry)
# ---------------------------------------------------------------------------

def limit_period(val, offset: float = 0.5, period: float = 2 * np.pi):
    """Wrap ``val`` into [-offset*period, (1-offset)*period).

    Same contract as reference common_utils.limit_period (:22).
    Works for numpy and jax arrays (pure arithmetic).
    """
    return val - np.floor(val / period + offset) * period


def rotation_matrix_z(angle):
    """(..., ) yaw → (..., 3, 3) rotation about +z (counter-clockwise)."""
    angle = np.asarray(angle)
    c, s = np.cos(angle), np.sin(angle)
    zero, one = np.zeros_like(c), np.ones_like(c)
    rot = np.stack(
        [c, -s, zero, s, c, zero, zero, zero, one], axis=-1
    ).reshape(*angle.shape, 3, 3)
    return rot


def rotate_points_along_z(points: np.ndarray, angle: np.ndarray) -> np.ndarray:
    """Rotate (B, N, 3+C) points by per-batch yaw ``angle`` (B,).

    Matches reference common_utils.rotate_points_along_z (:36): the
    xyz channels rotate, extra channels pass through.
    """
    rot = rotation_matrix_z(angle)  # (B, 3, 3)
    xyz = points[..., :3] @ rot.swapaxes(-1, -2)
    return np.concatenate([xyz, points[..., 3:]], axis=-1)


def angles_to_matrix(yaw, pitch=None, roll=None):
    """Euler angles → rotation matrix with the reference's convention.

    R = Rx(roll) @ Ry(pitch) @ Rz(yaw), i.e. scipy
    ``Rotation.from_euler('zyx', [yaw, pitch, roll])`` with lowercase
    (extrinsic) axes — the convention of reference
    box_utils.boxes3d_to_corners_3d (box_utils.py:57-71).
    Broadcasts over leading dims.
    """
    yaw = np.asarray(yaw, dtype=np.float64)
    pitch = np.zeros_like(yaw) if pitch is None else np.asarray(pitch)
    roll = np.zeros_like(yaw) if roll is None else np.asarray(roll)
    cz, sz = np.cos(yaw), np.sin(yaw)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cx, sx = np.cos(roll), np.sin(roll)
    # R = Rx @ Ry @ Rz, written out:
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = cx * sz + sx * sy * cz
    r11 = cx * cz - sx * sy * sz
    r12 = -sx * cy
    r20 = sx * sz - cx * sy * cz
    r21 = sx * cz + cx * sy * sz
    r22 = cx * cy
    rot = np.stack([r00, r01, r02, r10, r11, r12, r20, r21, r22], axis=-1)
    return rot.reshape(*yaw.shape, 3, 3)


# ---------------------------------------------------------------------------
# logging / seeding / meters
# ---------------------------------------------------------------------------

def create_logger(log_file=None, rank: int = 0, log_level=logging.INFO):
    """Rank-aware console+file logger (reference common_utils.py:86-100)."""
    logger = logging.getLogger(f"de6d_tpu.r{rank}.{log_file}")
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    formatter = logging.Formatter("%(asctime)s  %(levelname)5s  %(message)s")
    if not logger.handlers:
        console = logging.StreamHandler()
        console.setLevel(log_level if rank == 0 else logging.ERROR)
        console.setFormatter(formatter)
        logger.addHandler(console)
        if log_file is not None:
            fh = logging.FileHandler(log_file)
            fh.setLevel(log_level if rank == 0 else logging.ERROR)
            fh.setFormatter(formatter)
            logger.addHandler(fh)
    return logger


def set_random_seed(seed: int):
    """Seed python/numpy; JAX keys are derived explicitly from the seed
    (functional PRNG — the reference's torch/cuda seeding
    common_utils.py:103 has no global-state analog in JAX)."""
    random.seed(seed)
    np.random.seed(seed)
    return seed


class AverageMeter:
    """Running average (reference common_utils.py:263)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class TimeMeasurement:
    """Context-manager wall timer; call ``block_until_ready`` on device
    outputs yourself before exiting for accurate device timing
    (TPU analog of the reference's cuda-synchronize timer,
    common_utils.py:282-298)."""

    def __init__(self, name: str = "", logger=None):
        self.name = name
        self.logger = logger
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0
        if self.logger is not None:
            self.logger.info(f"{self.name}: {self.elapsed * 1e3:.2f} ms")
        return False


def keep_arrays_by_name(gt_names, used_classes):
    """Indices of gt_names that are in used_classes (reference
    common_utils.keep_arrays_by_name)."""
    inds = [i for i, name in enumerate(gt_names) if name in used_classes]
    return np.array(inds, dtype=np.int64)


def drop_info_with_name(info: dict, name: str) -> dict:
    """Filter a kitti info annos dict, dropping entries whose 'name' is
    ``name`` (e.g. 'DontCare') — reference common_utils.drop_info_with_name."""
    ret = {}
    keep = [i for i, n in enumerate(info["name"]) if n != name]
    for key, val in info.items():
        if isinstance(val, np.ndarray) and val.shape[0] == len(info["name"]):
            ret[key] = val[keep]
        else:
            ret[key] = val
    return ret
