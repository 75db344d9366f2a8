"""SDK-free Pandaset ingest helpers.

Parity: reference datasets/pandaset/pandaset_dataset.py:20-254, with
the pandaset-SDK geometry (`ps.geometry.lidar_points_to_ego`) and
sequence loaders replaced by direct reads of the public layout:
<root>/dataset/<seq>/lidar/XX.pkl.gz (pandas DataFrame),
<root>/dataset/<seq>/lidar/poses.json,
<root>/dataset/<seq>/annotations/cuboids/XX.pkl.gz.

Coordinate notes (reference :159-253): pandaset ego axes are
(x right, y forward, z up); the normative frame is (x forward,
y left, z up) → swap x/y and negate the new y.
"""

from __future__ import annotations

import gzip
import json
import pickle
from pathlib import Path

import numpy as np


def quat_to_matrix(q):
    """pose['heading'] {w,x,y,z} → (3,3)."""
    w, x, y, z = q["w"], q["x"], q["y"], q["z"]
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n < 1e-12 else 2.0 / n
    return np.array([
        [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
        [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
        [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
    ])


def lidar_points_to_ego(points, pose):
    """World → ego (SDK ps.geometry.lidar_points_to_ego parity):
    p_ego = R(q)ᵀ (p_world − t)."""
    rot = quat_to_matrix(pose["heading"])
    t = np.array([
        pose["position"]["x"], pose["position"]["y"],
        pose["position"]["z"],
    ])
    return (np.asarray(points) - t) @ rot


def _read_pickle(path):
    path = Path(path)
    if path.suffix == ".gz" or str(path).endswith(".pkl.gz"):
        with gzip.open(path, "rb") as f:
            return pickle.load(f)
    with open(path, "rb") as f:
        return pickle.load(f)


def load_poses(seq_dir):
    return json.loads((Path(seq_dir) / "lidar" / "poses.json").read_text())


def get_lidar_points(lidar_path, pose, device=0):
    """One frame → (N, 4) normative-frame xyz + [0,1] intensity
    (reference _get_lidar_points :150-184)."""
    frame = _read_pickle(lidar_path)
    if device != -1 and "d" in frame:
        frame = frame[frame["d"] == device]
    world = frame.to_numpy()
    pts = lidar_points_to_ego(world[:, :3], pose)
    intensity = world[:, 3] / 255.0
    pts = pts[:, [1, 0, 2]]
    pts[:, 1] = -pts[:, 1]
    return np.concatenate(
        [pts, intensity[:, None]], axis=1
    ).astype(np.float32)


def get_annotations(cuboids_path, pose, category_map=None, device=0):
    """One frame → (boxes (M, 7) normative, names, zrot_world_to_ego)
    (reference _get_annotations :187-253)."""
    cub = _read_pickle(cuboids_path)
    if device != -1 and "cuboids.sensor_id" in cub:
        cub = cub[cub["cuboids.sensor_id"] != 1 - device]
    xs = cub["position.x"].to_numpy()
    ys = cub["position.y"].to_numpy()
    zs = cub["position.z"].to_numpy()
    dxs = cub["dimensions.x"].to_numpy()
    dys = cub["dimensions.y"].to_numpy()
    dzs = cub["dimensions.z"].to_numpy()
    yaws = cub["yaw"].to_numpy()
    names = cub["label"].to_numpy()
    if category_map:
        names = np.array([category_map.get(n, n) for n in names])

    centers = np.stack([xs, ys, zs], axis=1)
    ego_centers = lidar_points_to_ego(centers, pose)

    # yaw correction: rotation of the world y axis in the ego frame
    y_axis = lidar_points_to_ego(
        np.array([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), pose
    )
    y_from_pose = y_axis[1] - y_axis[0]
    zrot_world_to_ego = float(
        np.arctan2(-y_from_pose[0], y_from_pose[1])
    )
    ego_yaws = yaws + zrot_world_to_ego

    boxes = np.stack([
        ego_centers[:, 1], -ego_centers[:, 0], ego_centers[:, 2],
        dys, dxs, dzs, ego_yaws,
    ], axis=1).astype(np.float32)
    return boxes, names, zrot_world_to_ego


def get_sequence_infos(root_path, sequences):
    """Per-frame infos (reference get_infos :358-384)."""
    infos = []
    root = Path(root_path)
    for seq in sequences:
        lidar_dir = root / "dataset" / seq / "lidar"
        frames = sorted(
            p for p in lidar_dir.glob("*.pkl*") if "poses" not in p.name
        )
        for ii, lp in enumerate(frames):
            infos.append({
                "sequence": seq,
                "frame_idx": ii,
                "frame_id": f"{seq}_{ii:02d}",
                "lidar_path": str(lp.relative_to(root)),
                "cuboids_path": str(
                    (root / "dataset" / seq / "annotations" / "cuboids"
                     / lp.name.replace(".pkl.gz", ".pkl.gz")
                     ).relative_to(root)
                ),
            })
    return infos
