"""Devkit-free nuScenes ingest: raw JSON tables → training infos.

Parity: reference datasets/nuscenes/nuscenes_utils.py
(fill_trainval_infos :252-384, get_sample_data, quaternion_yaw :234,
map_name_from_general_to_detection :16-40) — re-implemented directly
on the nuScenes v1.0 relational JSON tables so the adapter works
without the nuscenes-devkit (absent in this image). The devkit's
Quaternion/Box helpers become plain numpy quaternion math.
"""

from __future__ import annotations

import json
from functools import reduce
from pathlib import Path

import numpy as np

MAP_NAME_TO_DETECTION = {
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.wheelchair": "ignore",
    "human.pedestrian.stroller": "ignore",
    "human.pedestrian.personal_mobility": "ignore",
    "human.pedestrian.police_officer": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "animal": "ignore",
    "vehicle.car": "car",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.truck": "truck",
    "vehicle.construction": "construction_vehicle",
    "vehicle.emergency.ambulance": "ignore",
    "vehicle.emergency.police": "ignore",
    "vehicle.trailer": "trailer",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
    "movable_object.pushable_pullable": "ignore",
    "movable_object.debris": "ignore",
    "static_object.bicycle_rack": "ignore",
}

_TABLES = (
    "sample", "sample_data", "calibrated_sensor", "ego_pose",
    "sample_annotation", "scene", "category", "instance",
)


def quat_to_matrix(q):
    """(4,) [w, x, y, z] → (3, 3) rotation matrix."""
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n < 1e-12 else 2.0 / n
    return np.array([
        [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
        [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
        [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
    ])


def quaternion_yaw(q):
    """Yaw of the quaternion's rotated x-axis (reference
    quaternion_yaw :234-246 via the devkit)."""
    v = quat_to_matrix(q) @ np.array([1.0, 0.0, 0.0])
    return float(np.arctan2(v[1], v[0]))


def transform_matrix(translation, rotation_q, inverse=False):
    """4x4 homogeneous transform (devkit geometry_utils parity)."""
    tm = np.eye(4)
    rot = quat_to_matrix(rotation_q)
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = -rot.T @ np.asarray(translation)
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = np.asarray(translation)
    return tm


class NuScenesTables:
    """Minimal relational reader over <root>/<version>/*.json."""

    def __init__(self, dataroot, version="v1.0-trainval"):
        self.dataroot = Path(dataroot)
        self.version = version
        self._tables = {}
        self._index = {}
        tdir = self.dataroot / version
        for name in _TABLES:
            path = tdir / f"{name}.json"
            rows = json.loads(path.read_text()) if path.exists() else []
            self._tables[name] = rows
            self._index[name] = {r["token"]: r for r in rows}

    def table(self, name):
        return self._tables[name]

    def get(self, name, token):
        return self._index[name][token]

    # -- derived --------------------------------------------------------
    def box_velocity(self, ann_token, max_time_diff=1.5):
        """Finite-difference global-frame velocity (devkit
        NuScenes.box_velocity parity)."""
        cur = self.get("sample_annotation", ann_token)
        has_prev = cur["prev"] != ""
        has_next = cur["next"] != ""
        if not has_prev and not has_next:
            return np.array([np.nan, np.nan, np.nan])
        first = self.get("sample_annotation", cur["prev"]) if has_prev else cur
        last = self.get("sample_annotation", cur["next"]) if has_next else cur
        pos_f = np.asarray(first["translation"])
        pos_l = np.asarray(last["translation"])

        def sample_time(ann):
            s = self.get("sample", ann["sample_token"])
            return 1e-6 * s["timestamp"]

        dt = sample_time(last) - sample_time(first)
        if dt > max_time_diff or dt <= 0:
            return np.array([np.nan, np.nan, np.nan])
        return (pos_l - pos_f) / dt

    def boxes_in_sensor_frame(self, sample, sd_rec):
        """Sample annotations transformed global → ego → sensor.
        Returns (locs (M,3), wlh (M,3), yaws (M,), names, tokens,
        vels (M,3))."""
        cs = self.get("calibrated_sensor", sd_rec["calibrated_sensor_token"])
        pose = self.get("ego_pose", sd_rec["ego_pose_token"])
        car_from_global = transform_matrix(
            pose["translation"], pose["rotation"], inverse=True
        )
        ref_from_car = transform_matrix(
            cs["translation"], cs["rotation"], inverse=True
        )
        tm = ref_from_car @ car_from_global

        locs, wlhs, yaws, names, tokens, vels = [], [], [], [], [], []
        for tok in sample["anns"]:
            ann = self.get("sample_annotation", tok)
            ctr = tm[:3, :3] @ np.asarray(ann["translation"]) + tm[:3, 3]
            rot = tm[:3, :3] @ quat_to_matrix(ann["rotation"])
            yaw = float(np.arctan2(rot[1, 0], rot[0, 0]))
            v_global = self.box_velocity(tok)
            v = tm[:3, :3] @ np.nan_to_num(v_global)
            inst = self.get("instance", ann["instance_token"])
            cat = self.get("category", inst["category_token"])["name"]
            locs.append(ctr)
            wlhs.append(np.asarray(ann["size"], np.float64))
            yaws.append(yaw)
            names.append(cat)
            tokens.append(tok)
            vels.append(v)
        m = len(locs)
        return (
            np.asarray(locs).reshape(m, 3),
            np.asarray(wlhs).reshape(m, 3),
            np.asarray(yaws).reshape(m),
            np.asarray(names), np.asarray(tokens),
            np.asarray(vels).reshape(m, 3),
        )


def fill_trainval_infos(data_path, tables: NuScenesTables,
                        train_scene_names=None, test=False,
                        max_sweeps=10):
    """Reference fill_trainval_infos (:252-384) without the devkit.

    train_scene_names: iterable of scene names for the train split
    (the canonical 700/150 split lives in the devkit; pass it in or
    default = every scene → train).
    """
    train_scene_names = (
        set(train_scene_names) if train_scene_names is not None else None
    )
    train_infos, val_infos = [], []

    for sample in tables.table("sample"):
        ref_sd = tables.get("sample_data", sample["data"]["LIDAR_TOP"])
        ref_cs = tables.get(
            "calibrated_sensor", ref_sd["calibrated_sensor_token"]
        )
        ref_pose = tables.get("ego_pose", ref_sd["ego_pose_token"])
        ref_time = 1e-6 * ref_sd["timestamp"]

        ref_from_car = transform_matrix(
            ref_cs["translation"], ref_cs["rotation"], inverse=True
        )
        car_from_global = transform_matrix(
            ref_pose["translation"], ref_pose["rotation"], inverse=True
        )

        info = {
            "lidar_path": ref_sd["filename"],
            "token": sample["token"],
            "sweeps": [],
            "ref_from_car": ref_from_car,
            "car_from_global": car_from_global,
            "timestamp": ref_time,
        }

        # sweeps chain (reference :295-346)
        curr = ref_sd
        sweeps = []
        while len(sweeps) < max_sweeps - 1:
            if curr["prev"] == "":
                if len(sweeps) == 0:
                    sweeps.append({
                        "lidar_path": ref_sd["filename"],
                        "sample_data_token": curr["token"],
                        "transform_matrix": None,
                        "time_lag": 0.0,
                    })
                else:
                    sweeps.append(sweeps[-1])
            else:
                curr = tables.get("sample_data", curr["prev"])
                pose = tables.get("ego_pose", curr["ego_pose_token"])
                cs = tables.get(
                    "calibrated_sensor", curr["calibrated_sensor_token"]
                )
                global_from_car = transform_matrix(
                    pose["translation"], pose["rotation"], inverse=False
                )
                car_from_current = transform_matrix(
                    cs["translation"], cs["rotation"], inverse=False
                )
                tm = reduce(np.dot, [
                    ref_from_car, car_from_global, global_from_car,
                    car_from_current,
                ])
                sweeps.append({
                    "lidar_path": curr["filename"],
                    "sample_data_token": curr["token"],
                    "transform_matrix": tm,
                    "sweep2lidar_rotation": tm[:3, :3],
                    "sweep2lidar_translation": tm[:3, 3],
                    "time_lag": ref_time - 1e-6 * curr["timestamp"],
                })
        info["sweeps"] = sweeps

        if not test:
            locs, wlh, yaws, names, tokens, vels = (
                tables.boxes_in_sensor_frame(sample, ref_sd)
            )
            anns = [
                tables.get("sample_annotation", t) for t in sample["anns"]
            ]
            num_lidar = np.array(
                [a.get("num_lidar_pts", 1) for a in anns]
            )
            num_radar = np.array(
                [a.get("num_radar_pts", 0) for a in anns]
            )
            mask = (num_lidar + num_radar) > 0
            dims = wlh[:, [1, 0, 2]]  # wlh → dx dy dz
            gt_boxes = np.concatenate(
                [locs, dims, yaws[:, None], vels[:, :2]], axis=1
            )
            info["gt_boxes"] = gt_boxes[mask]
            info["gt_boxes_velocity"] = vels[mask]
            info["gt_names"] = np.array([
                MAP_NAME_TO_DETECTION.get(n, "ignore") for n in names
            ])[mask]
            info["gt_boxes_token"] = tokens[mask]
            info["num_lidar_pts"] = num_lidar[mask]
            info["num_radar_pts"] = num_radar[mask]

        scene = tables.get("scene", sample["scene_token"])
        is_train = (
            train_scene_names is None
            or scene["name"] in train_scene_names
        )
        (train_infos if is_train else val_infos).append(info)
    return train_infos, val_infos
